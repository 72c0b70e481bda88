"""Kernel-level microbenchmarks on the real TPU chip.

Measures the two Pallas kernels at the flagship op-point shapes (512x768,
24 frames — BASELINE config #3) and the full video-UNet pass, printing one
JSON line per probe.  Companion to bench.py (end-to-end clip throughput);
this file answers "which kernel moved" when the end-to-end number shifts.

Run on the axon TPU (default platform):  python tools/microbench.py
Select probes:  python tools/microbench.py flash temporal unet

Timing protocol: jit, one warmup call, then ITERS timed calls; every timed
call is force-fetched through a derived scalar (block_until_ready can
ack-return early on the axon tunnel backend — see PERF.md).

Sub-100ms ops are additionally CHAINED: the axon tunnel's scalar fetch costs
~35 ms of round-trip latency, which swamped the first round of per-op numbers
(a trivial l=96 temporal call "measured" the same 44 ms as the l=6144 one).
`_chain` scans N dependent calls inside one executable and divides, so the
fetch shows up once per N kernel invocations.
"""

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("HVT_MB_ITERS", "5"))


def _time(fn, *args):
    """Median seconds over ITERS calls, each drained via a scalar fetch."""
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    dts = []
    for _ in range(ITERS):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
        dts.append(time.time() - t0)
    return statistics.median(dts), dts


def _chain(op, n=20):
    """Chain n dependent invocations of op(x, *rest) -> x-like inside one
    jitted scan; per-call time = total / n.  `rest` rides through as jit
    ARGUMENTS — never close over device arrays here (constant-lifting
    deadlocks the axon backend; see the env-quirks memory note)."""
    def fn(x, *rest):
        def body(xc, _):
            return op(xc, *rest), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return fn, n


def _emit(name, seconds, dts, **extra):
    rec = {"probe": name, "seconds": round(seconds, 5),
           "spread": [round(min(dts), 5), round(max(dts), 5)], **extra}
    print(json.dumps(rec), flush=True)


def probe_flash():
    """Level-0 spatial self-attention with reference KV (the dominant shape:
    bh=8 heads x 24 frames, Lq=6144, Lk=12288, d=40)."""
    from humanvid_tpu.ops.flash_attention import flash_attention

    b, h, lq, lk, d = 24, 8, 6144, 12288, 40
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    bias = jnp.zeros((b, 1, 1, lk), jnp.float32)

    fn, n = _chain(lambda q, k, v, bias: flash_attention(q, k, v, bias), 10)
    sec, dts = _time(jax.jit(fn), q, k, v, bias)
    sec /= n
    tflops = 4 * b * h * lq * lk * d / sec / 1e12
    _emit("flash_l0_6144x12288_d40", sec, dts, tflops=round(tflops, 2))


def probe_flash_sweep():
    """Block-size sweep at the level-0 shape, including the full-Lk
    single-shot-softmax configurations (bkv=Lk: one kv step, no online
    rescale; needs HVT_FLASH_VMEM >= ~64M)."""
    from humanvid_tpu.ops.flash_attention import flash_attention

    b, h, lq, lk, d = 24, 8, 6144, 12288, 40
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    bias = jnp.zeros((b, 1, 1, lk), jnp.float32)

    for bq, bkv in ((512, 1024), (1024, 1024), (512, 2048), (1024, 2048),
                    (256, 12288), (512, 12288)):
        try:
            op = functools.partial(flash_attention, block_q=bq, block_kv=bkv)
            fn, n = _chain(op, 10)
            sec, dts = _time(jax.jit(fn), q, k, v, bias)
            sec /= n
            tflops = 4 * b * h * lq * lk * d / sec / 1e12
            _emit(f"flash_sweep_bq{bq}_bkv{bkv}", sec, dts,
                  tflops=round(tflops, 2))
        except Exception as e:  # noqa: BLE001 — sweep must survive VMEM OOMs
            print(f"# flash_sweep bq={bq} bkv={bkv} failed: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr, flush=True)


def probe_temporal():
    """Motion-module frame attention at each UNet level (b, f=24, l, c) vs
    the XLA token-layout path it replaces."""
    from humanvid_tpu.ops.temporal_attention import (
        temporal_attention, xla_temporal_attention)

    f, heads = 24, 8
    rng = np.random.default_rng(0)
    for l, c in ((6144, 320), (1536, 640), (384, 1280), (96, 1280)):
        q, k, v = (jnp.asarray(rng.normal(size=(1, f, l, c)), jnp.bfloat16)
                   for _ in range(3))
        fn, n = _chain(lambda q, k, v: temporal_attention(q, k, v, heads))
        sec, dts = _time(jax.jit(fn), q, k, v)
        sec /= n
        hbm_gbs = 4 * f * l * c * 2 / sec / 1e9
        _emit(f"temporal_pallas_l{l}_c{c}", sec, dts, hbm_gbs=round(hbm_gbs, 1))
        if os.environ.get("HVT_MB_XLA_TEMPORAL"):
            fn2, n2 = _chain(lambda q, k, v: xla_temporal_attention(q, k, v, heads))
            sec2, dts2 = _time(jax.jit(fn2), q, k, v)
            _emit(f"temporal_xla_l{l}_c{c}", sec2 / n2, dts2)


def probe_unet():
    """One full video-UNet forward (24 frames, 96x64 latents, with motion
    modules + reference features + pose/camera cond): the CFG-half cost."""
    from humanvid_tpu.ops.attention import set_default_attention_backend
    from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
    from humanvid_tpu.utils.transfer import packed_device_put

    set_default_attention_backend("auto")
    H, W, F = 768, 512, 24
    system = CamAnimate(CamAnimateConfig(), dtype=jnp.bfloat16)
    params = system.init_params(jax.random.PRNGKey(0), 256, 192, frames=2,
                                abstract=True)
    params = jax.block_until_ready(packed_device_put(params))

    h8, w8 = H // 8, W // 8
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(F, h8, w8, 4)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(1, 1, 768)), jnp.bfloat16)
    ref_lat = jnp.asarray(rng.normal(size=(1, h8, w8, 4)), jnp.bfloat16)
    cond = jnp.asarray(rng.normal(size=(F, h8, w8, 320)), jnp.bfloat16)

    def ref_feats(params, ref_lat, ctx):
        _, feats = system.reference_unet.apply(
            params["reference_unet"], ref_lat, jnp.zeros((1,), jnp.float32),
            ctx, collect_ref_features=True)
        return feats

    feats = jax.jit(ref_feats)(params, ref_lat, ctx)
    jax.tree.map(lambda x: x.block_until_ready(), feats)

    def unet_pass(params, latents, t, ctx, cond, feats):
        eps, _ = system.denoising_unet.apply(
            params["denoising_unet"], latents, t, ctx,
            cond_fea=cond, ref_features=feats, frames=F)
        return eps

    fn = jax.jit(unet_pass)
    sec, dts = _time(fn, params, latents, t, ctx, cond, feats)
    _emit("unet_pass_24f_96x64", sec, dts)


def probe_vae():
    """VAE decode of the 24-frame clip at 768x512 (chunked like the pipeline)."""
    from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
    from humanvid_tpu.utils.transfer import packed_device_put

    H, W, F = 768, 512, 24
    system = CamAnimate(CamAnimateConfig(), dtype=jnp.bfloat16)
    params = system.init_params(jax.random.PRNGKey(0), 256, 192, frames=2,
                                abstract=True)
    dec = jax.block_until_ready(
        packed_device_put({"vae_decoder": params["vae_decoder"]}))

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(F, H // 8, W // 8, 4)), jnp.bfloat16)

    for chunk in (4, 8, 24):
        def decode(p, lat, _c=chunk):
            def one(z):
                return system.vae_decoder.apply(p["vae_decoder"], z)
            return jax.lax.map(
                one, lat.reshape(F // _c, _c, H // 8, W // 8, 4))

        fn = jax.jit(decode)
        sec, dts = _time(fn, dec, lat)
        _emit(f"vae_decode_24f_768x512_chunk{chunk}", sec, dts)
        if os.environ.get("HVT_MB_PROFILE_DIR") and chunk == 4:
            d = os.environ["HVT_MB_PROFILE_DIR"]
            with jax.profiler.trace(d):
                for _ in range(2):
                    out = fn(dec, lat)
                    float(jnp.sum(out[..., :1].astype(jnp.float32)))
            print(f"# vae profile written to {d}", file=sys.stderr, flush=True)


def probe_dmajor():
    """Does a d=40 contraction on SUBLANES (d-major layout) beat the lane
    layout? The flash kernel's QK/PV matmuls contract (QK) or emit (PV) the
    40-wide head dim on the 128-lane axis — a 3.2x pad. If Mosaic runs the
    d-major formulation at full MXU rate, a d-major kernel rewrite raises
    the attention ceiling ~3x. Pure-Pallas probe: one dot per grid step, the
    logits stay in VMEM (only a 128-wide slice is written out, so HBM traffic
    cannot hide the MXU difference)."""
    from jax.experimental import pallas as pl

    G, lq, lk, d = 64, 1024, 2048, 40
    rng = np.random.default_rng(0)
    flops_qk = 2 * G * lq * lk * d
    flops_pv = 2 * G * lq * lk * d

    def run(tag, kernel, shapes, out_shape, flops, n=300):
        ins = [jnp.asarray(rng.normal(size=(G,) + s), jnp.bfloat16)
               for s in shapes]
        call = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((1,) + s, lambda i: (i, 0, 0))
                      for s in shapes],
            out_specs=pl.BlockSpec((1,) + out_shape, lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G,) + out_shape, jnp.bfloat16),
        )

        def op(a, b_):
            out = call(a, b_)
            # data dependency a <- out so the scan can't be parallelized or
            # DCE'd, without changing a's value (the pred is always true)
            s0 = out[0, 0, 0].astype(jnp.float32)
            return jnp.where(s0 == s0, a, jnp.zeros_like(a))

        fn, n = _chain(op, n)
        sec, dts = _time(jax.jit(fn), *ins)
        sec /= n
        _emit(f"dmajor_{tag}", sec, dts, tflops=round(flops / sec / 1e12, 2))

    def qk_lanes(qr, kr, or_):
        s = jax.lax.dot_general(qr[0], kr[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        or_[0] = s[:, :128].astype(jnp.bfloat16)

    def qk_sublanes(qr, kr, or_):
        s = jax.lax.dot_general(qr[0], kr[0], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        or_[0] = s[:, :128].astype(jnp.bfloat16)

    def pv_lanes(pr, vr, or_):
        o = jax.lax.dot_general(pr[0], vr[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        or_[0] = jnp.pad(o, ((0, 0), (0, 128 - d))).astype(jnp.bfloat16)

    def pv_dmajor(vr, pr, or_):
        # V [d, lk] x P [lq, lk] contracting lk -> out [d, lq]: no 40-pad
        o = jax.lax.dot_general(vr[0], pr[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        or_[0] = o[:, :1024].astype(jnp.bfloat16)

    run("qk_d_on_lanes", qk_lanes, ((lq, d), (lk, d)), (lq, 128), flops_qk)
    run("qk_d_on_sublanes", qk_sublanes, ((d, lq), (d, lk)), (lq, 128),
        flops_qk)
    run("pv_d_on_lanes", pv_lanes, ((lq, lk), (lk, d)), (lq, 128), flops_pv)
    run("pv_dmajor_out", pv_dmajor, ((d, lk), (lq, lk)), (d, lq), flops_pv)
    # control: the same QK at d=128 (no padding either way) = MXU ceiling
    run("qk_d128_lanes", qk_lanes, ((lq, 128), (lk, 128)), (lq, 128),
        2 * G * lq * lk * 128)


def probe_conv():
    """XLA conv throughput at the dominant UNet/VAE 3x3 shapes (bf16 NHWC)
    vs a 9-shift matmul formulation (sum over taps of shifted-x @ W[dy,dx]).

    The r3 trace put UNet convs at ~46 TF/s effective — half the MXU rate the
    channel counts should allow. If the shift-matmul form is faster, XLA's
    conv emitter (not the shapes) is the bottleneck and the resnet convs can
    be reformulated; if both are equal, the convs are bandwidth/shape-bound
    and the budget line is already at its ceiling."""
    shapes = [  # (tag, n, h, w, cin, cout)
        ("unet_l0", 24, 96, 64, 320, 320),
        ("unet_l0_upcat", 24, 96, 64, 640, 320),
        ("unet_l1", 24, 48, 32, 640, 640),
        ("unet_l2", 24, 24, 16, 1280, 1280),
        ("unet_l3", 24, 12, 8, 1280, 1280),
        ("vae_hi", 8, 768, 512, 128, 128),
        ("vae_mid", 8, 384, 256, 256, 256),
        ("vae_lo", 8, 192, 128, 512, 512),
    ]
    rng = np.random.default_rng(0)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(x.dtype)

    def shiftmm(x, w):
        n, h, ww, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((n, h, ww, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, ww, ci))
                acc = acc + jax.lax.dot_general(
                    xs.reshape(n * h * ww, ci), w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(n, h, ww, co)
        return acc.astype(x.dtype)

    for tag, n, h, w_, ci, co in shapes:
        x = jnp.asarray(rng.normal(size=(n, h, w_, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.02, jnp.bfloat16)
        flops = 2 * 9 * n * h * w_ * ci * co
        extra = ()
        if ci != co:  # chain needs an x-like carry: time a round-trip pair
            extra = (jnp.asarray(rng.normal(size=(3, 3, co, ci)) * 0.02,
                                 jnp.bfloat16),)
            flops = 2 * flops
        for form, op in (("conv", conv), ("shiftmm", shiftmm)):
            if form == "shiftmm" and ci != co:
                continue
            if ci != co:
                def op(xc, wc, w2, _op=op):  # noqa: PLW2901
                    return _op(_op(xc, wc), w2)
            fn, nn_ = _chain(lambda xc, *ws, _op=op: _op(xc, *ws),
                             10 if n * h * w_ * ci > 2**24 else 40)
            try:
                sec, dts = _time(jax.jit(fn), x, wt, *extra)
            except Exception as e:  # noqa: BLE001
                print(f"# conv {tag} {form} failed: {str(e).splitlines()[0][:150]}",
                      file=sys.stderr, flush=True)
                continue
            sec /= nn_
            _emit(f"conv_{tag}_{form}", sec, dts,
                  tflops=round(flops / sec / 1e12, 2))


def probe_gn():
    """GroupNorm(32)+SiLU chain bandwidth at the VAE-decode resolutions —
    the r3 trace's 51% 'elementwise' share of the decode. Reports effective
    HBM GB/s assuming the minimum 2-read+1-write traffic."""
    from flax import linen as nn_

    rng = np.random.default_rng(0)
    for tag, n, h, w_, c in (("vae_hi", 8, 768, 512, 128),
                             ("vae_mid", 8, 384, 256, 256),
                             ("vae_l0", 24, 96, 64, 320)):
        x = jnp.asarray(rng.normal(size=(n, h, w_, c)), jnp.bfloat16)
        mod = nn_.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x)

        def op(xc, p):
            return nn_.silu(mod.apply(p, xc))

        fn, nch = _chain(op, 40)
        sec, dts = _time(jax.jit(fn), x, params)
        sec /= nch
        gbs = 3 * x.size * 2 / sec / 1e9
        _emit(f"gn_silu_{tag}", sec, dts, hbm_gbs=round(gbs, 1))


def probe_pvt():
    """EXPERIMENT: fully-transposed flash forward (d-major PV emission).

    The shipped kernel's PV contraction emits (bq, d+1=41) — 41 of 128
    output LANES, so every MXU pass wastes 68% of the array (the r3 d-major
    probe hinted the other orientation is ~3x better but was confounded by
    relayout cost). This prototype computes the whole inner pipeline
    transposed: logits_t = k_h q_h^T (bkv, bq), softmax along SUBLANES,
    acc_t = v_h^T p (d+1, bq) — output lanes full bq, the 41 pads only to
    48 sublanes (1.17x vs 3.1x). Per-head transpose of the tiny (d, bq)
    acc happens once per q block at the end. Numerics checked against the
    shipped kernel in-probe before timing.
    """
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from humanvid_tpu.ops import flash_attention as fa
    from humanvid_tpu.ops.common import LOG2E, NEG_INF

    def kernel_t(q_ref, k_ref, vt_ref, *rest, heads, has_bias):
        if has_bias:
            bias_ref, o_ref, lse_ref, *scratch = rest
        else:
            o_ref, lse_ref, *scratch = rest
        j = pl.program_id(2)
        num_kv = pl.num_programs(2)
        accs, ms = scratch[:heads], scratch[heads:]
        c = q_ref.shape[-1]
        d = c // heads

        @pl.when(j == 0)
        def _():
            for h in range(heads):
                accs[h][...] = jnp.zeros_like(accs[h])
                ms[h][...] = jnp.full_like(ms[h], -jnp.inf)

        q = q_ref[0]      # (bq, C) pre-scaled by scale*log2e
        k = k_ref[0]      # (bkv, C)
        vt = vt_ref[0]    # (heads*(d+1), bkv) pre-transposed+augmented

        def qk_t(h):
            sl = slice(h * d, (h + 1) * d)
            lt = jax.lax.dot_general(
                k[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bkv, bq), log2 domain
            if has_bias:
                lt = lt + bias_ref[0]  # (bkv, 1) broadcasts over bq lanes
            return lt

        lt = qk_t(0)
        for h in range(heads):
            nxt = qk_t(h + 1) if h + 1 < heads else None
            m_prev = ms[h][...]                       # (1, bq)
            m_cur = jnp.max(lt, axis=0, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_new)          # (1, bq)
            p = jnp.exp2(lt - m_new)                  # (bkv, bq)
            ms[h][...] = m_new
            accs[h][...] = accs[h][...] * alpha + jax.lax.dot_general(
                vt[h * (d + 1):(h + 1) * (d + 1), :], p.astype(vt.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d+1, bq): rows [v^T p ; colsum(p)]
            lt = nxt

        @pl.when(j == num_kv - 1)
        def _():
            o_ref[0] = jnp.concatenate(
                [(accs[h][:d, :] / accs[h][d:, :]).T.astype(o_ref.dtype)
                 for h in range(heads)], axis=-1)
            lse_ref[0] = jnp.concatenate(
                [ms[h][...] + jnp.log2(accs[h][d:, :])
                 for h in range(heads)], axis=0)  # (heads, bq)

    def flash_t(q, k, v, key_bias, heads, block_q, block_kv):
        b, lq, c = q.shape
        lk = k.shape[1]
        d = c // heads
        scale = d ** -0.5
        qs = (q * q.dtype.type(scale * LOG2E)).astype(q.dtype)
        vt = jnp.swapaxes(fa._augment_v(v, heads), 1, 2)  # (B, C_aug, Lk)
        c_v = heads * (d + 1)
        has_bias = key_bias is not None
        inputs = [qs, k, vt]
        in_specs = [
            pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, c_v, block_kv), lambda b, i, j: (b, 0, j)),
        ]
        if has_bias:
            inputs.append(
                (key_bias * LOG2E).astype(jnp.float32)[:, :, None])
            in_specs.append(
                pl.BlockSpec((1, block_kv, 1), lambda b, i, j: (b, j, 0)))
        grid = (b, lq // block_q, lk // block_kv)
        out, lse = pl.pallas_call(
            ft.partial(kernel_t, heads=heads, has_bias=has_bias),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, heads, block_q), lambda b, i, j: (b, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, lq, c), q.dtype),
                jax.ShapeDtypeStruct((b, heads, lq), jnp.float32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((d + 1, block_q), jnp.float32)] * heads
                + [pltpu.VMEM((1, block_q), jnp.float32)] * heads
            ),
            compiler_params=fa._compiler_params(),
        )(*inputs)
        return out

    rng = np.random.default_rng(0)
    heads, d = 8, 40
    c = heads * d

    # numerics first, at a small real shape with a bias row
    b0, lq0, lk0 = 2, 1024, 2048
    q0 = jnp.asarray(rng.normal(size=(b0, lq0, c)), jnp.bfloat16)
    k0 = jnp.asarray(rng.normal(size=(b0, lk0, c)), jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=(b0, lk0, c)), jnp.bfloat16)
    bias0 = jnp.where(
        jnp.arange(lk0)[None, :] % 7 == 0, NEG_INF, 0.0
    ).astype(jnp.float32) * jnp.ones((b0, 1), jnp.float32)
    want = fa._flash_fwd(q0, k0, v0, bias0, heads,
                         block_q=512, block_kv=512)
    got = flash_t(q0, k0, v0, bias0, heads, 512, 512)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"# pvt numerics max|delta| = {err:.5f} (bf16 tolerance ~0.02)",
          file=sys.stderr, flush=True)
    assert err < 0.05, err

    # timing at the level-0 inference shape (24 rows x 8 heads, ref-KV)
    b1, lq1, lk1 = 24, 6144, 12288
    q1 = jnp.asarray(rng.normal(size=(b1, lq1, c)), jnp.bfloat16)
    k1 = jnp.asarray(rng.normal(size=(b1, lk1, c)), jnp.bfloat16)
    v1 = jnp.asarray(rng.normal(size=(b1, lk1, c)), jnp.bfloat16)
    flops = 4 * b1 * heads * lq1 * lk1 * d
    for name, bq, bkv in (("cur_1024x1024", 1024, 1024),
                          ("pvt_1024x1024", 1024, 1024),
                          ("pvt_512x1024", 512, 1024),
                          ("pvt_1024x2048", 1024, 2048),
                          ("pvt_512x2048", 512, 2048)):
        if name.startswith("cur"):
            op = lambda q_, k_, v_: fa._flash_fwd(q_, k_, v_, None, heads,
                                                  block_q=bq, block_kv=bkv)
        else:
            op = lambda q_, k_, v_: flash_t(q_, k_, v_, None, heads, bq, bkv)
        fn, n = _chain(op, 10)
        try:
            sec, dts = _time(jax.jit(fn), q1, k1, v1)
        except Exception as e:  # noqa: BLE001
            print(f"# pvt {name} failed: {str(e).splitlines()[0][:200]}",
                  file=sys.stderr, flush=True)
            continue
        sec /= n
        _emit(f"pvt_{name}", sec, dts, tflops=round(flops / sec / 1e12, 2))


def probe_gnstats():
    """GN formulation shoot-out at the r5 hot shapes (trace: GN-stats
    convert_reduce fusions run at 22-82 GB/s = 55% of the VAE decode, 16%
    of the UNet pass). Compares flax's reduce order (rows + lane-minor
    16-channel group fragment together) against the two-stage order
    (per-channel row reduce on full 128-lane vectors, then the tiny
    (N,C)->(N,G) combine) and the r4 Pallas stats kernel."""
    from humanvid_tpu.ops.group_norm import _fused, _reference, _two_stage

    rng = np.random.default_rng(0)
    for tag, shape in (("vae_hi", (8, 768, 512, 128)),
                       ("vae_mid", (8, 384, 256, 256)),
                       ("vae_lo", (8, 192, 128, 512)),
                       ("unet_l0", (24, 96, 64, 320)),
                       ("unet_l3", (24, 24, 16, 1280))):
        c = shape[-1]
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        arms = {
            "flax": lambda xc, s, b: _reference(xc, s, b, 32, 1e-6, "silu"),
            "two_stage": lambda xc, s, b: _two_stage(xc, s, b, 32, 1e-6,
                                                     "silu"),
            "pallas": lambda xc, s, b: _fused(xc, s, b, 32, 1e-6, "silu",
                                              False),
        }
        for arm, op in arms.items():
            fn, n = _chain(op, 40)
            sec, dts = _time(jax.jit(fn), x, scale, bias)
            sec /= n
            # minimum real traffic: read x + write y
            _emit(f"gnstats_{tag}_{arm}", sec, dts,
                  gbs=round(2 * x.size * 2 / sec / 1e9, 1))


def probe_hbm():
    """Raw HBM streaming floor at the decode/UNet tensor shapes: a pure
    elementwise map (1 read + 1 write) and a two-operand add (2R + 1W).
    Calibrates whether the ~14.5 ms/tensor seen for GN-ish fusions in the
    r4 trace is a hardware/tunnel bandwidth floor or an XLA codegen
    pathology — the delta between this and probe_gn is the fixable part."""
    rng = np.random.default_rng(0)
    for tag, shape in (("vae_hi", (8, 768, 512, 128)),
                       ("vae_mid", (8, 384, 256, 256)),
                       ("unet_l0", (24, 96, 64, 320))):
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        y = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

        fn, n = _chain(lambda xc: xc * 1.0001 + 0.5, 40)
        sec, dts = _time(jax.jit(fn), x)
        sec /= n
        _emit(f"hbm_map_{tag}", sec, dts,
              gbs=round(2 * x.size * 2 / sec / 1e9, 1))

        fn, n = _chain(lambda xc, yc: xc + yc, 40)
        sec, dts = _time(jax.jit(fn), x, y)
        sec /= n
        _emit(f"hbm_add_{tag}", sec, dts,
              gbs=round(3 * x.size * 2 / sec / 1e9, 1))

        # spatial-mean reduce (1 read), the GN-stats access pattern
        def red(xc, yc):
            m = jnp.mean(xc.astype(jnp.float32), axis=(1, 2), keepdims=True)
            return xc + m.astype(xc.dtype) * 1e-6 + yc * 0
        fn, n = _chain(red, 40)
        sec, dts = _time(jax.jit(fn), x, y)
        sec /= n
        _emit(f"hbm_reduce_{tag}", sec, dts,
              gbs=round(2 * x.size * 2 / sec / 1e9, 1))

        # the same 1R+1W map as a Pallas kernel with big blocks: if this is
        # fast while hbm_map is slow, the floor is XLA fusion codegen, not
        # the memory system (the flash kernel's arithmetic already implies
        # ~100 GB/s sustained KV streaming)
        from jax.experimental import pallas as pl

        rows = int(np.prod(shape[:-1]))
        lanes = shape[-1]
        x2 = x.reshape(rows, lanes)
        blk = 2048
        while rows % blk:
            blk //= 2

        def pmap_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 1.0001 + 0.5

        def pallas_map(xc):
            return pl.pallas_call(
                pmap_kernel,
                out_shape=jax.ShapeDtypeStruct((rows, lanes), xc.dtype),
                grid=(rows // blk,),
                in_specs=[pl.BlockSpec((blk, lanes), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((blk, lanes), lambda i: (i, 0)),
            )(xc)

        fn, n = _chain(pallas_map, 40)
        sec, dts = _time(jax.jit(fn), x2)
        sec /= n
        _emit(f"hbm_pallas_map_{tag}", sec, dts,
              gbs=round(2 * x.size * 2 / sec / 1e9, 1))


def probe_vaeattn():
    """VAE mid-block single-head attention at the decode shape (8 frames,
    6144 tokens, d=512): the r4 decode trace put the chunked-XLA softmax
    fusion at 0.433 s/iter — 44% of the whole decode. Candidate fix: the
    packed flash kernel (d=512 pads lanes to 640; QK/PV contractions are
    full-depth, unlike the d=40 UNet heads)."""
    from humanvid_tpu.ops.attention import _chunked_xla_attention
    from humanvid_tpu.ops.flash_attention import flash_attention

    b, h, l, d = 8, 1, 6144, 512
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
    flops = 4 * b * h * l * l * d

    fn, n = _chain(lambda q, k, v: _chunked_xla_attention(q, k, v, None), 4)
    sec, dts = _time(jax.jit(fn), q, k, v)
    sec /= n
    _emit("vaeattn_chunked_xla", sec, dts, tflops=round(flops / sec / 1e12, 2))

    for bq, bkv in ((512, 1024), (1024, 1024), (512, 2048)):
        fn, n = _chain(functools.partial(
            flash_attention, block_q=bq, block_kv=bkv), 4)
        try:
            sec, dts = _time(jax.jit(fn), q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"# vaeattn flash ({bq},{bkv}) failed: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr, flush=True)
            continue
        sec /= n
        _emit(f"vaeattn_flash_{bq}x{bkv}", sec, dts,
              tflops=round(flops / sec / 1e12, 2))


def probe_flash_bwd():
    """Backward-kernel block sweep at the stage-2 training attention shape
    (bs 1 x 24 frames, 7168 spatial tokens at 896x512 level 0, self+ref KV:
    Lq=7168, Lk=14336, 8 heads d=40). VERDICT r3 weak #4: the backward ran
    fixed (512, 1024) blocks, never tuned like the forward."""
    from humanvid_tpu.ops import flash_attention as fa

    b, h, lq, lk, d = 24, 8, 7168, 14336, 40
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    bias = jnp.zeros((b, 1, 1, lk), jnp.float32)
    # fwd+bwd FLOPs ~ 2.5x fwd for attention (dq, dkv recompute included)
    flops = 10 * b * h * lq * lk * d

    for bq, bkv in ((512, 1024), (512, 512), (1024, 1024), (256, 1024),
                    (1024, 512)):
        fa._BWD_BLOCK_Q, fa._BWD_BLOCK_KV = bq, bkv

        def value_and_grads(q_, k_, v_, bias_):
            def loss(qq, kk, vv):
                o = fa.flash_attention(qq, kk, vv, bias_)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss, (0, 1, 2))(q_, k_, v_)

        fn, n = _chain(
            lambda q_, k_, v_, bias_: value_and_grads(q_, k_, v_, bias_)[0],
            3)
        try:
            sec, dts = _time(jax.jit(fn), q, k, v, bias)
        except Exception as e:  # noqa: BLE001
            print(f"# flash_bwd ({bq},{bkv}) failed: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr,
                  flush=True)
            continue
        sec /= n
        _emit(f"flash_fwdbwd_{bq}x{bkv}", sec, dts,
              tflops=round(flops / sec / 1e12, 2))
    fa._BWD_BLOCK_Q = int(os.environ.get("HVT_FLASH_BWD_BQ", "512"))
    fa._BWD_BLOCK_KV = int(os.environ.get("HVT_FLASH_BWD_BKV", "1024"))


PROBES = {"flash": probe_flash, "flash_sweep": probe_flash_sweep,
          "temporal": probe_temporal, "unet": probe_unet, "vae": probe_vae,
          "dmajor": probe_dmajor, "conv": probe_conv, "gn": probe_gn,
          "vaeattn": probe_vaeattn, "flash_bwd": probe_flash_bwd,
          "hbm": probe_hbm, "gnstats": probe_gnstats, "pvt": probe_pvt}


if __name__ == "__main__":
    names = sys.argv[1:] or ["flash", "temporal", "unet", "vae"]
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    for n in names:
        try:
            PROBES[n]()
        except Exception as e:  # noqa: BLE001 — probes are independent
            print(f"# probe {n} failed: {str(e).splitlines()[0][:300]}",
                  file=sys.stderr, flush=True)
