"""Device-trace component budget of the video-UNet pass (and VAE decode).

Runs the flagship-shape UNet CFG-half (768x512, 24 frames — BASELINE config
#3) under ``jax.profiler.trace`` and reduces the XLA device timeline into an
op-class budget: Pallas attention kernels, convolutions, elementwise fusions,
reduce (GroupNorm-style) fusions, copies/relayouts. This reproduces the
round-1 "where the UNet pass goes" table (PERF.md) so kernel swaps can be
re-attributed instead of hand-parsed from Perfetto.

Usage:  python tools/trace_budget.py [unet] [vae]   (default: unet)
        python tools/trace_budget.py parse:<logdir>[:iters]
Output: one JSON line per traced program + a top-op listing on stderr.

The ``parse:`` form attributes an EXISTING profile directory — e.g. a
train-step trace captured with ``HVT_EXEC_PROFILE=<dir> python
tools/stage2_memcheck.py exec`` — without re-running anything on the chip
(the reference tracked the analogous per-phase training time by hand,
``train_stage_2.py:328-330``).
"""

import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

H, W, F = 768, 512, 24


def _classify(name: str) -> str:
    n = name.lower()
    # flash backward kernels (train-step traces) before the generic tests
    if "dkv" in n or n.startswith(("dq_", "_dq")) or "dq_kernel" in n:
        return "pallas_attention_bwd"
    if "attn" in n or "flash" in n or "temporal" in n:
        return "pallas_attention"
    # collectives before the generic "reduce" test: multichip traces emit
    # all-reduce / reduce-scatter rows that are communication, not GN stats
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n \
            or "collective" in n or "ppermute" in n:
        return "collective"
    # "reduce" must be tested before the conv prefix: XLA names GroupNorm
    # stats fusions "convert_reduce_fusion.*", which starts with "conv"
    if "reduce" in n:
        return "reduce_fusion"
    # "convert[_fusion]" rows are elementwise dtype casts, not convolutions —
    # they start with "conv" and previously inflated the convolution bucket
    if "convert" in n and "convolution" not in n:
        return "elementwise_fusion"
    if "convolution" in n or n.startswith("conv") or "cudnn" in n:
        return "convolution"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy"
    if "fusion" in n or "multiply" in n or "add" in n or "loop" in n:
        return "elementwise_fusion"
    if "dot" in n or "gemm" in n or "matmul" in n:
        return "matmul"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n:
        return "data_movement"
    return "other"


_OP_META = {}


def _device_op_budget(logdir: str):
    """Parse the xplane/chrome trace into {class: seconds} + top ops."""
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: process metadata names like "/device:TPU:0" or "TPU ...";
    # keep pids whose name mentions TPU/device and are not host threads
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if re.search(r"tpu|device", pname, re.I) and "host" not in pname.lower():
                dev_pids.add(e.get("pid"))
    per_op = {}
    excluded_s = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # skip trace-framework rows (steps, run_ids) and whole-program /
        # control-structure rows (jit_<fn>, while.N) whose durations span the
        # leaf ops and would double-count the budget.  Their total is tracked
        # and printed so any under-count (a trace emitting only span rows
        # without body leaf ops) is visible rather than silent.
        if name.startswith(("Steps", "XLA Modules", "program", "jit_",
                            "while")):
            excluded_s += e.get("dur", 0.0) / 1e6
            continue
        per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0.0) / 1e6
        # keep one metadata blob per op so top entries are identifiable
        # (the xplane->chrome conversion stores the HLO long_name/source here)
        if name not in _OP_META and e.get("args"):
            _OP_META[name] = e["args"]
    budget = {}
    for name, sec in per_op.items():
        cls = _classify(name)
        # conv-rooted loop fusions are named plain "fusion.N"; detect them by
        # their leading (kh, kw, Ci, Co) kernel operand in the HLO long_name
        # so decode convolutions are not booked as elementwise (r4 finding)
        if cls == "elementwise_fusion":
            meta = str(_OP_META.get(name, ""))
            if re.search(r"fusion\((bf16|f32|f16)\[\d,\d,\d+,\d+\]", meta):
                cls = "convolution"
        budget[cls] = budget.get(cls, 0.0) + sec
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:int(os.environ.get("HVT_TRACE_TOP", "25"))]
    return budget, top, sum(per_op.values()), excluded_s


def _conv_tflops(long_name: str, sec: float) -> float:
    """Effective TF/s for a convolution row: parse ``out_shape
    convolution(in_shape, kernel_shape)`` from the HLO long name. Returns
    0.0 when the row is not a parseable conv or sec is 0."""
    if "convolution(" not in long_name or sec <= 0:
        return 0.0
    shapes = [[int(v) for v in g.split(",")] for g in
              re.findall(r"(?:bf16|f32|f16)\[([\d,]+)\]", long_name)]
    # "= out convolution(in ..., kernel ...)": out, input, kernel
    if len(shapes) < 3 or len(shapes[0]) != 4 or len(shapes[2]) != 4:
        return 0.0
    out, ker = shapes[0], shapes[2]
    # HWIO kernel: FLOPs = 2 * prod(out) * kh * kw * cin
    flops = 2.0 * np.prod(out, dtype=np.float64) * ker[0] * ker[1] * ker[2]
    return float(flops / sec / 1e12)


_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8}


def _row_gbs(long_name: str, sec: float) -> float:
    """Effective HBM GB/s for a streaming (fusion/copy/reduce) row: sum the
    byte sizes of every typed shape in the HLO long name (output + operands —
    an upper bound on unique traffic; rematerialized reads make it a lower
    bound, so treat as order-of-magnitude).  0.0 when unparseable."""
    if sec <= 0:
        return 0.0
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", long_name):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for v in dims.split(","):
            if v:
                n *= int(v)
        total += n * _DTYPE_BYTES[dt]
    return float(total / sec / 1e9)


def _run_traced(tag: str, fn, *args, iters: int = 3):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    logdir = tempfile.mkdtemp(prefix=f"hvt_trace_{tag}_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
            # forced fetch: drains the device queue (axon ack quirk, PERF.md)
            float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    _OP_META.clear()  # op names (fusion.N) collide across programs
    _report(tag, logdir, iters)
    shutil.rmtree(logdir, ignore_errors=True)


def _report(tag: str, logdir: str, iters: int):
    """Shared budget/top-op report for a parsed profile directory."""
    budget, top, total, excluded = _device_op_budget(logdir)
    per_iter = {k: round(v / iters, 4) for k, v in
                sorted(budget.items(), key=lambda kv: -kv[1])}
    print(f"# --- {tag}: top device ops (total {total:.3f}s / {iters} iters; "
          f"excluded span rows {excluded:.3f}s) ---",
          file=sys.stderr)
    for name, sec in top:
        meta = _OP_META.get(name, {})
        long = str(meta.get("long_name") or meta.get("hlo_op") or
                   meta.get("tf_op") or "")
        tfs = _conv_tflops(long, sec / iters)
        note = f" [{tfs:.0f} TF/s]" if tfs else ""
        if not tfs:
            gbs = _row_gbs(long, sec / iters)
            note = f" [{gbs:.0f} GB/s]" if gbs else ""
        print(f"#   {sec / iters:8.4f}s{note}  {name[:110]}  {long[:160]}",
              file=sys.stderr)
    print(json.dumps({"trace": tag, "iters": iters,
                      "device_total_s": round(total / iters, 4),
                      "excluded_span_s": round(excluded / iters, 4),
                      "budget_s": per_iter}), flush=True)


def main():
    which = sys.argv[1:] or ["unet"]
    parse_jobs = [w for w in which if w.startswith("parse:")]
    for job in parse_jobs:
        # "parse:<logdir>[:iters]" — logdir may itself contain colons, so
        # only treat a trailing ":<digits>" as the iters suffix
        spec = job.split(":", 1)[1]
        logdir, iters = spec, 1
        if ":" in spec:
            head, tail = spec.rsplit(":", 1)
            if tail.isdigit():
                logdir, iters = head, int(tail)
        _OP_META.clear()
        _report(f"parsed:{os.path.basename(logdir.rstrip('/'))}",
                logdir, iters)
    which = [w for w in which if not w.startswith("parse:")]
    if not which:
        return

    from humanvid_tpu.ops.attention import set_default_attention_backend
    from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
    from humanvid_tpu.utils.transfer import packed_device_put

    set_default_attention_backend("auto")

    system = CamAnimate(CamAnimateConfig(), dtype=jnp.bfloat16)
    params = system.init_params(jax.random.PRNGKey(0), 256, 192, frames=2,
                                abstract=True)
    keep = {"denoising_unet", "reference_unet"}
    if "vae" in which:
        keep.add("vae_decoder")
    params = jax.block_until_ready(
        packed_device_put({k: params[k] for k in keep}))

    h8, w8 = H // 8, W // 8
    rng = np.random.default_rng(0)

    if "unet" in which:
        latents = jnp.asarray(rng.normal(size=(F, h8, w8, 4)), jnp.bfloat16)
        t = jnp.full((1,), 500.0, jnp.bfloat16)
        ctx = jnp.asarray(rng.normal(size=(1, 1, 768)), jnp.bfloat16)
        ref_lat = jnp.asarray(rng.normal(size=(1, h8, w8, 4)), jnp.bfloat16)
        cond = jnp.asarray(rng.normal(size=(F, h8, w8, 320)), jnp.bfloat16)

        def ref_feats(params, ref_lat, ctx):
            _, feats = system.reference_unet.apply(
                params["reference_unet"], ref_lat,
                jnp.zeros((1,), jnp.float32), ctx, collect_ref_features=True)
            return feats

        feats = jax.jit(ref_feats)(params, ref_lat, ctx)
        jax.tree.map(lambda x: x.block_until_ready(), feats)

        def unet_pass(params, latents, t, ctx, cond, feats):
            eps, _ = system.denoising_unet.apply(
                params["denoising_unet"], latents, t, ctx,
                cond_fea=cond, ref_features=feats, frames=F)
            return eps

        _run_traced("unet_pass_24f_96x64", jax.jit(unet_pass),
                    params, latents, t, ctx, cond, feats)

    if "vae" in which:
        lat = jnp.asarray(rng.normal(size=(F, h8, w8, 4)), jnp.bfloat16)
        chunk = int(os.environ.get("HVT_TRACE_DECODE_CHUNK", "8"))

        def decode(p, lat):
            def one(z):
                return system.vae_decoder.apply(p["vae_decoder"], z)
            return jax.lax.map(one, lat.reshape(F // chunk, chunk, h8, w8, 4))

        _run_traced(f"vae_decode_24f_chunk{chunk}", jax.jit(decode),
                    params, lat)


if __name__ == "__main__":
    main()
