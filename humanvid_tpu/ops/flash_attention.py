"""Pallas TPU flash attention in the PACKED head layout.

Replaces the reference's xformers ``memory_efficient_attention``
(``/root/reference/src/models/attention.py``, diffusers Attention) for the
long spatial sequences of the video UNet (Lq up to 6144, Lk up to 12288 with
reference-feature KV concat, head dim 40/80).

Why packed: the conventional (B, H, L, D) kernel operand layout forces XLA to
materialize head-split relayout copies whose last dim D=40 lane-pads 40->128
(3.2x) — measured 672 MB per k/v per level-0 attention in the stage-2
training step, the single biggest contributor to the 18.5 GB single-chip
OOM, plus ~7% of the inference UNet pass in relayout copies. This kernel
instead consumes q/k/v exactly as the surrounding Dense layers produce them:
``(B, L, C)`` with heads packed in the channel axis (C = heads*head_dim,
320 -> 384 lanes = 1.2x padding). Heads are peeled off INSIDE the kernel as
lane slices (the masked-dense temporal kernel proves Mosaic handles d=40
lane slicing efficiently), so no head split/merge transpose exists anywhere
in the program, in either direction of either pass.

Structure per kernel step (grid (B, q_blocks, kv_blocks), kv sequential):
one python-unrolled, software-pipelined loop over heads (head h+1's QK
contraction is issued before head h's softmax so MXU and VPU overlap); per
head one MXU contraction q_h k_h^T -> fp32 logits in VMEM, online softmax in
the log2 domain (the TPU's transcendental unit evaluates exp2 natively;
scale * log2(e) is folded into q once outside the kernel), one PV
contraction into a per-head fp32 VMEM accumulator whose last column is the
softmax denominator (v is pre-augmented with a per-head ones column, so the
rowsum rides the same MXU op instead of a separate VPU reduction). The additive per-key bias (the CFG reference-KV disable)
rides as a (B, Lk) fp32 row, pre-multiplied by log2(e), fused into the same
VPU pass that subtracts the running max.

The backward needs no O(Lq*Lk) residual: it recomputes p from (q, k, bias)
and the forward's per-(head, row) log2-domain log-sum-exp, FlashAttention-2
style — one kernel accumulating dk/dv per kv block, one accumulating dq per
q block. Training stores only the packed q/k/v/out/lse.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuning env vars, read ONCE at import (they bind at trace time, so mutating
# them later in a process would silently have no effect — freezing them here
# makes that explicit):
#   HVT_FLASH_BQ / HVT_FLASH_BKV — default q/kv block sizes; measured on v5e
#   at the SD1.5 level-0 shape (bh=192, 6144x12288, d=40) with chained
#   (fetch-free) timing, r3 fused-rowsum + pipelined-head kernel:
#   (1024, 1024) = 49.5 TF/s (vs 42.1 for the r2 kernel at its best blocks),
#   (512, 1024) = 49.3, (1024, 2048) = 40.4 (two live fp32 logits buffers
#   overrun the sweet spot), (2048, 1024) = 41.6, (1024, 512) = 33.7,
#   (256, 12288) single-shot = 39.6.
#   HVT_FLASH_BWD — "kernel" (fused Pallas backward) or "chunked" (recompute
#   + scanned XLA einsum fallback).
#   HVT_FLASH_VMEM — scoped-vmem budget for the kernels (the per-head loop
#   keeps fp32 (block_q, block_kv) intermediates live, and the r3 pipelined
#   head loop holds TWO logits blocks at once; XLA's default 16 MB scope is
#   too tight for the tuned blocks). At the r3 default (1024, 1024) with
#   C=320 the r2-era AOT measurement scales to ~43 MB of stacked
#   intermediates; the budget stays 96 MB of the v5e's 128 MB physical VMEM
#   so larger experimental blocks still compile ((1024, 2048) needs ~78 MB
#   with the double-buffered logits).
#   HVT_FLASH_LAYOUT — "t" (default; r5 transposed-PV forward, 66.6 TF/s at
#   the level-0 shape) or "q" (the straight r3 kernel, 51.6 TF/s). The
#   transposed layout only applies when d+1 <= 128 sublanes; wide heads
#   (the VAE's d=512) always take the straight kernel, whose PV output is
#   lane-complete already.
_DEFAULT_BLOCK_Q = int(os.environ.get("HVT_FLASH_BQ", "1024"))
_DEFAULT_BLOCK_KV = int(os.environ.get("HVT_FLASH_BKV", "1024"))
_FWD_LAYOUT = os.environ.get("HVT_FLASH_LAYOUT", "t")
_BWD_LAYOUT = os.environ.get("HVT_FLASH_BWD_LAYOUT", "t")
_BWD_MODE = os.environ.get("HVT_FLASH_BWD", "kernel")
_BWD_BLOCK_Q = int(os.environ.get("HVT_FLASH_BWD_BQ", "512"))
_BWD_BLOCK_KV = int(os.environ.get("HVT_FLASH_BWD_BKV", "1024"))
_VMEM_LIMIT = int(os.environ.get("HVT_FLASH_VMEM", str(96 * 1024 * 1024)))

# Softmax runs in the log2 domain; the saved log-sum-exp is in LOG2 units and
# the backward kernels exp2 with it symmetrically.
from .common import LOG2E, NEG_INF, ceil_to as _ceil_to  # noqa: E402,F401


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, *rest, heads: int, has_bias: bool):
    """Blocks: q (1, bq, C) PRE-SCALED by scale*log2e, k/v (1, bkv, C),
    optional bias (1, 1, bkv) fp32 pre-multiplied by log2e. Scratch: per-head
    fp32 acc (bq, d+1), m (bq, 1). ``has_bias=False`` compiles the common
    no-mask path (pure self-attention; cond rows in sequential CFG) without
    the per-head (bq, bkv) VPU broadcast-add.

    The softmax denominator is NOT a separate VPU reduction: the caller
    augments every head's v slice with a ones column (``_augment_v``, one XLA
    pass per call instead of one concat per grid step), so the PV contraction
    emits ``[p@v, sum(p)]`` in one MXU op — the extra column rides in output
    lanes the 40->128 lane pad wastes anyway, and the l rescale is the same
    acc rescale. This removes a full (bq, bkv) VPU pass per head per step."""
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
            accs[h][:] = jnp.zeros_like(accs[h])
            ms[h][:] = jnp.full_like(ms[h], -jnp.inf)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]  # (bkv, heads*(d+1)) — pre-augmented, column d of each
    # head slice is ones (see _augment_v)

    def qk(h):
        sl = slice(h * d, (h + 1) * d)
        # MXU: operands stay in their storage dtype (bf16 runs at full
        # systolic rate); fp32 accumulation via preferred_element_type.
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bkv), log2 domain
        if has_bias:
            logits = logits + bias_ref[0, 0][None, :]
        return logits

    # Software-pipelined head loop: head h+1's QK contraction is issued
    # BEFORE head h's softmax so the MXU (next QK, this PV) and the VPU
    # (this softmax) overlap — the serial form measured as the plain sum
    # MXU+VPU (53 ms at the level-0 ref-KV shape), i.e. zero overlap.
    logits = qk(0)
    for h in range(heads):
        nxt = qk(h + 1) if h + 1 < heads else None
        m_prev = ms[h][:]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(logits - m_new)
        ms[h][:] = m_new
        accs[h][:] = accs[h][:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v[:, h * (d + 1):(h + 1) * (d + 1)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, d+1): [p @ v_h, rowsum(p)]
        logits = nxt

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = jnp.concatenate(
            [(accs[h][:, :d] / accs[h][:, d:]).astype(o_ref.dtype)
             for h in range(heads)], axis=-1)
        lse_ref[0] = jnp.stack(
            [(ms[h][:] + jnp.log2(accs[h][:, d:]))[:, 0] for h in range(heads)],
            axis=0)  # (heads, bq), log2 units


def _fwd_kernel_t(q_ref, k_ref, vt_ref, *rest, heads: int, has_bias: bool):
    """Transposed-pipeline forward (r5): logits_t = k_h q_h^T (bkv, bq),
    softmax along sublanes, acc_t = v_h^T p -> (d+1, bq).

    Why: the straight kernel's PV contraction emits (bq, d+1) — 41 of 128
    output LANES for SD's d=40 heads, so every PV MXU pass wastes 68% of
    the array. Emitting (d+1, bq) keeps all 128 output lanes live (bq) and
    moves the padding to sublanes (41 -> 48, 1.17x). Measured at the
    level-0 ref-KV shape: 66.6 TF/s vs 51.6 for the straight kernel (r5
    microbench `pvt`), above the old "61.5 TF/s d=40 ceiling" — that
    ceiling priced the PV lane pad, which this layout escapes. Numerics are
    bit-identical (same contraction order). The tiny (d, bq) -> (bq, d)
    accumulator transposes happen once per q block at the end, amortized
    over the kv loop. Same out/lse contract as ``_fwd_kernel``, so the
    backward kernels are shared. Blocks: v rides pre-transposed (1, C_aug,
    bkv); the bias column block is (1, bkv, 1) and broadcasts over lanes.
    """
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

    q = q_ref[0]      # (bq, C), pre-scaled by scale*log2e
    k = k_ref[0]      # (bkv, C)
    vt = vt_ref[0]    # (heads*(d+1), bkv), pre-transposed + ones row

    def qk_t(h):
        sl = slice(h * d, (h + 1) * d)
        lt = jax.lax.dot_general(
            k[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bkv, bq), log2 domain
        if has_bias:
            lt = lt + bias_ref[0]  # (bkv, 1) broadcasts over the bq lanes
        return lt

    # software-pipelined head loop, as in _fwd_kernel
    lt = qk_t(0)
    for h in range(heads):
        nxt = qk_t(h + 1) if h + 1 < heads else None
        m_prev = ms[h][...]                        # (1, bq)
        m_cur = jnp.max(lt, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(lt - m_new)                   # (bkv, bq)
        ms[h][...] = m_new
        accs[h][...] = accs[h][...] * alpha + jax.lax.dot_general(
            vt[h * (d + 1):(h + 1) * (d + 1), :], p.astype(vt.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d+1, bq): rows [v_h^T p ; colsum(p)]
        lt = nxt

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = jnp.concatenate(
            [(accs[h][:d, :] / accs[h][d:, :]).T.astype(o_ref.dtype)
             for h in range(heads)], axis=-1)
        lse_ref[0] = jnp.concatenate(
            [ms[h][...] + jnp.log2(accs[h][d:, :]) for h in range(heads)],
            axis=0)  # (heads, bq), log2 units


def _augment_v(v, heads):
    """(B, Lk, heads*d) -> (B, Lk, heads*(d+1)) with a ones column appended
    to every head slice — the PV contraction's denominator column."""
    b, lk, c = v.shape
    d = c // heads
    v4 = v.reshape(b, lk, heads, d)
    ones = jnp.ones((b, lk, heads, 1), v.dtype)
    return jnp.concatenate([v4, ones], axis=-1).reshape(b, lk, heads * (d + 1))


def _flash_fwd(q, k, v, key_bias, heads, *, block_q: int, block_kv: int,
               with_lse: bool = False):
    """q: (B, Lq, C) k/v: (B, Lk, C) key_bias: (B, Lk) -> (B, Lq, C).

    Only the sequence axes are padded to block multiples (often a no-op for
    the SD latent shapes); the channel axis keeps the packed layout end to
    end. ``with_lse=True`` also returns the per-(head, row) log-sum-exp
    (B, heads, Lq) fp32 in log2 units (the backward's residual).
    """
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads
    scale = d ** -0.5

    lq_pad = _ceil_to(lq, block_q)
    lk_pad = _ceil_to(lk, block_kv)
    qs = (q * q.dtype.type(scale * LOG2E)).astype(q.dtype)
    v = _augment_v(v, heads)
    c_v = heads * (d + 1)
    if lq_pad != lq:
        qs = jnp.pad(qs, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if key_bias is None and lk_pad != lk:
        # padding keys must be hidden: take the bias path with a zero bias
        key_bias = jnp.zeros((b, lk), jnp.float32)
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, 0), (0, lk_pad - lk)),
                           constant_values=NEG_INF)
    has_bias = key_bias is not None
    # transposed layout (r5): PV emits (d+1, bq) — full output lanes, the
    # d=40 pad moves to sublanes. Only for heads small enough to fit the
    # sublane tile budget; HVT_FLASH_LAYOUT=q forces the straight kernel.
    use_t = (d + 1) <= 128 and _FWD_LAYOUT != "q"
    grid = (b, lq_pad // block_q, lk_pad // block_kv)
    if use_t:
        vt = jnp.swapaxes(v, 1, 2)  # (B, C_aug, Lk_pad)
        inputs = [qs, k, vt]
        in_specs = [
            pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, c_v, block_kv), lambda b, i, j: (b, 0, j)),
        ]
        if has_bias:
            inputs.append((key_bias * LOG2E).astype(jnp.float32)[:, :, None])
            in_specs.append(
                pl.BlockSpec((1, block_kv, 1), lambda b, i, j: (b, j, 0)))
        kernel = functools.partial(_fwd_kernel_t, heads=heads,
                                   has_bias=has_bias)
        scratch = ([pltpu.VMEM((d + 1, block_q), jnp.float32)] * heads
                   + [pltpu.VMEM((1, block_q), jnp.float32)] * heads)
    else:
        inputs = [qs, k, v]
        in_specs = [
            pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, c_v), lambda b, i, j: (b, j, 0)),
        ]
        if has_bias:
            inputs.append((key_bias * LOG2E).astype(jnp.float32)[:, None, :])
            in_specs.append(
                pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)))
        kernel = functools.partial(_fwd_kernel, heads=heads,
                                   has_bias=has_bias)
        scratch = ([pltpu.VMEM((block_q, d + 1), jnp.float32)] * heads
                   + [pltpu.VMEM((block_q, 1), jnp.float32)] * heads)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, heads, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, heads, lq_pad), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
    )(*inputs)
    out = out[:, :lq] if lq_pad != lq else out
    if with_lse:
        lse = lse[:, :, :lq] if lq_pad != lq else lse
        return out, lse
    return out


def _xla_reference(q, k, v, key_bias):
    """(BH, L, D) einsum attention, the numerics oracle for tests."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    logits = logits + key_bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, *rest, heads: int, scale: float,
                has_bias: bool):
    """Grid (B, kv_blocks, q_blocks); q innermost (sequential). Recomputes p
    from (q, k, bias, lse) per head and accumulates per-head dk/dv for one kv
    block across all q blocks in VMEM scratch."""
    if has_bias:
        bias_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref, *scratch = rest
    else:
        g_ref, lse_ref, delta_ref, dk_ref, dv_ref, *scratch = rest
    j = pl.program_id(2)
    num_q = pl.num_programs(2)
    dks, dvs = scratch[:heads], scratch[heads:]
    c = q_ref.shape[-1]
    d = c // heads

    @pl.when(j == 0)
    def _():
        for h in range(heads):
            dks[h][:] = jnp.zeros_like(dks[h])
            dvs[h][:] = jnp.zeros_like(dvs[h])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    dtype = q.dtype
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        logits = jax.lax.dot_general(
            qh * dtype.type(scale * LOG2E), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bkv)
        if has_bias:
            logits = logits + bias_ref[0, 0][None, :]
        p = jnp.exp2(logits - lse_ref[0, h][:, None])
        # dv_h += p^T g_h
        dvs[h][:] = dvs[h][:] + jax.lax.dot_general(
            p.astype(dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = g_h v_h^T ; ds = p * (dp - delta)
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, h][:, None])
        # dk_h += ds^T q_h * scale
        dks[h][:] = dks[h][:] + jax.lax.dot_general(
            ds.astype(dtype), qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == num_q - 1)
    def _():
        dk_ref[0] = jnp.concatenate(
            [dks[h][:].astype(dk_ref.dtype) for h in range(heads)], axis=-1)
        dv_ref[0] = jnp.concatenate(
            [dvs[h][:].astype(dv_ref.dtype) for h in range(heads)], axis=-1)


def _dkv_kernel_t(q_ref, k_ref, v_ref, *rest, heads: int, scale: float,
                  has_bias: bool):
    """d-major-output variant of ``_dkv_kernel`` (r5): p/ds stay in the
    straight (bq, bkv) orientation (their QK/GV contractions are already
    lane-complete), but the dk/dv accumulations emit (d, bkv) — full output
    lanes instead of 41-of-128 — via lhs = per-head transposed g/q slices
    (a tiny (bq, d) -> (d, bq) shuffle per head per step; the big (bq, bkv)
    matrices are never transposed). Accumulators transpose back once per kv
    block at the end. Same I/O contract as ``_dkv_kernel``."""
    if has_bias:
        bias_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref, *scratch = rest
    else:
        g_ref, lse_ref, delta_ref, dk_ref, dv_ref, *scratch = rest
    j = pl.program_id(2)
    num_q = pl.num_programs(2)
    dks, dvs = scratch[:heads], scratch[heads:]
    c = q_ref.shape[-1]
    d = c // heads

    @pl.when(j == 0)
    def _():
        for h in range(heads):
            dks[h][:] = jnp.zeros_like(dks[h])
            dvs[h][:] = jnp.zeros_like(dvs[h])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    dtype = q.dtype
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        logits = jax.lax.dot_general(
            qh * dtype.type(scale * LOG2E), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bkv)
        if has_bias:
            logits = logits + bias_ref[0, 0][None, :]
        p = jnp.exp2(logits - lse_ref[0, h][:, None])
        # dv_t += g_h^T p : lhs (d, bq) x rhs (bq, bkv) -> (d, bkv)
        dvs[h][:] = dvs[h][:] + jax.lax.dot_general(
            gh.T, p.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, h][:, None])
        # dk_t += q_h^T ds * scale : (d, bq) x (bq, bkv) -> (d, bkv)
        dks[h][:] = dks[h][:] + jax.lax.dot_general(
            qh.T, ds.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == num_q - 1)
    def _():
        dk_ref[0] = jnp.concatenate(
            [dks[h][:].T.astype(dk_ref.dtype) for h in range(heads)], axis=-1)
        dv_ref[0] = jnp.concatenate(
            [dvs[h][:].T.astype(dv_ref.dtype) for h in range(heads)], axis=-1)


def _dq_kernel_t(q_ref, k_ref, v_ref, *rest, heads: int, scale: float,
                 has_bias: bool):
    """Fully transposed ``_dq_kernel`` (r5): the whole per-head pipeline
    runs in the (bkv, bq) orientation — logits_t = k_h q_h^T, p_t/ds_t
    with the per-row lse/delta broadcasting over sublanes, and the dq
    accumulation k_h^T ds_t -> (d, bq) with full output lanes (the straight
    kernel emits (bq, d=41-of-128 lanes)). Per-head (bkv, d) -> (d, bkv)
    k-slice transposes are tiny; the big matrices stay put. Bias arrives as
    a (1, block_kv, 1) column (same form as the transposed forward)."""
    if has_bias:
        bias_ref, g_ref, lse_ref, delta_ref, dq_ref, *scratch = rest
    else:
        g_ref, lse_ref, delta_ref, dq_ref, *scratch = rest
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)
    dqs = scratch
    c = q_ref.shape[-1]
    d = c // heads

    @pl.when(j == 0)
    def _():
        for h in range(heads):
            dqs[h][:] = jnp.zeros_like(dqs[h])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    dtype = q.dtype
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        lt = jax.lax.dot_general(
            kh, (qh * dtype.type(scale * LOG2E)).T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bkv, bq)
        if has_bias:
            lt = lt + bias_ref[0]  # (bkv, 1) broadcasts over bq lanes
        p_t = jnp.exp2(lt - lse_ref[0, h][None, :])
        dp_t = jax.lax.dot_general(
            vh, gh.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bkv, bq)
        ds_t = p_t * (dp_t - delta_ref[0, h][None, :])
        # dq_t += k_h^T ds_t * scale : (d, bkv) x (bkv, bq) -> (d, bq)
        dqs[h][:] = dqs[h][:] + jax.lax.dot_general(
            kh.T, ds_t.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == num_kv - 1)
    def _():
        dq_ref[0] = jnp.concatenate(
            [dqs[h][:].T.astype(dq_ref.dtype) for h in range(heads)],
            axis=-1)


def _dq_kernel(q_ref, k_ref, v_ref, *rest, heads: int, scale: float,
               has_bias: bool):
    """Grid (B, q_blocks, kv_blocks); kv innermost (sequential)."""
    if has_bias:
        bias_ref, g_ref, lse_ref, delta_ref, dq_ref, *scratch = rest
    else:
        g_ref, lse_ref, delta_ref, dq_ref, *scratch = rest
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)
    dqs = scratch
    c = q_ref.shape[-1]
    d = c // heads

    @pl.when(j == 0)
    def _():
        for h in range(heads):
            dqs[h][:] = jnp.zeros_like(dqs[h])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    dtype = q.dtype
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        logits = jax.lax.dot_general(
            qh * dtype.type(scale * LOG2E), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bias:
            logits = logits + bias_ref[0, 0][None, :]
        p = jnp.exp2(logits - lse_ref[0, h][:, None])
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, h][:, None])
        dqs[h][:] = dqs[h][:] + jax.lax.dot_general(
            ds.astype(dtype), kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == num_kv - 1)
    def _():
        dq_ref[0] = jnp.concatenate(
            [dqs[h][:].astype(dq_ref.dtype) for h in range(heads)], axis=-1)


def _flash_bwd_kernel(q, k, v, key_bias, out, lse, g, heads, *, block_q: int,
                      block_kv: int):
    """Fused Pallas backward over packed tensors: (dq, dk, dv) via the
    FlashAttention-2 split — one kernel accumulating dk/dv per kv block, one
    accumulating dq per q block; peak memory O(block_q * block_kv),
    everything recomputed from the fp32 per-(head, row) log-sum-exp."""
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads
    scale = d ** -0.5

    lq_pad = _ceil_to(lq, block_q)
    lk_pad = _ceil_to(lk, block_kv)

    # per-head delta = rowsum(g * out), (B, heads, Lq)
    delta = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(b, lq, heads, d), axis=-1).transpose(0, 2, 1)

    if lq_pad != lq:
        pad = ((0, 0), (0, lq_pad - lq), (0, 0))
        q = jnp.pad(q, pad)
        g = jnp.pad(g, pad)
        # padded q rows: finite lse keeps exp2() well-defined; their g rows
        # are zero so they contribute nothing to dk/dv, and their dq is
        # sliced off
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, lq_pad - lq)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq)))
    if key_bias is None and lk_pad != lk:
        key_bias = jnp.zeros((b, lk), jnp.float32)
    if lk_pad != lk:
        pad = ((0, 0), (0, lk_pad - lk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_bias = jnp.pad(key_bias, ((0, 0), (0, lk_pad - lk)),
                           constant_values=NEG_INF)
    has_bias = key_bias is not None
    bias_in = ([(key_bias * LOG2E).astype(jnp.float32)[:, None, :]]
               if has_bias else [])
    # d-major-output backward (r5): full output lanes in the dk/dv/dq
    # accumulations (the straight kernels emit d=41-of-128 lanes). Same
    # gate as the transposed forward; HVT_FLASH_BWD_LAYOUT=q reverts.
    use_t = d <= 128 and _BWD_LAYOUT != "q"

    kv_specs = dict(
        q=pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, j, 0)),
        k=pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, i, 0)),
        bias=pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, i)),
        row=pl.BlockSpec((1, heads, block_q), lambda b, i, j: (b, 0, j)),
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_t if use_t else _dkv_kernel,
                          heads=heads, scale=scale, has_bias=has_bias),
        grid=(b, lk_pad // block_kv, lq_pad // block_q),
        in_specs=[
            kv_specs["q"], kv_specs["k"], kv_specs["k"],
            *([kv_specs["bias"]] if has_bias else []),
            kv_specs["q"], kv_specs["row"], kv_specs["row"],
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, lk_pad, c), v.dtype),
        ],
        scratch_shapes=(
            [pltpu.VMEM((d, block_kv), jnp.float32)] * (2 * heads)
            if use_t else
            [pltpu.VMEM((block_kv, d), jnp.float32)] * (2 * heads)),
        compiler_params=_compiler_params(),
    )(q, k, v, *bias_in, g, lse, delta)

    q_specs = dict(
        q=pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
        k=pl.BlockSpec((1, block_kv, c), lambda b, i, j: (b, j, 0)),
        bias=pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)),
        bias_t=pl.BlockSpec((1, block_kv, 1), lambda b, i, j: (b, j, 0)),
        row=pl.BlockSpec((1, heads, block_q), lambda b, i, j: (b, 0, i)),
    )
    dq_bias_in = bias_in
    dq_bias_spec = q_specs["bias"]
    if use_t and has_bias:
        # the transposed dq kernel consumes the bias as a (bkv, 1) column
        dq_bias_in = [(key_bias * LOG2E).astype(jnp.float32)[:, :, None]]
        dq_bias_spec = q_specs["bias_t"]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_t if use_t else _dq_kernel,
                          heads=heads, scale=scale, has_bias=has_bias),
        grid=(b, lq_pad // block_q, lk_pad // block_kv),
        in_specs=[
            q_specs["q"], q_specs["k"], q_specs["k"],
            *([dq_bias_spec] if has_bias else []),
            q_specs["q"], q_specs["row"], q_specs["row"],
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, c), q.dtype),
        scratch_shapes=(
            [pltpu.VMEM((d, block_q), jnp.float32)] * heads if use_t else
            [pltpu.VMEM((block_q, d), jnp.float32)] * heads),
        compiler_params=_compiler_params(),
    )(q, k, v, *dq_bias_in, g, lse, delta)

    dq = dq[:, :lq] if lq_pad != lq else dq
    dk = dk[:, :lk] if lk_pad != lk else dk
    dv = dv[:, :lk] if lk_pad != lk else dv
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, key_bias, heads, block_q, block_kv):
    return _flash_fwd(q, k, v, key_bias, heads, block_q=block_q,
                      block_kv=block_kv)


def _flash_vjp_fwd(q, k, v, key_bias, heads, block_q, block_kv):
    out, lse = _flash_fwd(q, k, v, key_bias, heads, block_q=block_q,
                          block_kv=block_kv, with_lse=True)
    return out, (q, k, v, key_bias, out, lse)


def _flash_vjp_bwd(heads, block_q, block_kv, res, g):
    q, k, v, key_bias, out, lse = res
    if _BWD_MODE == "kernel":
        # The backward kernels hold several fp32 (block_q, block_kv)
        # intermediates per head per step; the forward's tuned (1024, 2048)
        # blocks would overrun scoped VMEM. The backward blocks are tuned
        # independently of the forward (HVT_FLASH_BWD_BQ/BKV; r4 sweep at the
        # stage-2 training shape — tools/microbench.py flash_bwd).
        dq, dk, dv = _flash_bwd_kernel(
            q, k, v, key_bias, out, lse, g, heads,
            block_q=min(block_q, _BWD_BLOCK_Q),
            block_kv=min(block_kv, _BWD_BLOCK_KV))
        return dq, dk, dv, None
    return _flash_vjp_bwd_chunked(heads, (q, k, v, key_bias), g)


def _flash_vjp_bwd_chunked(heads, res, g):
    """Recompute-based backward, scanned over q chunks so peak memory is
    O(B * heads * chunk * Lk) instead of the full O(B * heads * Lq * Lk)
    logits tensor (at 512x896 training shapes the full logits would be tens
    of GB). Debug/fallback path: splits heads in XLA."""
    q, k, v, key_bias = res
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads
    scale = d ** -0.5
    chunk = min(512, lq)
    pad = (-lq) % chunk

    def split(t):
        ln = t.shape[1]
        return (t.reshape(b, ln, heads, d).transpose(0, 2, 1, 3)
                .reshape(b * heads, ln, d))

    qs, gs = split(q), split(g)
    qp = jnp.pad(qs, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    gp = jnp.pad(gs, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    n = qp.shape[1] // chunk
    q_chunks = qp.reshape(b * heads, n, chunk, d).transpose(1, 0, 2, 3)
    g_chunks = gp.reshape(b * heads, n, chunk, d).transpose(1, 0, 2, 3)
    kf = split(k).astype(jnp.float32)
    vf = split(v).astype(jnp.float32)
    bias = (0.0 if key_bias is None else
            jnp.repeat(key_bias, heads, axis=0)[:, None, :].astype(jnp.float32))
    # padded q rows see plain softmax over real keys — their grads are
    # multiplied by zero g anyway.

    def step(carry, qg):
        dk_acc, dv_acc = carry
        qc, gc = qg  # (b*heads, chunk, d)
        logits = jnp.einsum("bqd,bkd->bqk", qc * scale, kf) + bias
        p = jax.nn.softmax(logits, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bqk,bqd->bkd", p, gc)
        dp = jnp.einsum("bqd,bkd->bqk", gc, vf)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq_c = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bqk,bqd->bkd", ds, qc) * scale
        return (dk_acc, dv_acc), dq_c

    zeros = jnp.zeros((b * heads, lk, d), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(step, (zeros, zeros), (q_chunks, g_chunks))
    dq = dq_chunks.transpose(1, 0, 2, 3).reshape(b * heads, n * chunk, d)[:, :lq]

    def merge(t, ln):
        return (t.reshape(b, heads, ln, d).transpose(0, 2, 1, 3)
                .reshape(b, ln, c))

    return (merge(dq, lq).astype(q.dtype), merge(dk, lk).astype(k.dtype),
            merge(dv, lk).astype(v.dtype), None)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention_packed(
    q: jnp.ndarray,  # (B, Lq, C) — heads packed in the channel axis
    k: jnp.ndarray,  # (B, Lk, C)
    v: jnp.ndarray,  # (B, Lk, C)
    heads: int,
    key_bias: Optional[jnp.ndarray] = None,  # (B, Lk) additive, fp32
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head attention without ever materializing a head-split layout."""
    b, lq, c = q.shape
    lk = k.shape[1]
    assert c % heads == 0, (c, heads)
    # key_bias=None stays None end to end: the kernels compile a biasless
    # variant that skips the per-head (bq, bkv) VPU broadcast-add.
    if key_bias is not None:
        key_bias = key_bias.astype(jnp.float32)
    bq = min(block_q or _DEFAULT_BLOCK_Q, _ceil_to(lq, 128))
    bkv = min(block_kv or _DEFAULT_BLOCK_KV, _ceil_to(lk, 128))
    return _flash(q, k, v, key_bias, heads, bq, bkv)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jnp.ndarray:
    """(B, H, L, D) adapter over the packed kernel; bias (B, 1, Lq, Lk) must
    be q-independent (broadcast over queries) — reduced to a per-key bias.

    Production code should prefer ``flash_attention_packed`` — this adapter
    reintroduces the head merge/split relayout at its boundary.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if bias is None:
        key_bias = None
    else:
        # accept (B, 1, 1, Lk) or (B, 1, Lq, Lk) with q-independent rows
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(b, t.shape[2], h * d)

    out = flash_attention_packed(pack(q), pack(k), pack(v), h, key_bias,
                                 block_q, block_kv)
    return out.reshape(b, lq, h, d).transpose(0, 2, 1, 3)
