"""Pallas TPU flash attention (forward) with per-key additive bias.

Purpose-built for the CamAnimate attention flavors (SURVEY §2.10: replaces the
reference's xformers CUDA kernels, ``train_stage_1.py:384-391``):

- spatial self-attention with concatenated reference KV (Lk = 2*Lq, up to ~14k
  keys at 512x896 — the full logits tensor would not fit HBM, so an online-
  softmax kernel is required, not just faster);
- CFG "uncond rows ignore the reference keys" expressed as a per-(batch,key)
  additive bias (0 or -inf), broadcast over heads and query positions — the
  bias is O(B*Lk), never O(Lq*Lk);
- SD1.5 head dims (40/80/160) padded to the 128-lane tile inside the wrapper.

Backward runs as recompute + XLA einsum attention under ``jax.custom_vjp``
(correct everywhere; kernel-level bwd is a later optimization), so training
can use the kernel too.

Kernel structure: grid over (batch*heads, q blocks); online softmax over kv
blocks with running max/sum and output accumulator in VMEM scratch.
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
#   (fetch-free) timing: (1024, 2048) = 42.1 TF/s = 69% of the d=40
#   architectural ceiling, vs 37.3 at (512, 1024) and 39.9 for the full-Lk
#   single-shot configuration (bq=256, bkv=12288).
#   HVT_FLASH_BWD — "kernel" (fused Pallas backward) or "chunked" (recompute
#   + scanned XLA einsum fallback).
#   HVT_FLASH_VMEM — scoped-vmem budget for the kernels; the default 32 MB
#   (over XLA's 16 MB default scope) admits large-kv blocks, e.g. the
#   full-Lk "single-shot softmax" configuration (bkv=Lk: one kv step, no
#   online rescale) at the level-0 shape.
_DEFAULT_BLOCK_Q = int(os.environ.get("HVT_FLASH_BQ", "1024"))
_DEFAULT_BLOCK_KV = int(os.environ.get("HVT_FLASH_BKV", "2048"))
_BWD_MODE = os.environ.get("HVT_FLASH_BWD", "kernel")
_VMEM_LIMIT = int(os.environ.get("HVT_FLASH_VMEM", str(32 * 1024 * 1024)))

NEG_INF = -1e9
# Softmax runs in the log2 domain: the TPU's transcendental unit evaluates
# exp2 natively, so log2(e) is folded into the Q scale / bias once and every
# exp in the inner loop becomes an exp2. The saved log-sum-exp is therefore
# in LOG2 units; the backward kernels exp2 with it symmetrically.
LOG2E = 1.4426950408889634


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref):
    """Grid (bh, q_blocks, kv_blocks); kv is the innermost (sequential) dim.

    Blocks: q (1, block_q, d+1), k (1, block_kv, d+1), v (1, block_kv, d).
    The softmax scale, the log2(e) domain factor AND the per-key additive
    bias are pre-folded into the operands by the wrapper (q carries a ones
    column, k carries bias*log2(e) in that column), so the MXU contraction
    itself produces finished log2-domain logits and the VPU does no per-logit
    scale/bias work at all — at d=40 the VPU softmax passes are on par with
    the MXU time, so every eliminated elementwise pass is ~a tenth of the
    kernel.

    Online-softmax state (acc, m, l) lives in VMEM scratch and persists across
    the kv iterations of one (bh, q_block); only one KV block is resident at a
    time, so VMEM stays bounded for any Lk and head dim. The per-row
    log-sum-exp is emitted for the backward kernels.
    """
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # MXU: keep operands in their storage dtype (bf16 runs at full systolic
    # rate; upcasting first would force the ~4x slower fp32 path) and
    # accumulate in fp32 via preferred_element_type.
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_kv) fp32, log2 domain, bias included

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(logits - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[:] + jnp.log2(l_ref[:]))[:, 0]  # log2 units


def _flash_fwd(q, k, v, key_bias, *, block_q: int, block_kv: int,
               with_lse: bool = False):
    """q: (BH, Lq, D) k/v: (BH, Lk, D) key_bias: (BH, Lk) -> (BH, Lq, D).

    Only the sequence axes are padded to block multiples (often a no-op for
    the SD latent shapes). The head dim stays LOGICAL — a block's last dim may
    equal the full array dim, and Mosaic pads the lanes in VMEM — so no 3x
    HBM copies of q/k/v for d=40/80 heads (a multi-GB transient per attention
    layer inside the denoise scan at batch 48).

    ``with_lse=True`` also returns the per-row log-sum-exp (BH, Lq) fp32
    (the residual the backward kernels need).
    """
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5

    lq_pad = _ceil_to(lq, block_q)
    lk_pad = _ceil_to(lk, block_kv)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, 0), (0, lk_pad - lk)),
                           constant_values=NEG_INF)
    # Fold scale, log2(e) and the per-key bias into the contraction itself:
    # q' = [q * scale * log2e | 1], k' = [k | bias * log2e], so
    # q'.k' = logits_log2 + bias_log2 straight off the MXU (the d+1 lane is
    # free — Mosaic pads lanes to 128 in VMEM either way). One extra 1/40th
    # column of q/k HBM traffic buys removal of the per-logit scale multiply
    # and bias broadcast-add VPU passes (each pass is O(bh*lq*lk) elements).
    # The bias lands in the kernel in q.dtype; the only biases this wrapper
    # ever receives are 0 / NEG_INF (the CFG reference-KV disable), both
    # exactly representable in bf16.
    qs = (q * q.dtype.type(scale * LOG2E)).astype(q.dtype)
    q_in = jnp.concatenate(
        [qs, jnp.ones((bh, lq_pad, 1), q.dtype)], axis=-1)
    k_in = jnp.concatenate(
        [k, (key_bias[:, :, None] * LOG2E).astype(k.dtype)], axis=-1)

    grid = (bh, lq_pad // block_q, lk_pad // block_kv)
    out, lse = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d + 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d + 1), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q_in, k_in, v)
    out = out[:, :lq] if lq_pad != lq else out
    if with_lse:
        lse = lse[:, 0, :lq] if lq_pad != lq else lse[:, 0]
        return out, lse
    return out


def _xla_reference(q, k, v, key_bias):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    logits = logits + key_bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """Grid (bh, kv_blocks, q_blocks); q innermost (sequential).

    Recomputes p from (q, k, bias, lse) — no O(Lq*Lk) residual — and
    accumulates dk/dv for one kv block across all q blocks in VMEM scratch.
    """
    j = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # (block_q, d)
    logits = jax.lax.dot_general(
        q * q_ref.dtype.type(scale * LOG2E), k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_kv), log2 domain
    logits = logits + bias_ref[0, 0].astype(jnp.float32)[None, :] * LOG2E
    p = jnp.exp2(logits - lse_ref[0, 0][:, None])  # (block_q, block_kv)

    g = g_ref[0]  # (block_q, d)
    # dv += p^T g
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = g v^T ; ds = p * (dp - delta)
    dp = jax.lax.dot_general(
        g, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0, 0][:, None])  # fp32 (block_q, block_kv)
    # dk += ds^T q * scale
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(j == num_q - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, lse_ref, delta_ref,
               dq_ref, dq_acc, *, scale: float):
    """Grid (bh, q_blocks, kv_blocks); kv innermost (sequential)."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    logits = jax.lax.dot_general(
        q * q_ref.dtype.type(scale * LOG2E), k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias_ref[0, 0].astype(jnp.float32)[None, :] * LOG2E
    p = jnp.exp2(logits - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        g_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None])
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(j == num_kv - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_kernel(q, k, v, key_bias, out, lse, g, *, block_q: int,
                      block_kv: int):
    """Fused Pallas backward: (dq, dk, dv) via the FlashAttention-2 split —
    one kernel accumulating dk/dv per kv block, one accumulating dq per q
    block; peak memory O(block_q * block_kv), everything recomputed from the
    fp32 per-row log-sum-exp saved by the forward."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5

    lq_pad = _ceil_to(lq, block_q)
    lk_pad = _ceil_to(lk, block_kv)
    if lq_pad != lq:
        pad = ((0, 0), (0, lq_pad - lq), (0, 0))
        q = jnp.pad(q, pad)
        g = jnp.pad(g, pad)
        out = jnp.pad(out, pad)
        # padded q rows: finite lse keeps exp() well-defined; their g rows are
        # zero so they contribute nothing to dk/dv, and their dq is sliced off
        lse = jnp.pad(lse, ((0, 0), (0, lq_pad - lq)))
    if lk_pad != lk:
        pad = ((0, 0), (0, lk_pad - lk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_bias = jnp.pad(key_bias, ((0, 0), (0, lk_pad - lk)),
                           constant_values=NEG_INF)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    bias3 = key_bias[:, None, :]
    lse3 = lse[:, None, :]
    delta3 = delta[:, None, :]

    kv_specs = dict(
        q=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0)),
        k=pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, i, 0)),
        bias=pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, i)),
        row=pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, j)),
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(bh, lk_pad // block_kv, lq_pad // block_q),
        in_specs=[
            kv_specs["q"], kv_specs["k"], kv_specs["k"], kv_specs["bias"],
            kv_specs["q"], kv_specs["row"], kv_specs["row"],
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v, bias3, g, lse3, delta3)

    q_specs = dict(
        q=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        k=pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
        bias=pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)),
        row=pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(bh, lq_pad // block_q, lk_pad // block_kv),
        in_specs=[
            q_specs["q"], q_specs["k"], q_specs["k"], q_specs["bias"],
            q_specs["q"], q_specs["row"], q_specs["row"],
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v, bias3, g, lse3, delta3)

    dq = dq[:, :lq] if lq_pad != lq else dq
    dk = dk[:, :lk] if lk_pad != lk else dk
    dv = dv[:, :lk] if lk_pad != lk else dv
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, key_bias, block_q, block_kv):
    return _flash_fwd(q, k, v, key_bias, block_q=block_q, block_kv=block_kv)


def _flash_vjp_fwd(q, k, v, key_bias, block_q, block_kv):
    out, lse = _flash_fwd(q, k, v, key_bias, block_q=block_q,
                          block_kv=block_kv, with_lse=True)
    return out, (q, k, v, key_bias, out, lse)


def _flash_vjp_bwd(block_q, block_kv, res, g):
    q, k, v, key_bias, out, lse = res
    if _BWD_MODE == "kernel":
        # The backward kernels hold several fp32 (block_q, block_kv)
        # intermediates per step; the forward's tuned (1024, 2048) blocks
        # would put >24 MB of them in scoped VMEM. Keep the backward at its
        # proven (512, 1024) independent of the forward tuning.
        dq, dk, dv = _flash_bwd_kernel(
            q, k, v, key_bias, out, lse, g,
            block_q=min(block_q, 512), block_kv=min(block_kv, 1024))
        return dq, dk, dv, None
    return _flash_vjp_bwd_chunked(block_q, block_kv, (q, k, v, key_bias), g)


def _flash_vjp_bwd_chunked(block_q, block_kv, res, g):
    """Recompute-based backward, scanned over q chunks so peak memory is
    O(BH * block * Lk) instead of the full O(BH * Lq * Lk) logits tensor
    (at 512x896 training shapes the full logits would be tens of GB)."""
    q, k, v, key_bias = res
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    chunk = min(512, lq)
    pad = (-lq) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    gp = jnp.pad(g, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    n = qp.shape[1] // chunk
    q_chunks = qp.reshape(bh, n, chunk, d).transpose(1, 0, 2, 3)
    g_chunks = gp.reshape(bh, n, chunk, d).transpose(1, 0, 2, 3)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    bias = key_bias[:, None, :].astype(jnp.float32)  # (bh, 1, lk)
    # padded q rows see all -inf bias... keep them finite: their grads are
    # multiplied by zero g anyway, so plain softmax over real keys is fine.

    def step(carry, qg):
        dk_acc, dv_acc = carry
        qc, gc = qg  # (bh, chunk, d)
        logits = jnp.einsum("bqd,bkd->bqk", qc * scale, kf) + bias
        p = jax.nn.softmax(logits, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bqk,bqd->bkd", p, gc)
        dp = jnp.einsum("bqd,bkd->bqk", gc, vf)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq_c = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bqk,bqd->bkd", ds, qc) * scale
        return (dk_acc, dv_acc), dq_c

    zeros = jnp.zeros((bh, lk, d), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(step, (zeros, zeros), (q_chunks, g_chunks))
    dq = dq_chunks.transpose(1, 0, 2, 3).reshape(bh, n * chunk, d)[:, :lq]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jnp.ndarray:
    """(B, H, L, D) attention; bias (B, 1, Lq, Lk) must be q-independent
    (broadcast over queries) — reduced internally to a per-key bias."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if bias is None:
        key_bias = jnp.zeros((b, lk), jnp.float32)
    else:
        # accept (B, 1, 1, Lk) or (B, 1, Lq, Lk) with q-independent rows
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)
    key_bias = jnp.repeat(key_bias, h, axis=0) if h > 1 else key_bias
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    bq = min(block_q or _DEFAULT_BLOCK_Q, _ceil_to(lq, 128))
    bkv = min(block_kv or _DEFAULT_BLOCK_KV, _ceil_to(lk, 128))
    out = _flash(qf, kf, vf, key_bias, bq, bkv)
    return out.reshape(b, h, lq, d)
