"""Pallas TPU kernel for tiny-sequence temporal (frame-axis) attention.

The AnimateDiff motion modules (reference ``src/models/motion_module.py:280-387``)
and CameraCtrl temporal blocks attend over the frame axis: tokens
``((b h w), f, c)`` with f <= 32.  The XLA path for this shape is
memory-bound, not compute-bound:

- the ``(b f) l c <-> (b l) f c`` rearranges round-trip the full activation
  through HBM twice per module;
- the fp32 ``(b*l, heads, f, f)`` logits pad 5.3x on the 128-lane tile
  (f=24 -> 128) and are materialized to HBM between the QK matmul, softmax
  and the PV matmul (~2.4 GB of traffic per level-0 attention call);
- the head split/merge transposes relayout q/k/v/out four more times.

This kernel runs attention **in the spatial layout** ``(b, f, l, c)`` (the
UNet's native ``(b f) h w c`` flattened), so no rearrange is needed at all.

Formulation — masked-dense tiles.  Per-spatial-position attention is a batch
of tiny (f x d) @ (d x f) matmuls; lowering that batch directly (one MXU op
per position) is latency-bound, not MXU-bound (measured 40 ms/call at every
UNet level, ~9 GB/s effective — worse than the XLA path it replaces).
Instead, each grid step takes a spatial tile of BL positions and flattens
``(f, BL, d) -> (f*BL, d)`` — a free relayout, since (f, BL) are the leading
contiguous axes — then computes ONE dense ``(f*BL, d) @ (d, f*BL)`` logits
matmul per head.  Cross-position products are invalid; they are masked with
an iota-generated block mask (row % BL == col % BL keeps exactly the
same-position pairs) before the in-VMEM softmax, and the PV product
``(f*BL, f*BL) @ (f*BL, d)`` is then exact: zeroed cross terms contribute
nothing.  The wasted MXU flops (factor BL) are cheap — the whole op is a few
GFLOP — and in exchange every matmul has MXU-friendly M/N >= 384 and the
(BL, f, f) logits never leave VMEM.  At f=24, BL=16 the dense side is
f*BL = 384 = exactly 3 lane tiles: zero lane padding (vs 5.3x on the XLA
path).

Because the whole key axis (f) is resident per step, the backward pass needs
no online-softmax log-sum-exp residual: a single kernel recomputes the
masked softmax per tile and emits (dq, dk, dv) in one pass (custom VJP
below), so training stores only q/k/v — this removes the fp32 padded-logits
activations that blew the stage-2 single-chip memory budget (PERF.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LOG2E, NEG_INF, ceil_to as _ceil_to  # noqa: F401

# Spatial-tile width. f*BL is the dense matmul M/N dim; BL also multiplies
# the wasted (cross-position) flops, so moderate tiles win: BL=16 -> M=384
# at f=24. Env-overridable for sweeps.
_DEFAULT_BLOCK_L = int(os.environ.get("HVT_TEMPORAL_BL", "16"))

# Scoped-VMEM budget for the kernel (the default 16 MB scope is tight for
# the backward's per-head fp32 (f*BL, f*BL) intermediates at larger BL).
_VMEM_LIMIT = int(os.environ.get("HVT_TEMPORAL_VMEM", str(64 * 1024 * 1024)))


def _block_mask(n: int, bl: int) -> jnp.ndarray:
    """(n, n) fp32 additive mask: 0 where row/col are the same spatial
    position (row % bl == col % bl), NEG_INF elsewhere. Rows are ordered
    (frame, position) — the free flattening of a (f, BL, d) tile."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where((r % bl) == (c % bl), 0.0, NEG_INF).astype(jnp.float32)


def _masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Row softmax of (masked) log2-domain logits; invalid entries -> 0."""
    logits = logits + mask
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m)
    return p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    """Blocks (1, f, BL, C); flatten to (f*BL, C), one dense masked
    attention per head over lane-slices of width d = C // heads."""
    f, bl, c = q_ref.shape[1:]
    n = f * bl
    q = q_ref[0].reshape(n, c)
    k = k_ref[0].reshape(n, c)
    v = v_ref[0].reshape(n, c)
    dtype = q.dtype
    d = c // heads
    mask = _block_mask(n, bl)

    def qk(h):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl] * dtype.type(scale * LOG2E)
        return jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (n, n), log2 domain

    # Software-pipelined head loop (same rationale as the flash kernel):
    # head h+1's QK contraction is issued before head h's softmax so the
    # MXU and VPU streams overlap.
    outs = []
    logits = qk(0)
    for h in range(heads):
        nxt = qk(h + 1) if h + 1 < heads else None
        sl = slice(h * d, (h + 1) * d)
        p = _masked_softmax(logits, mask)
        outs.append(jax.lax.dot_general(
            p.astype(dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype))
        logits = nxt
    o_ref[0] = jnp.concatenate(outs, axis=-1).reshape(f, bl, c)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, heads: int, scale: float):
    """One-pass backward: recompute the masked softmax per tile (full f axis
    resident), emit dq/dk/dv. No residuals beyond q/k/v. Off-block entries
    of p are exactly 0, so every dense product below is exact."""
    f, bl, c = q_ref.shape[1:]
    n = f * bl
    q = q_ref[0].reshape(n, c)
    k = k_ref[0].reshape(n, c)
    v = v_ref[0].reshape(n, c)
    g = g_ref[0].reshape(n, c)
    dtype = q.dtype
    d = c // heads
    mask = _block_mask(n, bl)
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        logits = jax.lax.dot_general(
            qh * dtype.type(scale * LOG2E), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = _masked_softmax(logits, mask)

        # dv = p^T g
        dv = jax.lax.dot_general(
            p.astype(dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp = g v^T (off-block garbage is killed by the p factor below)
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqs.append((dq * scale).astype(dtype))
        dks.append((dk * scale).astype(dtype))
        dvs.append(dv.astype(dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).reshape(f, bl, c)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).reshape(f, bl, c)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).reshape(f, bl, c)


def _block_l(l: int) -> int:
    """Spatial-tile width: the configured default, shrunk to cover small l
    without excess padding (l is padded up to a multiple of the tile)."""
    bl = _DEFAULT_BLOCK_L
    while bl > 8 and bl // 2 >= l:
        bl //= 2
    return bl


def _pad_l(x, bl):
    l = x.shape[2]
    pad = (-l) % bl
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _specs(bl, f, c):
    return pl.BlockSpec((1, f, bl, c), lambda b, i: (b, 0, i, 0))


def _call_fwd(q, k, v, heads, bl):
    b, f, lp, c = q.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=(c // heads) ** -0.5),
        grid=(b, lp // bl),
        in_specs=[_specs(bl, f, c)] * 3,
        out_specs=_specs(bl, f, c),
        out_shape=jax.ShapeDtypeStruct((b, f, lp, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v)


def _call_bwd(q, k, v, g, heads, bl):
    b, f, lp, c = q.shape
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=(c // heads) ** -0.5),
        grid=(b, lp // bl),
        in_specs=[_specs(bl, f, c)] * 4,
        out_specs=[_specs(bl, f, c)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, f, lp, c), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _temporal(q, k, v, heads):
    bl = _block_l(q.shape[2])
    l = q.shape[2]
    out = _call_fwd(_pad_l(q, bl), _pad_l(k, bl), _pad_l(v, bl), heads, bl)
    return out[:, :, :l]


def _temporal_fwd(q, k, v, heads):
    return _temporal(q, k, v, heads), (q, k, v)


def _temporal_bwd(heads, res, g):
    q, k, v = res
    bl = _block_l(q.shape[2])
    l = q.shape[2]
    dq, dk, dv = _call_bwd(
        _pad_l(q, bl), _pad_l(k, bl), _pad_l(v, bl), _pad_l(g, bl), heads, bl)
    return dq[:, :, :l], dk[:, :, :l], dv[:, :, :l]


_temporal.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_attention(
    q: jnp.ndarray,  # (b, f, l, inner) — heads packed in the channel axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
) -> jnp.ndarray:
    """Frame-axis multi-head attention in the spatial ``(b, f, l, c)`` layout.

    Equivalent to splitting the channel axis into ``heads``, attending over
    axis 1 (frames) independently per (b, l, head), and re-merging heads —
    i.e. the math of the reference's VersatileAttention
    (``motion_module.py:359-387``) without its layout round-trips.
    """
    assert q.ndim == 4 and q.shape == k.shape == v.shape, (q.shape, k.shape)
    assert q.shape[-1] % heads == 0, (q.shape, heads)
    return _temporal(q, k, v, heads)


def xla_temporal_attention(q, k, v, heads):
    """Reference XLA implementation (same signature) for parity tests."""
    b, f, l, c = q.shape
    d = c // heads
    qh = q.reshape(b, f, l, heads, d)
    kh = k.reshape(b, f, l, heads, d)
    vh = v.reshape(b, f, l, heads, d)
    logits = jnp.einsum("bilhd,bjlhd->blhij", qh, kh,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("blhij,bjlhd->bilhd", p, vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, f, l, c).astype(q.dtype)
