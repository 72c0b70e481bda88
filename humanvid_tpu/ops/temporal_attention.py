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

This kernel instead runs attention **in the spatial layout** ``(b, f, l, c)``
(the UNet's native ``(b f) h w c`` flattened), so no rearrange is needed at
all: the grid tiles ``(b, l)``; each step holds the full frame axis and all
heads of a spatial tile in VMEM and does QK^T -> softmax -> PV per head with
zero HBM round-trips.  HBM traffic drops to one read of q/k/v and one write
of out.

Because the whole key axis (f) is resident per step, the backward pass needs
no online-softmax log-sum-exp residual: a single kernel recomputes the
softmax per tile and emits (dq, dk, dv) in one pass (custom VJP below), so
training stores only q/k/v — this removes the fp32 padded-logits activations
that blew the stage-2 single-chip memory budget (PERF.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634

# Spatial-tile width: sized so one (f=24, BL, c<=768-lane) bf16 buffer stays
# ~2 MB (3 double-buffered inputs + output fit VMEM). Env-overridable.
_DEFAULT_BLOCK_L = int(os.environ.get("HVT_TEMPORAL_BL", "64"))


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attend_head(qh, kh, vh, scale):
    """qh/kh/vh: (BL, f, d) -> out (BL, f, d); all math VMEM-resident.

    The batched dots put the spatial tile (BL) in the MXU batch dimension
    (Mosaic requires batch dims at position 0); logits are (BL, f, f) fp32
    and never leave VMEM.
    """
    dtype = qh.dtype
    logits = jax.lax.dot_general(
        qh * dtype.type(scale * LOG2E), kh,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BL, f_q, f_k), log2 domain
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(dtype), vh,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BL, f_q, d)
    return out.astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    """Blocks (1, f, BL, C); one in-VMEM transpose to the batch-leading
    (BL, f, C) layout, then a python-unrolled loop over head lane-slices."""
    q = q_ref[0].transpose(1, 0, 2)  # (BL, f, C)
    k = k_ref[0].transpose(1, 0, 2)
    v = v_ref[0].transpose(1, 0, 2)
    d = q.shape[-1] // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        outs.append(_attend_head(q[:, :, sl], k[:, :, sl], v[:, :, sl], scale))
    o_ref[0] = jnp.concatenate(outs, axis=-1).transpose(1, 0, 2)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, heads: int, scale: float):
    """One-pass backward: recompute softmax per tile (full f axis resident),
    emit dq/dk/dv. No residuals beyond q/k/v."""
    q = q_ref[0].transpose(1, 0, 2)  # (BL, f, C)
    k = k_ref[0].transpose(1, 0, 2)
    v = v_ref[0].transpose(1, 0, 2)
    g = g_ref[0].transpose(1, 0, 2)
    dtype = q.dtype
    d = q.shape[-1] // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, gh = q[:, :, sl], k[:, :, sl], v[:, :, sl], g[:, :, sl]
        logits = jax.lax.dot_general(
            qh * dtype.type(scale * LOG2E), kh,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BL, f_q, f_k)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        # dv[f_k] = sum_{f_q} p^T g
        dv = jax.lax.dot_general(
            p.astype(dtype), gh,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BL, f_k, d)
        # dp[f_q, f_k] = g . v
        dp = jax.lax.dot_general(
            gh, vh,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BL, f_q, f_k)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(dtype)  # (BL, f_q, f_k)
        dq = jax.lax.dot_general(
            ds, kh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BL, f_q, d)
        dk = jax.lax.dot_general(
            ds, qh,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BL, f_k, d)
        dqs.append((dq * scale).astype(dtype))
        dks.append((dk * scale).astype(dtype))
        dvs.append(dv.astype(dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).transpose(1, 0, 2)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).transpose(1, 0, 2)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).transpose(1, 0, 2)


def _block_l(f: int, l: int, c: int, itemsize: int) -> int:
    """Spatial-tile width targeting ~1 MB per streamed (f, BL, C) buffer:
    3 double-buffered inputs + output + the batch-leading transposed copies
    must fit the 16 MB VMEM scope (verified on v5e: 64 x 24 x 320 x f32
    blocks OOM at 18 MB; bf16 fits)."""
    per_row = f * c * itemsize
    bl = min(_DEFAULT_BLOCK_L, max(16, (1 << 20) // per_row // 16 * 16))
    return min(bl, _ceil_to(l, 16))


def _pad_l(x, bl):
    l = x.shape[2]
    pad = (-l) % bl
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _specs(bl, f, c):
    return pl.BlockSpec((1, f, bl, c), lambda b, i: (b, 0, i, 0))


# The in-kernel working set exceeds XLA's default 16 MB scoped-vmem budget:
# the python-unrolled head loop keeps each head's 128-lane-padded fp32 logits
# and outputs alive until the final concatenate (measured 28.4 MB at
# bl=64, c=320, 8 heads on v5e).  v5e VMEM is far larger than the default
# scope; raise the limit rather than shrink the tile (smaller tiles hurt DMA
# efficiency on the streamed (f, BL, C) buffers).
_VMEM_LIMIT = int(os.environ.get("HVT_TEMPORAL_VMEM", str(64 * 1024 * 1024)))


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
    bl = _block_l(q.shape[1], q.shape[2], q.shape[3], q.dtype.itemsize)
    l = q.shape[2]
    out = _call_fwd(_pad_l(q, bl), _pad_l(k, bl), _pad_l(v, bl), heads, bl)
    return out[:, :, :l]


def _temporal_fwd(q, k, v, heads):
    return _temporal(q, k, v, heads), (q, k, v)


def _temporal_bwd(heads, res, g):
    q, k, v = res
    bl = _block_l(q.shape[1], q.shape[2], q.shape[3], q.dtype.itemsize)
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
