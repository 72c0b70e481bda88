"""Fused GroupNorm(+SiLU) for NHWC/NLC tensors.

Why: the r4 UNet-pass trace books 16% of device time to GroupNorm stats
fusions ("convert_reduce_fusion": fp32 convert + mean/var reduce + a fused
relayout COPY of the whole activation) and another 17% to the elementwise
normalize/SiLU chains; the VAE decode is ~90% these two buckets after the
mid-attention fix. XLA's decomposition costs ~4 full HBM passes per GN
(stats read, relayout write, normalize read, normalize write).

This implementation does the floor: ONE Pallas pass over x producing
per-channel sums/sumsq in fp32 (MXU-free VPU reduction, no relayout output),
a tiny XLA reduction to per-group statistics, then ONE fused XLA elementwise
pass ``y = act(x * a + b)`` where a/b fold mean/rstd/scale/bias — 3 passes
total, with the normalize pass left to XLA so it can further fuse into
consumers (residual adds, converts).

Gradients: ``jax.custom_vjp`` with a recompute backward through the
reference XLA formulation — training cost and numerics are unchanged from
``nn.GroupNorm``; the kernel accelerates forward-only paths (inference) and
the forward half of training steps.

**Status: measured NEGATIVE result (r4), not used in production.** With
every model GN routed through this kernel, the v5e end-to-end numbers got
WORSE: UNet CFG-half pass 0.584 -> 0.609 s, VAE decode 0.543 -> 0.769 s
(r4 traces). XLA's own decomposition fuses stats+normalize+SiLU+downstream
copies into tuple mega-fusions; the Pallas call is an optimization barrier
that splits them apart and re-materializes intermediates. Kept (with tests)
as a documented experiment — the same lesson class as the d-major matmul
probe: on this compiler, only replace XLA fusions when a trace proves the
fusion boundary is the problem (the VAE mid-attention WAS; GN is not).
Opt-in via ``HVT_FUSED_GN=1`` + wiring ``models.layers.FusedGroupNorm``.

Reference consumption sites: every SD GN-SiLU-conv chain
(``/root/reference/src/models/resnet.py:119-174``, diffusers VAE blocks).
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

_STATS_BLOCK_ROWS = 1024


def _stats_kernel(x_ref, out_ref, acc, *, rows: int, block_rows: int):
    """Accumulate per-channel [sum, sumsq] over row blocks of one sample."""
    rb = pl.program_id(1)
    nrb = pl.num_programs(1)

    @pl.when(rb == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    xf = x_ref[0].astype(jnp.float32)  # (BR, C)
    # mask the padded tail rows of the final block
    base = rb * block_rows
    valid = (base + jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)) < rows
    xf = jnp.where(valid, xf, 0.0)
    acc[0, :] += jnp.sum(xf, axis=0)
    acc[1, :] += jnp.sum(xf * xf, axis=0)

    @pl.when(rb == nrb - 1)
    def _():
        out_ref[0] = acc[...]


def _channel_sums(x2d: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """(N, R, C) -> (N, 2, C) fp32 [sum, sumsq] per channel, one HBM read."""
    n, r, c = x2d.shape
    br = min(_STATS_BLOCK_ROWS, r)
    nrb = -(-r // br)
    return pl.pallas_call(
        functools.partial(_stats_kernel, rows=r, block_rows=br),
        grid=(n, nrb),
        in_specs=[pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2d)


def _reference(x, scale, bias, groups: int, eps: float, act: Optional[str]):
    """Pure-XLA GroupNorm(+act): the numerics oracle and the backward path."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (groups, c // groups))
    red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
    mean = xf.mean(red, keepdims=True)
    var = ((xf - mean) ** 2).mean(red, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _two_stage(x, scale, bias, groups: int, eps: float, act: Optional[str]):
    """Pure-XLA GroupNorm(+act) with a lane-friendly stats order.

    ``_reference`` (= flax ``nn.GroupNorm``) reshapes channels to
    ``(groups, c//groups)`` and reduces rows and the 16-wide lane-minor
    channel fragment TOGETHER — XLA lowers that as a segmented cross-lane
    reduction that measured 22-82 GB/s on v5e (r5 traces: 55% of the VAE
    decode, 16% of the UNet pass). Here stats are reduced in two stages:
    per-CHANNEL sum/sumsq over the row axis first (full 128-lane vectors,
    sublane-direction reduce — the fast direction), then the tiny
    ``(N, C) -> (N, groups)`` combine. One pass over x for both moments
    (instead of mean then centered var), and the normalize stays inline so
    XLA still fuses it into neighbors. Numerics: fp32 stats, biased variance,
    identical to ``nn.GroupNorm`` up to one-pass-variance rounding
    (golden-tested in tests/test_ops.py).
    """
    c = x.shape[-1]
    n = x.shape[0]
    r = int(np.prod(x.shape[1:-1]))
    cg = c // groups
    xf = x.reshape(n, r, c).astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)            # (N, C): sublane-direction reduce
    s2 = jnp.sum(xf * xf, axis=1)       # fused into the same pass by XLA
    s1 = s1.reshape(n, groups, cg).sum(-1)
    s2 = s2.reshape(n, groups, cg).sum(-1)
    cnt = r * cg
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(rstd, cg, axis=-1) * scale.astype(jnp.float32)   # (N, C)
    b = (bias.astype(jnp.float32)
         - jnp.repeat(mean * rstd, cg, axis=-1) * scale.astype(jnp.float32))
    shape = (n,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * a.reshape(shape) + b.reshape(shape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _fused_fwd_impl(x, scale, bias, groups: int, eps: float,
                    act: Optional[str], interpret: bool):
    c = x.shape[-1]
    n = x.shape[0]
    r = int(np.prod(x.shape[1:-1]))
    sums = _channel_sums(x.reshape(n, r, c), interpret)  # (N, 2, C) fp32
    cg = c // groups
    s1 = sums[:, 0].reshape(n, groups, cg).sum(-1)
    s2 = sums[:, 1].reshape(n, groups, cg).sum(-1)
    cnt = r * cg
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    meanc = jnp.repeat(mean, cg, axis=-1)            # (N, C)
    rstdc = jnp.repeat(rstd, cg, axis=-1)
    a = rstdc * scale.astype(jnp.float32)            # (N, C)
    b = bias.astype(jnp.float32) - meanc * a
    shape = (n,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * a.reshape(shape) + b.reshape(shape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(x, scale, bias, groups, eps, act, interpret):
    return _fused_fwd_impl(x, scale, bias, groups, eps, act, interpret)


def _fused_fwd(x, scale, bias, groups, eps, act, interpret):
    return _fused_fwd_impl(x, scale, bias, groups, eps, act, interpret), \
        (x, scale, bias)


def _fused_bwd(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference(x_, s_, b_, groups, eps, act),
        x, scale, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def group_norm_act(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int = 32, eps: float = 1e-5,
                   act: Optional[str] = None) -> jnp.ndarray:
    """GroupNorm over the channel-last axis, optionally fused with SiLU.

    Uses the Pallas stats kernel on TPU (``HVT_FUSED_GN=0`` disables); the
    pure-XLA reference elsewhere. scale/bias: (C,) in param dtype.
    """
    c = x.shape[-1]
    assert c % groups == 0, (c, groups)
    impl = os.environ.get("HVT_GN_IMPL")
    if impl is None:
        impl = ("pallas" if os.environ.get("HVT_FUSED_GN", "0") == "1"
                else "flax")
    if impl == "pallas" and jax.default_backend() == "tpu":
        return _fused(x, scale, bias, groups, eps, act, False)
    if impl == "two_stage":
        return _two_stage(x, scale, bias, groups, eps, act)
    return _reference(x, scale, bias, groups, eps, act)
