"""Small convolution-adjacent ops (NHWC layouts)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Space-to-depth on NHWC: (N, H*r, W*r, C) -> (N, H, W, C*r*r).

    Channel ordering matches torch.nn.PixelUnshuffle on the NCHW-equivalent
    tensor (used by the camera encoder's Plücker downscaling — reference
    ``src/cameractrl/pose_adaptor.py:232-235``): output channel index is
    c * r*r + dy * r + dx.
    """
    return rearrange(x, "n (h dy) (w dx) c -> n h w (c dy dx)", dy=factor, dx=factor)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Depth-to-space inverse of :func:`pixel_unshuffle`."""
    return rearrange(x, "n h w (c dy dx) -> n (h dy) (w dx) c", dy=factor, dx=factor)


def nearest_up2_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray | None = None,
                        dtype: jnp.dtype | None = None) -> jnp.ndarray:
    """Nearest x2 upsample followed by a 3x3 SAME conv, computed WITHOUT
    materializing the upsampled tensor.

    Exactly equal (incl. SAME boundaries) to
    ``conv3x3(nearest_up2(x), kernel)``: since ``up[p] = x[p // 2]``, the
    3 taps of each output phase collapse onto 2 source pixels per dimension,
    so the whole op is one low-res 3x3 conv emitting the 4 output phases as
    channel groups, then depth-to-space.  On TPU this removes the 4x repeat
    materialization (pure HBM traffic the conv cannot fuse through — it is
    ~half the VAE-decode elementwise budget, PERF.md r3) and feeds the MXU a
    1x-size input with 4x output channels instead of a 4x-size input.

    The SD1.5 UNet upsamplers and the VAE decoder upsamplers
    (reference ``src/models/resnet.py:10-55``, diffusers ``Upsample2D``) are
    the consumption sites.

    Args:
      x: (N, H, W, Cin).
      kernel: (3, 3, Cin, Cout) HWIO — the ORIGINAL post-upsample conv weight.
        Tap combination happens in ``kernel.dtype`` (pass the fp32 master so
        W1+W2 rounds once, like the unfused conv's fp32 weight handling).
      bias: optional (Cout,).
      dtype: compute dtype for the conv (default: ``x.dtype``).
    Returns:
      (N, 2H, 2W, Cout) in the compute dtype.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), kernel.shape
    # per-dimension tap remap: phase 0 output at i reads up[2i-1..2i+1] =
    # x[i-1], x[i], x[i] -> taps (W0, W1+W2, 0); phase 1 reads x[i], x[i],
    # x[i+1] -> (0, W0+W1, W2). SAME zero-padding agrees on both sides.
    m = jnp.asarray(
        [[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
         [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], dtype=kernel.dtype)
    # K[u, v, ci, dh, dw, co] = m[dh][u, a] m[dw][v, b] W[a, b, ci, co]
    k4 = jnp.einsum("xua,yvb,abio->uvixyo", m, m, kernel)
    k4 = k4.reshape(3, 3, cin, 4 * cout)
    dtype = dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k4.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, cout)
    return y if bias is None else y + bias.astype(dtype)
