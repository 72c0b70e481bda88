"""Small convolution-adjacent ops (NHWC layouts)."""

from __future__ import annotations

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
