"""PoseGuider: strided conv encoder of the rasterized skeleton video.

Behavioral parity with reference ``src/models/pose_guider.py:16-61``
(ControlNet-style conditioning embedding): conv_in (3->16) + SiLU, then for
each stage a same-channel 3x3 conv + SiLU and a stride-2 3x3 conv + SiLU
(16->32->96->256), finally a zero-initialized 3x3 conv to 320 channels.
Output is the 1/8-resolution feature added to the UNet's ``conv_in`` output.

All convs are per-frame 2D convs on ``((b f), h, w, c)`` — the reference's
``InflatedConv3d`` with the frame axis pre-flattened.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .configs import PoseGuiderConfig


class PoseGuider(nn.Module):
    config: PoseGuiderConfig = PoseGuiderConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        # cond: ((b f), h, w, 3) skeleton frames in [-1, 1] preprocessing range
        cfg = self.config
        conv = lambda ch, stride, name: nn.Conv(
            ch, (3, 3), strides=(stride, stride), padding=1,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        x = conv(cfg.block_out_channels[0], 1, "conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(cfg.block_out_channels) - 1):
            x = conv(cfg.block_out_channels[i], 1, f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = conv(cfg.block_out_channels[i + 1], 2, f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        x = nn.Conv(
            cfg.conditioning_embedding_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv_out",
        )(x)
        return x
