"""CameraPoseEncoder: Plücker-ray video -> 1/8-res conditioning feature.

Behavioral parity with reference ``src/cameractrl/pose_adaptor.py:160-248`` at
the shipped operating point (``configs/train/stage1.yaml:42-54``):

    PixelUnshuffle(8) (6 -> 384 ch) -> 3x3 conv 384->320 ->
    2 x [ ResnetBlock(320->320, ksize=1, sk=True)
          -> TemporalTransformerBlock(320, 8 heads, 1x Temporal_Self + FF,
             sinusoidal position encoding) ]
    -> zero-init 1x1 conv (no bias)

With ``sk=True`` and in==out channels the resnet is: 3x3 conv -> ReLU ->
1x1 conv (+ identity skip) — reference ``pose_adaptor.py:102-135``.

Output is added elementwise to the PoseGuider feature before the UNet
(reference ``train_stage_1.py:105``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ..ops.attention import use_fused_temporal
from ..ops.conv import pixel_unshuffle
from .configs import CameraEncoderConfig
from .layers import TemporalTransformerBlock


class _AdapterResnetBlock(nn.Module):
    """T2I-Adapter style resnet: conv(3x3) -> ReLU -> conv(ksize) + skip."""

    channels: int
    ksize: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="block1")(x)
        h = nn.relu(h)
        p = self.ksize // 2
        h = nn.Conv(self.channels, (self.ksize, self.ksize), padding=p,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="block2")(h)
        return x + h


class CameraPoseEncoder(nn.Module):
    config: CameraEncoderConfig = CameraEncoderConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, plucker: jnp.ndarray, frames: int) -> jnp.ndarray:
        """plucker: ((b f), H, W, 6) -> feature ((b f), H/8, W/8, 320)."""
        cfg = self.config
        x = pixel_unshuffle(plucker, cfg.downscale_factor)
        x = nn.Conv(cfg.channels[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(x)

        for i, ch in enumerate(cfg.channels):
            for j in range(cfg.nums_rb):
                if i > 0 and j == 0:
                    # inter-scale downsample (avg-pool; shipped config has one
                    # scale so this path is exercised only by custom configs)
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                x = _AdapterResnetBlock(
                    channels=ch, ksize=cfg.ksize, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"res_{i}_{j}",
                )(x)
                bf, h, w, c = x.shape
                block = TemporalTransformerBlock(
                    dim=ch, heads=cfg.num_heads,
                    num_attention_blocks=len(cfg.attention_block_types),
                    max_len=cfg.position_encoding_max_len,
                    use_pe=cfg.position_encoding,
                    ff_chunk_tokens=cfg.ff_chunk_tokens,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"attn_{i}_{j}",
                )
                if use_fused_temporal(frames):
                    # stay in the spatial layout; the Pallas kernel attends
                    # over frames in-kernel (same win as the motion modules:
                    # no (b f) l c <-> (b l) f c HBM rearranges, no padded
                    # fp32 (.., f, f) logits)
                    x = block(x.reshape(bf, h * w, c), frames=frames)
                    x = x.reshape(bf, h, w, c)
                else:
                    x = rearrange(x, "(b f) h w c -> (b h w) f c", f=frames)
                    x = block(x)
                    x = rearrange(x, "(b h w) f c -> (b f) h w c", h=h, w=w, f=frames)
            x = nn.Conv(
                ch, (1, 1), use_bias=False, kernel_init=nn.initializers.zeros,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"zero_conv_{i}",
            )(x)
        return x
