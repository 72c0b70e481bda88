"""SD VAE (AutoencoderKL) — encoder, decoder, diagonal Gaussian.

Behavioral parity: diffusers ``AutoencoderKL`` at the sd-vae-ft-mse operating
point, as used by the reference for latent encode/decode
(``train_stage_1.py:556-598``, ``pipeline_pose2vid_long.py:114-127,424-432``).

TPU-first details:
- NHWC layout; the video decode path is a ``lax.scan`` over frames (a fused
  HBM-resident loop replacing the reference's per-frame Python decode loop),
  with optional spatial tiling for large frames.
- The mid-block attention (single head over all channels) runs as one fused
  attention over h*w tokens.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiHeadAttention
from ..ops.conv import nearest_up2_conv3x3
from .configs import VAEConfig
from .layers import Conv3x3Params, FusedGroupNorm


class _VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class _VAEAttention(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        residual = x
        x = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="group_norm")(x)
        x = x.reshape(n, h * w, c)
        x = MultiHeadAttention(
            query_dim=c, heads=1, head_dim=c, qkv_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(x)
        return residual + x.reshape(n, h, w, c)


class VAEEncoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, H, W, 3) -> moments (n, H/8, W/8, 2*latent_channels)."""
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = _VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype,
                               name=f"down_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = _VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_resnets_0")(x)
        x = _VAEAttention(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_attn")(x)
        x = _VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_resnets_1")(x)
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_out")(x)
        # quant_conv maps moments -> moments (1x1)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="quant_conv")(x)


class VAEDecoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(n, h, w, latent_channels) -> (n, 8h, 8w, 3)."""
        cfg = self.config
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(z)
        x = _VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_resnets_0")(x)
        x = _VAEAttention(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_attn")(x)
        x = _VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_resnets_1")(x)

        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = _VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype,
                               name=f"up_{i}_resnets_{j}")(x)
            if i < len(rev) - 1:
                c = x.shape[-1]
                # fused subpixel upsample-conv: exact nearest-x2 + 3x3 SAME
                # math with no materialized 4x repeat (ops/conv.py)
                kernel, bias = Conv3x3Params(
                    c, self.param_dtype, name=f"up_{i}_upsample")(c)
                x = nearest_up2_conv3x3(x, kernel, bias, dtype=self.dtype)
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv_out")(x)


def gaussian_sample(moments: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Sample from the diagonal Gaussian given encoder moments."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


def gaussian_mean(moments: jnp.ndarray) -> jnp.ndarray:
    mean, _ = jnp.split(moments, 2, axis=-1)
    return mean
