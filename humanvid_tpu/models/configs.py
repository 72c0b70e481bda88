"""Model configuration dataclasses (SD1.5 / AnimateDiff / CameraCtrl operating points).

Values mirror the shipped reference configs:
- UNet: SD1.5 (reference ``src/models/unet_3d.py:397-577`` + diffusers SD1.5 config)
- motion modules: ``configs/inference/inference_v2.yaml`` (8 heads, 1 block,
  2x Temporal_Self, pos-enc max_len 32, zero-init proj_out)
- camera encoder: ``configs/train/stage1.yaml:42-54`` (channels=[320], nums_rb=2,
  cin=384, ksize=1, sk=true, use_conv=false, pos-enc max_len 16/24)
- pose guider: ``train_stage_1.py:301`` (PoseGuider(320, (16, 32, 96, 256)))
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock",
        "CrossAttnDownBlock",
        "CrossAttnDownBlock",
        "DownBlock",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock",
        "CrossAttnUpBlock",
        "CrossAttnUpBlock",
        "CrossAttnUpBlock",
    )
    cross_attention_dim: int = 768
    # diffusers naming quirk: for SD1.5 "attention_head_dim=8" is the head COUNT;
    # head width is channels // heads.
    attention_heads: int = 8
    transformer_layers: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    time_embed_dim_mult: int = 4  # time_embed_dim = block_out_channels[0] * 4
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True

    # Video/motion extensions (AnimateDiff), off for the ReferenceNet.
    use_motion_module: bool = False
    motion_mid_block: bool = True
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    motion_position_encoding: bool = True
    motion_max_len: int = 32

    # Activation checkpointing (reference stage 2 grad-ckpt,
    # configs/train/stage2.yaml:18 / unet_3d_blocks.py:409-434): remat each
    # resnet/spatial/motion block so only block boundaries are saved.
    gradient_checkpointing: bool = False
    # token-axis FF chunking for training memory (0 = off); see
    # layers.GEGLUFeedForward. 1024 caps the level-0 GEGLU inner temps at
    # ~120 MB/chunk at the stage-2 op-point (vs 840 MB unchunked).
    ff_chunk_tokens: int = 0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * self.time_embed_dim_mult


SD15_UNET = UNetConfig()
SD15_VIDEO_UNET = UNetConfig(use_motion_module=True)


@dataclasses.dataclass(frozen=True)
class PoseGuiderConfig:
    conditioning_embedding_channels: int = 320
    conditioning_channels: int = 3
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)


@dataclasses.dataclass(frozen=True)
class CameraEncoderConfig:
    downscale_factor: int = 8
    channels: Tuple[int, ...] = (320,)
    nums_rb: int = 2
    cin: int = 384  # 6 plucker channels * 8 * 8
    ksize: int = 1
    sk: bool = True
    use_conv: bool = False
    num_heads: int = 8
    attention_block_types: Tuple[str, ...] = ("Temporal_Self",)
    position_encoding: bool = True
    position_encoding_max_len: int = 16  # 16 stage 1 / 24 stage 2+inference
    ff_chunk_tokens: int = 0  # training-memory FF chunking (0 = off)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """SD VAE (AutoencoderKL, sd-vae-ft-mse operating point)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT-L/14 vision tower with projection (sd-image-variations encoder)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
