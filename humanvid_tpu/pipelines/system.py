"""CamAnimate system bundle: module definitions + parameter pytrees.

Groups the six sub-models of the reference system
(``train_stage_1.py:281-344``): VAE, CLIP vision encoder, ReferenceNet
(2D UNet), denoising video UNet, PoseGuider, CameraPoseEncoder — under one
config with helpers to initialize random parameters (tests/benchmarks) or load
converted checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.camera_encoder import CameraPoseEncoder
from ..models.clip_vision import CLIPVisionEncoder
from ..models.configs import (
    CameraEncoderConfig,
    CLIPVisionConfig,
    PoseGuiderConfig,
    UNetConfig,
    VAEConfig,
)
from ..models.pose_guider import PoseGuider
from ..models.unet import UNetConditionModel
from ..models.vae import VAEDecoder, VAEEncoder
from ..diffusion.schedule import NoiseSchedule, make_noise_schedule

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CamAnimateConfig:
    reference_unet: UNetConfig = UNetConfig()
    denoising_unet: UNetConfig = UNetConfig(use_motion_module=True)
    pose_guider: PoseGuiderConfig = PoseGuiderConfig()
    camera_encoder: CameraEncoderConfig = CameraEncoderConfig(position_encoding_max_len=24)
    vae: VAEConfig = VAEConfig()
    clip: CLIPVisionConfig = CLIPVisionConfig()
    # scheduler (inference): zero-SNR + v-pred + trailing + LINEAR betas —
    # the reference's production samplers build DDIMScheduler straight from
    # inference_v2.yaml:25-32 (beta_schedule: "linear"); only the TRAIN
    # scheduler is overwritten to scaled_linear (train_stage_1.py:277,
    # train_stage_2.py:159) — drivers pass beta_schedule to make_schedule
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    rescale_betas_zero_snr: bool = True
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"
    steps_offset: int = 1


def tiny_config(motion_max_len: int = 8) -> "CamAnimateConfig":
    """Small topology for CPU tests: same structure, 2 levels, thin channels."""
    tiny_unet = UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        down_block_types=("CrossAttnDownBlock", "DownBlock"),
        up_block_types=("UpBlock", "CrossAttnUpBlock"),
        attention_heads=4,
        cross_attention_dim=32,
        norm_num_groups=8,
    )
    return CamAnimateConfig(
        reference_unet=tiny_unet,
        denoising_unet=dataclasses.replace(
            tiny_unet, use_motion_module=True, motion_num_heads=4,
            motion_max_len=motion_max_len,
        ),
        pose_guider=PoseGuiderConfig(
            conditioning_embedding_channels=32, block_out_channels=(4, 8, 12, 16)
        ),
        camera_encoder=CameraEncoderConfig(
            channels=(32,), nums_rb=1, num_heads=4, position_encoding_max_len=motion_max_len
        ),
        vae=VAEConfig(block_out_channels=(8, 8, 16, 16), norm_num_groups=4),
        clip=CLIPVisionConfig(
            image_size=28, patch_size=14, hidden_size=16, num_layers=2,
            num_heads=2, intermediate_size=32, projection_dim=32,
        ),
    )


class CamAnimate:
    """Module bundle with a single params dict {component_name: params}."""

    def __init__(self, config: CamAnimateConfig = CamAnimateConfig(),
                 dtype=jnp.float32, param_dtype=None):
        """``param_dtype=None`` stores params in ``dtype`` (bf16 weights for
        inference — SD1.5-scale fp32 params plus their bf16 cast copies do not
        fit 16 GB HBM); training passes ``param_dtype=jnp.float32`` for fp32
        masters with bf16 activations."""
        self.config = config
        self.dtype = dtype
        self.param_dtype = param_dtype if param_dtype is not None else dtype
        kw = dict(dtype=dtype, param_dtype=self.param_dtype)
        self.reference_unet = UNetConditionModel(config=config.reference_unet, **kw)
        self.denoising_unet = UNetConditionModel(config=config.denoising_unet, **kw)
        self.pose_guider = PoseGuider(config=config.pose_guider, **kw)
        self.camera_encoder = CameraPoseEncoder(config=config.camera_encoder, **kw)
        self.vae_encoder = VAEEncoder(config=config.vae, **kw)
        self.vae_decoder = VAEDecoder(config=config.vae, **kw)
        self.clip = CLIPVisionEncoder(config=config.clip, **kw)

    def make_schedule(self, prediction_type: Optional[str] = None,
                      beta_schedule: Optional[str] = None) -> NoiseSchedule:
        c = self.config
        return make_noise_schedule(
            num_train_timesteps=c.num_train_timesteps,
            beta_start=c.beta_start,
            beta_end=c.beta_end,
            beta_schedule=beta_schedule or c.beta_schedule,
            rescale_betas_zero_snr=c.rescale_betas_zero_snr,
            prediction_type=prediction_type or c.prediction_type,
        )

    def init_params(self, rng: jax.Array, height: int = 64, width: int = 64,
                    frames: int = 2, abstract: bool = False) -> Params:
        """Random parameters with the right structure (tests / benchmarks).

        ``abstract=True`` traces the initializers without compiling or
        materializing anything and returns zero-filled host arrays — the tree
        STRUCTURE for checkpoint conversion/restoration, available in seconds
        where a real full-scale init costs minutes of XLA compilation.
        """
        if abstract:
            import functools

            import numpy as np

            shapes = jax.eval_shape(functools.partial(
                self.init_params, rng, height, width, frames))
            return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        c = self.config
        keys = jax.random.split(rng, 7)
        h8, w8 = height // 8, width // 8
        xdim = c.reference_unet.cross_attention_dim
        ctx = jnp.zeros((1, 1, xdim), self.dtype)
        ref_lat = jnp.zeros((1, h8, w8, c.reference_unet.in_channels), self.dtype)
        t = jnp.zeros((1,), self.dtype)

        ref_params = self.reference_unet.init(
            keys[0], ref_lat, t, ctx, collect_ref_features=True
        )
        _, ref_feats = self.reference_unet.apply(
            ref_params, ref_lat, t, ctx, collect_ref_features=True
        )
        lat = jnp.zeros((frames, h8, w8, c.denoising_unet.in_channels), self.dtype)
        den_params = self.denoising_unet.init(
            keys[1], lat, t, ctx, ref_features=ref_feats, frames=frames
        )
        pg_params = self.pose_guider.init(keys[2], jnp.zeros((1, height, width, 3), self.dtype))
        cam_params = self.camera_encoder.init(
            keys[3], jnp.zeros((frames, height, width, 6), self.dtype), frames
        )
        enc_params = self.vae_encoder.init(keys[4], jnp.zeros((1, height, width, 3), self.dtype))
        dec_params = self.vae_decoder.init(
            keys[5], jnp.zeros((1, h8, w8, c.vae.latent_channels), self.dtype)
        )
        clip_params = self.clip.init(
            keys[6], jnp.zeros((1, c.clip.image_size, c.clip.image_size, 3), self.dtype)
        )
        params = {
            "reference_unet": ref_params,
            "denoising_unet": den_params,
            "pose_guider": pg_params,
            "camera_encoder": cam_params,
            "vae_encoder": enc_params,
            "vae_decoder": dec_params,
            "clip": clip_params,
        }
        # Materialize: unmaterialized arrays captured as jit-lowering constants
        # deadlock on this JAX build (see diffusion.schedule.NoiseSchedule).
        return jax.block_until_ready(params)
