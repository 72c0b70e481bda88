"""Pose2Image pipeline (stage-1 validation/eval sampler).

Behavioral parity: reference ``src/pipelines/pipeline_pose2img.py:194-376`` —
single-frame DDIM loop, CFG via batch concat, ReferenceNet forward once,
``pose_fea + camera_fea`` conditioning, VAE decode.

Implementation: a thin wrapper over the shared window-batched denoise scan
(`pose2vid._denoise_scan`) with one frame and one window — the math reduces to
exactly the single-image loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddim import ddim_set_timesteps
from .pose2vid import _denoise_scan, decode_latents, make_prepare_fn
from .system import CamAnimate, Params


@dataclasses.dataclass(frozen=True)
class Pose2ImageOutput:
    images: np.ndarray  # (b, H, W, 3) float32 in [0, 1]
    latents: np.ndarray


class Pose2ImagePipeline:
    def __init__(self, system: CamAnimate, params: Params):
        self.system = system
        self.params = params
        self.sched = system.make_schedule()
        self._jit_cache = {}

    def _denoise_fn(self, guidance_scale: float):
        key = float(guidance_scale)
        if key not in self._jit_cache:
            from functools import partial

            system, sched = self.system, self.sched

            @partial(jax.jit, donate_argnums=(1,))
            def fn(params, latents, ctx, ref_feats, pose_fea, plk, window, ts, pts):
                return _denoise_scan(
                    system, sched, params, latents, ctx, ref_feats, pose_fea, plk,
                    window, ts, pts, guidance_scale,
                )

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def __call__(
        self,
        ref_image: np.ndarray,   # (H, W, 3) in [0, 1]
        pose_image: np.ndarray,  # (H, W, 3) in [0, 1]
        plucker: np.ndarray,     # (H, W, 6)
        clip_image: np.ndarray,  # (sz, sz, 3) in [0, 1]
        num_inference_steps: int = 30,
        guidance_scale: float = 3.5,
        rng: Optional[jax.Array] = None,
    ) -> Pose2ImageOutput:
        from ..models.clip_vision import clip_preprocess

        system, params = self.system, self.params
        H, W, _ = pose_image.shape
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0
        dtype = system.dtype

        ddim = ddim_set_timesteps(
            self.sched, num_inference_steps,
            timestep_spacing=system.config.timestep_spacing,
            steps_offset=system.config.steps_offset,
        )
        window = jnp.zeros((1, 1), jnp.int32)  # one window, one frame

        ref_img = jnp.asarray(ref_image, dtype)[None] * 2.0 - 1.0
        clip_img = clip_preprocess(jnp.asarray(clip_image, dtype))[None]
        pose = jnp.asarray(pose_image, dtype)[None]  # [0, 1]: do_normalize=False
        plk = jnp.asarray(plucker, dtype)[None]

        prep_key = ("prepare", do_cfg)
        if prep_key not in self._jit_cache:
            self._jit_cache[prep_key] = make_prepare_fn(system, do_cfg)
        ctx, ref_feats, pose_fea, latents = self._jit_cache[prep_key](
            params, ref_img, clip_img, pose, (H // 8, W // 8), rng)

        latents = self._denoise_fn(guidance_scale)(
            params, latents, ctx, ref_feats, pose_fea, plk,
            window, ddim.timesteps, ddim.prev_timesteps,
        )
        image = decode_latents(system, params, latents, frame_chunk=1)
        return Pose2ImageOutput(
            images=np.asarray(image, np.float32),
            latents=np.asarray(latents, np.float32),
        )
