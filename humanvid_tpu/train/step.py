"""The jitted training step (shared by stage 1 and stage 2).

Behavioral parity: ``train_stage_1.py:545-677`` / ``train_stage_2.py`` —
VAE-encode targets + reference, CLIP-embed (with whole-batch CFG dropout at
``uncond_ratio``), noise-offset noising, ε- or v-prediction target, min-SNR-γ
weighted MSE, AdamW with grad-norm clip.

Stage differences are data shape (f=1 vs f=24) and the trainability mask
(``state.stage{1,2}_trainable``); the step function itself is identical.

TPU-first notes:
- The whole step (frozen encoders included) is one jitted function; batch
  inputs are sharded over the ``data`` mesh axis and XLA inserts the gradient
  psum (replacing DDP/NCCL allreduce).
- The reference's "skip ReferenceNet when uncond" branch
  (``train_stage_1.py:94-99``) is replaced by always running the writer and
  masking its features out of the reader's attention (``ref_disable``) — the
  masked keys get exactly zero gradient, so parameter updates match; there is
  no data-dependent Python branching inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.schedule import (
    NoiseSchedule,
    add_noise,
    get_velocity,
    min_snr_weights,
)
from ..models.vae import gaussian_sample
from ..pipelines.system import CamAnimate

Batch = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    uncond_ratio: float = 0.1
    noise_offset: float = 0.05
    snr_gamma: float = 5.0
    # Frames per frozen-VAE-encode call, scanned via lax.map. The batched
    # encode's full-resolution 128-channel activations are the largest HLO
    # temps of the stage-2 step (3x bf16[24,896,512,128] = 7.9 GB of the
    # 16.3 GB single-chip footprint — tools/stage2_memcheck.py); the encode
    # carries no gradients, so chunking it costs nothing but loop overhead.
    # 0 disables; when the value doesn't divide b*f, the largest divisor
    # <= it is used instead so a batch-shape change degrades gracefully
    # rather than reverting to the memory-heavy full-batch encode.
    vae_encode_chunk: int = 4
    # Rematerialize the PoseGuider and CameraPoseEncoder forwards. Both run
    # at full/8 resolution over every frame, and the camera encoder is
    # trainable in BOTH stages, so without remat its interior activations
    # (conv_in/resnet/attention q-k-v, 126 MB each at the stage-2 op-point —
    # the r3 memcheck's items 5-8) stay live across the whole UNet pass.
    # Recompute cost is ~0.08 s per 24 frames (PERF.md component budget).
    remat_cond_encoders: bool = True


def make_loss_fn(system: CamAnimate, sched: NoiseSchedule, cfg: TrainConfig):
    """Build the per-step loss over (trainable params, frozen params, batch, rng).

    Batch layout:
        tgt:     (b, f, H, W, 3) in [-1, 1]
        ref:     (b, H, W, 3) in [-1, 1]
        clip:    (b, sz, sz, 3) CLIP-normalized
        pose:    (b, f, H, W, 3) in [0, 1] (reference cond_transform is
                 ToTensor-only, dance_image_h_v_camera.py:320-326)
        plucker: (b, f, H, W, 6) raw
    """
    scaling = system.config.vae.scaling_factor

    def loss_fn(params, frozen, batch: Batch, rng: jax.Array):
        b, f = batch["tgt"].shape[:2]
        H, W = batch["tgt"].shape[2:4]
        r_noise, r_off, r_t, r_vae1, r_vae2, r_uncond = jax.random.split(rng, 6)

        # --- frozen encoders ---
        tgt = batch["tgt"].reshape((b * f, H, W, 3))
        n, c = b * f, cfg.vae_encode_chunk
        if c and c < n:
            while n % c:  # largest divisor <= requested chunk, never disable
                c -= 1
        if c and c < n:
            moments = jax.lax.map(
                lambda x: system.vae_encoder.apply(frozen["vae_encoder"], x),
                tgt.reshape((n // c, c, H, W, 3)),
            )
            moments = moments.reshape((n,) + moments.shape[2:])
        else:
            moments = system.vae_encoder.apply(frozen["vae_encoder"], tgt)
        latents = gaussian_sample(moments, r_vae1) * scaling
        lat_shape = latents.shape  # (b*f, h8, w8, 4)
        latents = latents.reshape((b, f) + lat_shape[1:])

        ref_moments = system.vae_encoder.apply(frozen["vae_encoder"], batch["ref"])
        ref_latents = gaussian_sample(ref_moments, r_vae2) * scaling  # (b, h8, w8, 4)

        image_embeds = system.clip.apply(frozen["clip"], batch["clip"])  # (b, d)
        uncond = jax.random.bernoulli(r_uncond, cfg.uncond_ratio)  # scalar, whole batch
        ctx = jnp.where(uncond, 0.0, image_embeds)[:, None, :]  # (b, 1, d)

        # --- noising ---
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        if cfg.noise_offset > 0:
            noise = noise + cfg.noise_offset * jax.random.normal(
                r_off, (b, 1, 1, 1, latents.shape[-1]), latents.dtype
            )
        t = jax.random.randint(r_t, (b,), 0, sched.num_train_timesteps)
        noisy = add_noise(sched, latents, noise, t)
        if sched.prediction_type == "epsilon":
            target = noise
        elif sched.prediction_type == "v_prediction":
            target = get_velocity(sched, latents, noise, t)
        else:
            raise ValueError(sched.prediction_type)

        # --- trainable forward ---
        _, ref_feats = system.reference_unet.apply(
            params["reference_unet"], ref_latents, jnp.zeros((b,), jnp.float32),
            ctx, collect_ref_features=True,
        )
        pose_apply = system.pose_guider.apply
        cam_apply = lambda p, x: system.camera_encoder.apply(p, x, f)  # noqa: E731
        if cfg.remat_cond_encoders:
            pose_apply = jax.checkpoint(pose_apply)
            cam_apply = jax.checkpoint(cam_apply)
        pose_fea = pose_apply(
            params["pose_guider"], batch["pose"].reshape((b * f, H, W, 3))
        )
        cam_fea = cam_apply(
            params["camera_encoder"], batch["plucker"].reshape((b * f, H, W, 6))
        )
        ref_disable = jnp.broadcast_to(uncond, (b,))
        pred, _ = system.denoising_unet.apply(
            params["denoising_unet"],
            noisy.reshape((b * f,) + lat_shape[1:]),
            t.astype(jnp.float32),
            ctx,
            cond_fea=pose_fea + cam_fea,
            ref_features=ref_feats,
            ref_disable=ref_disable,
            frames=f,
        )
        pred = pred.reshape(latents.shape)

        # --- min-SNR weighted MSE (train_stage_1.py:633-654) ---
        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        per_sample = err.mean(axis=tuple(range(1, err.ndim)))
        if cfg.snr_gamma > 0:
            per_sample = per_sample * min_snr_weights(sched, t, cfg.snr_gamma)
        loss = per_sample.mean()
        return loss, {"loss": loss, "t_mean": t.mean()}

    return loss_fn


def make_train_step(system: CamAnimate, sched: NoiseSchedule, cfg: TrainConfig,
                    trainable_predicate=None):
    """``trainable_predicate`` (component, path) -> bool: when given, only the
    matching partition of ``state.params`` is differentiated. JAX then prunes
    the entire backward pass through stage-frozen components (e.g. in stage 2
    the ReferenceNet and the non-motion video UNet — ~1.5B params whose
    gradients pure update-masking would compute, materialize, and discard),
    matching the reference's ``requires_grad_(False)`` cost profile. The
    optimizer still sees a full-structure gradient tree (zeros in the frozen
    holes, DCE'd by XLA because ``set_to_zero`` ignores them), and the logged
    grad_norm covers exactly the clipped (trainable) gradients.
    """
    loss_fn = make_loss_fn(system, sched, cfg)

    def train_step(state, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if trainable_predicate is None:
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.frozen, batch, rng
            )
            aux["grad_norm"] = optax_global_norm(grads)
        else:
            from .state import combine_params, partition_params

            train_part, static_part = partition_params(
                state.params, trainable_predicate)

            def loss_on_trainable(tp):
                return loss_fn(combine_params(tp, static_part),
                               state.frozen, batch, rng)

            (_, aux), grads_t = jax.value_and_grad(
                loss_on_trainable, has_aux=True)(train_part)
            aux["grad_norm"] = optax_global_norm(grads_t)
            zeros = jax.tree.map(
                lambda x: None if x is None else jnp.zeros_like(x),
                static_part, is_leaf=lambda v: v is None)
            grads = combine_params(grads_t, zeros)
        new_state = state.apply_gradients(grads)
        return new_state, aux

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
