"""DDIM sampling, pure-functional and scan-friendly.

Parity target: diffusers ``DDIMScheduler`` (eta=0, clip_sample=False,
thresholding off) at the reference operating point — trailing timestep
spacing + zero-SNR rescaled betas + v-prediction
(``configs/inference/inference_v2.yaml``), ``steps_offset=1``.

``ddim_set_timesteps`` runs at trace time (numpy, static step count) and
returns the timestep vector + per-step previous timesteps so the whole
denoising loop can be a ``lax.scan`` with table lookups only.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .schedule import NoiseSchedule


class DDIMState(NamedTuple):
    timesteps: jnp.ndarray       # (S,) int32, descending
    prev_timesteps: jnp.ndarray  # (S,) int32, timestep of the next (less noisy) state
    num_inference_steps: int


def ddim_set_timesteps(
    sched: NoiseSchedule,
    num_inference_steps: int,
    timestep_spacing: str = "trailing",
    steps_offset: int = 1,
) -> DDIMState:
    T = sched.num_train_timesteps
    if timestep_spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / num_inference_steps)).astype(np.int64) - 1
    elif timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + steps_offset
    elif timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps).round()[::-1].astype(np.int64)
    else:
        raise ValueError(f"unknown timestep spacing: {timestep_spacing}")
    prev = ts - T // num_inference_steps
    return DDIMState(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        prev_timesteps=jnp.asarray(prev, dtype=jnp.int32),
        num_inference_steps=num_inference_steps,
    )


def _alpha_at(sched: NoiseSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t], with t<0 mapping to final_alpha_cumprod."""
    safe_t = jnp.maximum(jnp.asarray(t), 0)
    a = jnp.asarray(sched.alphas_cumprod)[safe_t]
    return jnp.where(t < 0, jnp.float32(sched.final_alpha_cumprod), a)


def ddim_pred_x0_eps(
    sched: NoiseSchedule, model_output: jnp.ndarray, sample: jnp.ndarray, t: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x0, eps) from the model output under the schedule's prediction type."""
    a_t = _alpha_at(sched, t)
    sqrt_a, sqrt_1ma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    if sched.prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_1ma * eps) / sqrt_a
    elif sched.prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    elif sched.prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_1ma
    else:
        raise ValueError(sched.prediction_type)
    return x0, eps


def ddim_step(
    sched: NoiseSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """One deterministic DDIM update (eta=0): x_t -> x_{prev_t}.

    Scheduler math runs in fp32 regardless of the model dtype (zero-SNR /
    v-prediction fidelity dominates FVD, SURVEY §7.3); the result is cast
    back to the sample dtype so scan carries keep a stable type.
    """
    dtype = sample.dtype
    x0, eps = ddim_pred_x0_eps(
        sched, model_output.astype(jnp.float32), sample.astype(jnp.float32), t
    )
    a_prev = _alpha_at(sched, prev_t)
    return (jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps).astype(dtype)
