"""Diffusion noise schedules: beta curves, zero-SNR rescale, noising utilities.

Behavioral parity targets:
- diffusers ``DDIMScheduler`` table construction as configured by the
  reference: betas 0.00085..0.012 over 1000 steps — "linear" for inference
  (``configs/inference/inference_v2.yaml:27``) and forced "scaled_linear" for
  the training scheduler (``train_stage_1.py:277``) — with optional
  ``rescale_betas_zero_snr`` (Lin et al. 2023, "Common Diffusion Noise
  Schedules and Sample Steps are Flawed").
- ``add_noise`` / ``get_velocity`` / ``compute_snr``
  (``train_stage_1.py:112-139,608-654``).

Everything is precomputed into a small pytree of tables; all per-step math is
pure jnp and indexes tables by timestep — jit/scan friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class NoiseSchedule(NamedTuple):
    """Precomputed schedule tables (float32, length ``num_train_timesteps``).

    Tables are **host numpy** arrays on purpose: schedules are captured in jit
    closures, and this environment's JAX build deadlocks when lowering embeds a
    not-yet-materialized device array as a constant (futex hang in
    ``_array_mlir_constant_handler``). Host constants lower safely.
    """

    alphas_cumprod: np.ndarray   # (T,)
    num_train_timesteps: int
    prediction_type: str         # "epsilon" | "v_prediction"
    final_alpha_cumprod: float   # alpha_cumprod used for t < 0 in DDIM steps


def _make_betas(schedule: str, beta_start: float, beta_end: float, n: int) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, n, dtype=np.float64)
    if schedule == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
    if schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(n, dtype=np.float64)
        return np.minimum(1 - alpha_bar((ts + 1) / n) / alpha_bar(ts / n), 0.999)
    raise ValueError(f"unknown beta schedule: {schedule}")


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift/scale sqrt(alpha_cumprod) so terminal SNR is exactly zero."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    sqrt_ac = np.sqrt(alphas_cumprod)

    sqrt_ac_0 = sqrt_ac[0].copy()
    sqrt_ac_T = sqrt_ac[-1].copy()
    sqrt_ac = sqrt_ac - sqrt_ac_T                       # terminal -> 0
    sqrt_ac = sqrt_ac * sqrt_ac_0 / (sqrt_ac_0 - sqrt_ac_T)  # keep first value

    alphas_cumprod = sqrt_ac**2
    alphas = np.concatenate([alphas_cumprod[:1], alphas_cumprod[1:] / alphas_cumprod[:-1]])
    return 1.0 - alphas


def make_noise_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    rescale_betas_zero_snr: bool = True,
    prediction_type: str = "v_prediction",
    set_alpha_to_one: bool = True,
) -> NoiseSchedule:
    betas = _make_betas(beta_schedule, beta_start, beta_end, num_train_timesteps)
    if rescale_betas_zero_snr:
        betas = _rescale_zero_terminal_snr(betas)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final_alpha = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    return NoiseSchedule(
        alphas_cumprod=np.asarray(alphas_cumprod, dtype=np.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        final_alpha_cumprod=final_alpha,
    )


def _gather(table: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] broadcast to an ndim-rank tensor (batch leading)."""
    v = jnp.asarray(table)[jnp.asarray(t).astype(jnp.int32)]
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def add_noise(sched: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    a = _gather(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def get_velocity(sched: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    a = _gather(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * x0


def compute_snr(sched: NoiseSchedule, t: jnp.ndarray) -> jnp.ndarray:
    a = jnp.asarray(sched.alphas_cumprod)[jnp.asarray(t).astype(jnp.int32)]
    return a / (1.0 - a)


def min_snr_weights(sched: NoiseSchedule, t: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Min-SNR-gamma loss weights (reference ``train_stage_1.py:633-654``).

    For v-prediction the reference adds 1 to the SNR before the min/ratio,
    which also keeps the zero-terminal-SNR timestep finite (weight -> 1).
    """
    snr = compute_snr(sched, t)
    if sched.prediction_type == "v_prediction":
        snr = snr + 1.0
    return jnp.minimum(snr, gamma) / snr
