"""Latent frame interpolation (slerp/linear) for temporal upsampling.

Behavioral parity: reference ``src/pipelines/utils.py:10-29`` (slerp with a
dot-threshold linear fallback) and
``pipeline_pose2vid_long.py:294-337`` (``interpolate_latents``: insert
``rate - 1`` interpolated latents between consecutive frames before decoding,
so a clip generated at f frames decodes to ``f + (f-1)(rate-1)`` frames).

TPU-first: one vectorized jit over all adjacent pairs instead of the
reference's per-pair Python loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["slerp", "lerp", "interpolate_latents"]


def lerp(v0: jnp.ndarray, v1: jnp.ndarray, t) -> jnp.ndarray:
    t = jnp.asarray(t, v0.dtype)
    return (1.0 - t) * v0 + t * v1


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t, dot_threshold: float = 0.9995):
    """Spherical interpolation over the flattened vectors; falls back to
    linear when the directions are nearly parallel (utils.py:10-29)."""
    t = jnp.asarray(t, jnp.float32)
    a = v0.astype(jnp.float32).reshape(-1)
    b = v1.astype(jnp.float32).reshape(-1)
    dot = jnp.sum(a * b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta0 = jnp.arccos(dot)
    sin0 = jnp.sin(theta0)
    st = jnp.sin((1.0 - t) * theta0) / jnp.maximum(sin0, 1e-12)
    s1 = jnp.sin(t * theta0) / jnp.maximum(sin0, 1e-12)
    spherical = st * a + s1 * b
    linear = (1.0 - t) * a + t * b
    out = jnp.where(jnp.abs(dot) > dot_threshold, linear, spherical)
    return out.reshape(v0.shape).astype(v0.dtype)


def interpolate_latents(latents: jnp.ndarray, rate: int, mode: str = "slerp"):
    """(f, h, w, c) -> (f + (f-1)*(rate-1), h, w, c).

    Between each adjacent frame pair, ``rate - 1`` interpolants are inserted
    at fractions k/rate (k=1..rate-1), matching the reference layout.
    """
    if rate <= 1:
        return latents
    return _interpolate_jit(latents, rate, mode)


@partial(jax.jit, static_argnames=("rate", "mode"))
def _interpolate_jit(latents: jnp.ndarray, rate: int, mode: str):
    f = latents.shape[0]
    v0, v1 = latents[:-1], latents[1:]  # (f-1, ...)
    fracs = jnp.arange(1, rate) / rate  # (rate-1,)
    fn = slerp if mode == "slerp" else lerp
    # (f-1, rate-1, ...) interpolants
    inter = jax.vmap(lambda a, b: jax.vmap(lambda t: fn(a, b, t))(fracs))(v0, v1)
    # interleave: frame_i, its rate-1 interpolants, ..., last frame
    groups = jnp.concatenate([v0[:, None], inter], axis=1)  # (f-1, rate, ...)
    flat = groups.reshape((-1,) + latents.shape[1:])
    return jnp.concatenate([flat, latents[-1:]], axis=0)
