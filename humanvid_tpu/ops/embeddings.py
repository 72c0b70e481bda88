"""Sinusoidal embeddings (timesteps + temporal positions).

Parity targets (behavioral, not code):
- diffusers ``Timesteps``/``get_timestep_embedding`` as used by SD1.5
  (reference ``src/models/unet_3d.py:93-96`` uses Timesteps(320, flip_sin_to_cos=True,
  freq_shift=0)).
- AnimateDiff ``PositionalEncoding`` (reference ``src/models/motion_module.py:262-278``):
  pe[:, 0::2] = sin, pe[:, 1::2] = cos with div_term = exp(arange(0,d,2) * -ln(10000)/d).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sinusoidal embedding of diffusion timesteps.

    Args:
        timesteps: ``(B,)`` float/int array of timesteps.
        dim: embedding dimension (even).

    Returns:
        ``(B, dim)`` embedding. With ``flip_sin_to_cos=True`` the layout is
        ``[cos | sin]`` (SD1.5 convention), otherwise ``[sin | cos]``.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def sinusoidal_positional_encoding(seq_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Interleaved sin/cos positional encoding table ``(seq_len, dim)``.

    pe[p, 2i] = sin(p * w_i), pe[p, 2i+1] = cos(p * w_i) with
    w_i = exp(-ln(10000) * 2i / dim). Matches the AnimateDiff/CameraCtrl tables
    so converted checkpoints see identical temporal phases.
    """
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    angles = position * div_term[None, :]
    pe = jnp.zeros((seq_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles)[:, : dim // 2])
    return pe.astype(dtype)
