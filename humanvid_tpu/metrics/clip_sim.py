"""CLIP frame-consistency metric.

Behavioral parity: reference ``metrics/sim.py:37-77`` — mean pairwise cosine
similarity of CLIP vision features across the frames of each generated video.
Uses our JAX CLIP vision encoder; converted CLIP-L/14 weights are loaded with
``utils.convert.convert_state_dict(..., "clip")``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def frame_consistency(frame_features: jnp.ndarray) -> float:
    """(f, d) per-frame CLIP features -> mean pairwise cosine similarity."""
    x = frame_features / jnp.linalg.norm(frame_features, axis=-1, keepdims=True)
    sim = x @ x.T  # (f, f)
    f = sim.shape[0]
    mask = ~np.eye(f, dtype=bool)
    return float(jnp.asarray(sim)[mask].mean())
