"""Temporal context-window scheduling for long-video inference.

Behavioral parity: reference ``src/pipelines/context.py:7-52`` — per-denoise-step
phase-shifted sliding windows with power-of-two strides and wrap-around.

TPU-first difference: the reference iterates windows *serially on one GPU*
(``pipeline_pose2vid_long.py:514-556``); here windows for a step are stacked
into a static ``(num_windows, context_size)`` int32 index array so a single
batched (and mesh-sharded) UNet call processes them all, and the whole denoise
loop can be a ``lax.scan`` over a precomputed ``(steps, num_windows,
context_size)`` tensor.
"""

from __future__ import annotations

from typing import List

import numpy as np


def ordered_halving(val: int) -> float:
    """Bit-reversed fraction of a 64-bit integer (van der Corput sequence)."""
    rev = int(f"{val:064b}"[::-1], 2)
    return rev / (1 << 64)


def uniform_windows(
    step: int,
    num_frames: int,
    context_size: int = 24,
    context_stride: int = 1,
    context_overlap: int = 4,
    closed_loop: bool = True,
) -> List[List[int]]:
    """Frame-index windows for one denoising step (wrap-around, mod num_frames)."""
    if num_frames <= context_size:
        return [list(range(num_frames))]

    context_stride = min(
        context_stride, int(np.ceil(np.log2(num_frames / context_size))) + 1
    )
    windows: List[List[int]] = []
    for context_step in (1 << np.arange(context_stride)):
        context_step = int(context_step)
        pad = int(round(num_frames * ordered_halving(step)))
        start = int(ordered_halving(step) * context_step) + pad
        stop = num_frames + pad + (0 if closed_loop else -context_overlap)
        stride = context_size * context_step - context_overlap
        for j in range(start, stop, stride):
            windows.append(
                [e % num_frames for e in range(j, j + context_size * context_step, context_step)]
            )
    return windows


def all_step_windows(
    num_steps: int,
    num_frames: int,
    context_size: int = 24,
    context_stride: int = 1,
    context_overlap: int = 4,
    closed_loop: bool = True,
) -> np.ndarray:
    """Stack windows for every denoising step into ``(steps, W, context)`` int32.

    The per-step window count is constant for ``closed_loop=True`` (the range
    always spans exactly ``num_frames`` indices), which this asserts — required
    for a static-shape ``lax.scan``.
    """
    per_step = [
        uniform_windows(s, num_frames, context_size, context_stride, context_overlap, closed_loop)
        for s in range(num_steps)
    ]
    counts = {len(w) for w in per_step}
    assert len(counts) == 1, f"non-constant window count across steps: {counts}"
    return np.asarray(per_step, dtype=np.int32)
