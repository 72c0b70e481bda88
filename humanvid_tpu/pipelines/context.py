"""Temporal context-window scheduling for long-video inference.

Behavioral parity: reference ``src/pipelines/context.py:7-52`` — sliding
windows with power-of-two strides and wrap-around. The scheduler supports
per-step phase-shifted windows (its ``step`` argument), but the reference's
production pipeline always calls it with ``step=0``
(``pipeline_pose2vid_long.py:484,495``), so the window set is IDENTICAL for
every denoising step; ``all_step_windows`` reproduces that by broadcasting
the step-0 windows.

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

    The reference pipeline passes a literal ``step=0`` to the scheduler
    (``pipeline_pose2vid_long.py:484``), so every step reuses the step-0
    windows; broadcasting them keeps the scan input static-shaped for any
    ``context_stride``.
    """
    step0 = uniform_windows(
        0, num_frames, context_size, context_stride, context_overlap, closed_loop
    )
    return np.broadcast_to(
        np.asarray(step0, dtype=np.int32)[None],
        (num_steps, len(step0), len(step0[0])),
    ).copy()
