"""Host-side video IO.

Replaces the reference's decord/PyAV stack (``src/utils/util.py:82-197``,
dataset decode paths). Preferred backend: the in-tree native libav core
(``humanvid_tpu/native/videodec.cpp`` via ``data.native_video``) — exact
frame indexing, frame-threaded decode, GIL-free. Fallback: OpenCV. API
parity: ``read_frames``, ``get_fps``, ``save_video``, ``save_videos_grid``
(orientation aware). All arrays are (f, H, W, 3) RGB uint8 or float in [0, 1].
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


def _native():
    """The native libav backend module, or None if it can't build/load."""
    try:
        from ..native import available
        if available():
            from . import native_video
            return native_video
    except Exception:  # pragma: no cover
        pass
    return None


def _require_cv2():
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required for video IO but is unavailable")


def get_fps(path: str) -> float:
    nv = _native()
    if nv is not None:
        with nv.VideoReader(path) as r:
            return r.fps or 24.0
    _require_cv2()
    cap = cv2.VideoCapture(path)
    try:
        return float(cap.get(cv2.CAP_PROP_FPS)) or 24.0
    finally:
        cap.release()


def get_frame_count(path: str) -> int:
    nv = _native()
    if nv is not None:
        with nv.VideoReader(path) as r:
            return len(r)
    _require_cv2()
    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def read_frames(
    path: str,
    indices: Optional[Sequence[int]] = None,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Decode frames as (f, H, W, 3) RGB uint8.

    ``indices`` enables random access (sorted-seek decode); otherwise all
    frames up to ``max_frames`` stream sequentially.
    """
    nv = _native()
    if nv is not None:
        with nv.VideoReader(path) as r:
            if indices is not None:
                return r.get_batch(indices)
            return r.read_all(max_frames)
    _require_cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        frames: List[np.ndarray] = []
        if indices is None:
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok or (max_frames is not None and i >= max_frames):
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                i += 1
        else:
            order = np.argsort(indices)
            decoded = {}
            pos = -1
            for k in order:
                idx = int(indices[k])
                if idx != pos + 1:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
                ok, frame = cap.read()
                pos = idx
                if not ok:
                    raise IOError(f"frame {idx} unreadable in {path}")
                decoded[idx] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames = [decoded[int(i)] for i in indices]
        return np.stack(frames)
    finally:
        cap.release()


def save_video(frames: np.ndarray, path: str, fps: float = 24.0,
               crf: int = 19) -> None:
    """(f, H, W, 3) RGB uint8 or float[0,1] -> mp4 (x264 crf 19, parity with
    reference ``src/utils/util.py:103``; cv2 mp4v fallback)."""
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = frames.shape[1:3]
    nv = _native()
    if nv is not None:
        with nv.VideoWriter(path, w, h, fps=fps, crf=crf) as writer:
            writer.write(frames)
        return
    _require_cv2()
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    try:
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def save_videos_grid(
    videos: Sequence[np.ndarray], path: str, fps: float = 24.0
) -> None:
    """Stack ref/pose/output/gt videos into one grid (orientation aware):
    horizontal clips stack vertically, vertical clips side-by-side
    (reference ``src/utils/util.py:124-172``)."""
    videos = [v if v.dtype == np.uint8 else (np.clip(v, 0, 1) * 255).astype(np.uint8)
              for v in videos]
    f, h, w = videos[0].shape[:3]
    axis = 2 if h > w else 1  # vertical videos side-by-side, else stacked
    grid = np.concatenate(videos, axis=axis)
    save_video(grid, path, fps)


def resize_frames(frames: np.ndarray, width: int, height: int) -> np.ndarray:
    """PIL BILINEAR (antialiased) resize, matching the reference drivers'
    ``torchvision.transforms.Resize`` on PIL frames (scripts/pose2vid.py:246,
    eval_pose2vid.py:253, eval_pose2img.py:222) — cv2 interpolations are not
    antialiased and diverge visibly on downscale."""
    from PIL import Image

    return np.stack([
        np.asarray(Image.fromarray(f).resize((width, height), Image.BILINEAR))
        for f in frames
    ])
