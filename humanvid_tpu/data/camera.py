"""Camera trajectory parsing and Plücker-ray embeddings.

Behavioral parity: reference ``src/dataset/dance_image_h_v_camera.py:17-130,
205-222`` (TUM line parsing, per-source w2c/c2w convention, quaternion->R,
relative poses with the first camera mapped to identity, per-pixel Plücker
rays) and ``scripts/pose2vid.py:45-83`` (camera-file loading + static-camera
fallback with fx 1.0 / 1.788079 by orientation).

`ray_condition` is pure math, implemented once over numpy-or-jax namespaces so
the Plücker video can be built on-device from the tiny ``(K, c2w)`` arrays
instead of shipping ``(f, H, W, 6)`` tensors from the host.

Not replicated (destructive reference behaviors, SURVEY §5): writing to
``broken_kps_videos.txt`` and ``os.remove`` of corrupt files; quaternion norm
issues raise/log instead.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# pose-file name substrings that mark world-to-camera storage; all others are
# camera-to-world with optional translation scale.
W2C_SOURCES = ("bedlam", "blender", "ue_rendered")
C2W_SOURCES = ("pexels", "inference", "ubc", "tiktok", "webvid", "test")


def quaternion_to_rotation_matrix(qx: float, qy: float, qz: float, qw: float) -> np.ndarray:
    return np.array([
        [1 - 2 * qy**2 - 2 * qz**2, 2 * qx * qy - 2 * qz * qw, 2 * qx * qz + 2 * qy * qw],
        [2 * qx * qy + 2 * qz * qw, 1 - 2 * qx**2 - 2 * qz**2, 2 * qy * qz - 2 * qx * qw],
        [2 * qx * qz - 2 * qy * qw, 2 * qy * qz + 2 * qx * qw, 1 - 2 * qx**2 - 2 * qy**2],
    ])


@dataclasses.dataclass
class Camera:
    """One TUM-format camera line: ``t tx ty tz qx qy qz qw fx fy [scale]``."""

    fx: float
    fy: float
    cx: float
    cy: float
    w2c: np.ndarray  # (4, 4)
    c2w: np.ndarray  # (4, 4)

    @classmethod
    def from_entry(
        cls, entry: Sequence[float], pose_file_name: str,
        image_size: Tuple[int, int] = (1920, 1080),
    ) -> "Camera":
        """``image_size`` is (width, height). Focal heuristic: horizontal videos
        carry normalized fx (entry[8]); vertical carry fy (entry[9]); the other
        is derived via the aspect ratio (square pixels)."""
        assert len(entry) in (10, 11), f"TUM entry must have 10 or 11 fields, got {len(entry)}"
        w, h = image_size
        if w > h:
            fx = entry[8]
            fy = fx * (w / h)
        else:
            fy = entry[9]
            fx = fy * (h / w)
        cx = cy = 0.5

        tx, ty, tz = entry[1:4]
        qx, qy, qz, qw = entry[4:8]
        scale = entry[10] if len(entry) == 11 else 1.0
        norm = float(np.linalg.norm([qx, qy, qz, qw]))
        if abs(norm - 1.0) > 1e-3:
            logger.warning("%s: quaternion not normalized (|q|=%.4f)", pose_file_name, norm)
        qx, qy, qz, qw = (v / norm for v in (qx, qy, qz, qw))
        R = quaternion_to_rotation_matrix(qx, qy, qz, qw)
        t = np.array([tx, ty, tz])

        name = pose_file_name.lower()
        if any(s in name for s in W2C_SOURCES):
            w2c = np.eye(4)
            w2c[:3, :3] = R
            w2c[:3, 3] = t
            c2w = np.linalg.inv(w2c)
        elif any(s in name for s in C2W_SOURCES):
            c2w = np.eye(4)
            c2w[:3, :3] = R
            c2w[:3, 3] = t * scale
            w2c = np.linalg.inv(c2w)
        else:
            raise ValueError(f"unknown camera pose source in file name: {pose_file_name}")
        return cls(fx=float(fx), fy=float(fy), cx=cx, cy=cy, w2c=w2c, c2w=c2w)


def load_cameras(pose_file: str, image_size: Tuple[int, int]) -> List[Camera]:
    with open(pose_file) as f:
        lines = [ln.strip().split(" ") for ln in f if ln.strip()]
    return [Camera.from_entry([float(x) for x in ln], pose_file, image_size) for ln in lines]


def static_camera(image_size: Tuple[int, int], video_length: int) -> List[Camera]:
    """Identity-pose fallback when no trajectory file exists
    (reference ``scripts/pose2vid.py:56-62``)."""
    w, h = image_size
    if w > h:
        entry = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.788079, 1.0]
    else:
        entry = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.788079, 1.0, 1.0]
    cam = Camera.from_entry(entry, "test", image_size)
    return [cam] * video_length


def get_relative_pose(cameras: Sequence[Camera], zero_t_first_frame: bool = True) -> np.ndarray:
    """c2w poses normalized so the first (reference) camera is identity."""
    source_c2w = cameras[0].c2w
    cam_to_origin = 0.0 if zero_t_first_frame else float(np.linalg.norm(source_c2w[:3, 3]))
    target_c2w = np.array([
        [1, 0, 0, 0],
        [0, 1, 0, -cam_to_origin],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ], dtype=np.float64)
    abs2rel = target_c2w @ cameras[0].w2c
    poses = [target_c2w] + [abs2rel @ cam.c2w for cam in cameras[1:]]
    return np.asarray(poses, dtype=np.float32)


def intrinsics_vector(cameras: Sequence[Camera], image_size: Tuple[int, int]) -> np.ndarray:
    """(V, 4) pixel-unit [fx, fy, cx, cy] for each camera."""
    w, h = image_size
    return np.asarray(
        [[c.fx * w, c.fy * h, c.cx * w, c.cy * h] for c in cameras], dtype=np.float32
    )


def ray_condition(K, c2w, H: int, W: int, xp=np):
    """Per-pixel Plücker embedding ``[o x d, d]``.

    Args:
        K: (V, 4) pixel intrinsics [fx, fy, cx, cy].
        c2w: (V, 4, 4) camera-to-world poses.
        xp: numpy or jax.numpy.

    Returns:
        (V, H, W, 6) float32.
    """
    V = K.shape[0]
    dt = xp.float32
    # fp32 throughout (matches the reference's torch fp32 math) and the
    # per-view cross product folded into one (HW, 3) @ (3, 6) matmul:
    # o x d = d_row @ skew(o)^T with o constant per view, so the whole
    # Plücker map is directions @ [R^T skew(o)^T, R^T]. The previous
    # f64 np.cross formulation was 6.5 s/sample at 24x896x512 — 82% of the
    # stage-2 loader's per-sample cost (tools/loader_bench.py, r4).
    j, i = xp.meshgrid(
        xp.arange(H, dtype=dt), xp.arange(W, dtype=dt), indexing="ij"
    )
    i = i.reshape(1, H * W) + 0.5  # x pixel coords
    j = j.reshape(1, H * W) + 0.5  # y pixel coords

    K = K.astype(dt)
    fx, fy, cx, cy = (K[:, k:k + 1] for k in range(4))  # (V, 1)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    zs = xp.ones_like(xs)
    directions = xp.stack([xs, ys, zs], axis=-1)  # (V, HW, 3)
    directions = directions / xp.linalg.norm(directions, axis=-1, keepdims=True)

    R = c2w[:, :3, :3].astype(dt)
    o = c2w[:, :3, 3].astype(dt)
    zero = xp.zeros_like(o[:, 0])
    skew = xp.stack([
        xp.stack([zero, -o[:, 2], o[:, 1]], axis=-1),
        xp.stack([o[:, 2], zero, -o[:, 0]], axis=-1),
        xp.stack([-o[:, 1], o[:, 0], zero], axis=-1),
    ], axis=-2)  # (V, 3, 3) = skew(o)
    rt = xp.swapaxes(R, -1, -2)
    m = xp.concatenate([rt @ xp.swapaxes(skew, -1, -2), rt], axis=-1)  # (V,3,6)
    plucker = directions @ m  # [o x d, d]
    return plucker.reshape(V, H, W, 6).astype(xp.float32)


def camera_file_to_plucker(
    pose_path: str,
    video_length: int,
    ref_idx: int,
    tgt_indices: Sequence[int],
    image_size: Tuple[int, int],
    is_same_video: bool = True,
) -> np.ndarray:
    """Plücker video (len(tgt_indices), H, W, 6) relative to the reference frame.

    ``pose_path`` may be a dwpose/pose-video path; the camera file is found by
    the reference's path substitution (``scripts/pose2vid.py:54``).
    """
    camera_file = (
        pose_path.replace("/dwpose/", "/camera/")
        .replace("/pose_videos/", "/camera/")
        .replace(".mp4", ".txt")
        .replace(".png", ".txt")
    )
    if os.path.exists(camera_file):
        cams = load_cameras(camera_file, image_size)
    else:
        logger.info("camera file not found (%s); using static camera", camera_file)
        cams = static_camera(image_size, video_length)
    first = ref_idx if is_same_video else tgt_indices[0]
    sel = [cams[first]] + [cams[i] for i in tgt_indices]
    K = intrinsics_vector(sel[1:], image_size)
    c2w = get_relative_pose(sel)[1:]
    w, h = image_size
    return ray_condition(K, c2w, h, w)
