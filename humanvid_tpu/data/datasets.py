"""Training datasets: image (stage 1) and video (stage 2), camera-conditioned.

Behavioral parity: reference ``src/dataset/dance_image_h_v_camera.py:166-395``
and ``dance_video_h_v_camera.py:51-314`` —

- meta JSON entries ``{video_path, kps_path, start_frame, end_frame}`` split by
  orientation; a global index addresses horizontal entries first
  (``:240-248``);
- stage 1: random ref frame + target frame with a ``sample_margin`` exclusion
  window (``:288-300``);
- stage 2: ``n_sample_frames`` at a random stride in [2, sample_rate], ref
  frame drawn OUTSIDE the clip when possible (``dance_video:183-207``);
- orientation-dependent target size (large x small vs small x large);
- shared-RNG random-resize-crop applied identically to image/pose frames
  (``:317-326``): scale in img_scale=(1.0, 1.1), one crop offset per sample;
- target/ref normalized to [-1, 1], pose kept in [0, 1], CLIP ref preprocessed
  to 224 with CLIP mean/std, Plücker built from the camera file (path
  substitution videos->camera).

NOT replicated (destructive reference behaviors, SURVEY §5): appending to
``broken_kps_videos.txt`` and ``os.remove`` of corrupt files. Broken samples
are logged via ``logging`` and resampled (bounded retries).

Everything is numpy + cv2 on the host; batches are plain dicts of numpy arrays
ready for ``jax.device_put`` (see ``loader.Loader`` for prefetching).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .camera import get_relative_pose, intrinsics_vector, load_cameras, ray_condition
from .video_io import get_frame_count, read_frames

logger = logging.getLogger(__name__)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _camera_file(video_path: str) -> str:
    return (
        video_path.replace("/videos/", "/camera/")
        .replace("/mp4/", "/camera/")
        .replace(".mp4", ".txt")
    )


def random_resize_crop_params(
    rng: random.Random, src_hw: Tuple[int, int], dst_wh: Tuple[int, int],
    scale_range: Tuple[float, float] = (1.0, 1.1),
):
    """One (resize, crop) decision shared by all frames of a sample.

    Reference ``RandomResizeCrop`` (``dance_image_h_v_camera.py:132-164``):
    aspect-preserving cover-resize scaled by a random factor, then CENTER
    crop — no anisotropic squeeze and no random translation, so the Plücker
    rays' centered intrinsics stay aligned with the pixels.
    """
    scale = rng.uniform(*scale_range)
    h, w = src_hw
    dst_w, dst_h = dst_wh
    aspect = w / h
    if aspect < 1:  # portrait source
        new_w = int(dst_w * scale)
        new_h = int(new_w / aspect)
        if new_h < dst_h:
            new_h = dst_h
            new_w = int(new_h * aspect)
            if new_w < dst_w:
                raise ValueError(f"source aspect {aspect:.3f} cannot cover {dst_wh}")
    else:
        new_h = int(dst_h * scale)
        new_w = int(new_h * aspect)
        if new_w < dst_w:
            new_w = dst_w
            new_h = int(new_w / aspect)
            if new_h < dst_h:
                raise ValueError(f"source aspect {aspect:.3f} cannot cover {dst_wh}")
    x0 = (new_w - dst_w) // 2
    y0 = (new_h - dst_h) // 2
    return (new_w, new_h, x0, y0)


def apply_resize_crop(frames: np.ndarray, params, dst_wh: Tuple[int, int]) -> np.ndarray:
    """(f, H, W, 3) uint8 -> (f, dst_h, dst_w, 3) uint8 via shared resize+crop.

    PIL BILINEAR (antialiased), matching the reference's ``TF.resize`` on PIL
    frames (dance_image_h_v_camera.py:157) — see resize_frames for why cv2
    interpolation is not equivalent.
    """
    from PIL import Image

    rw, rh, x0, y0 = params
    dst_w, dst_h = dst_wh
    out = np.empty((frames.shape[0], dst_h, dst_w, frames.shape[-1]), frames.dtype)
    for i, f in enumerate(frames):
        r = np.asarray(Image.fromarray(f).resize((rw, rh), Image.BILINEAR))
        out[i] = r[y0:y0 + dst_h, x0:x0 + dst_w]
    return out


def clip_preprocess_np(image: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 (H, W, 3) -> CLIP-normalized float32 (size, size, 3).

    Matches ``transformers.CLIPImageProcessor()`` defaults exactly (the
    reference feeds PIL frames through it,
    ``src/dataset/dance_image_h_v_camera.py:201,329``): shortest side to
    ``size`` with PIL BICUBIC (antialiased — cv2.INTER_CUBIC is NOT and
    diverges by ~0.3 in normalized units), center crop, /255, CLIP mean/std.
    """
    return (clip_crop_raw(image, size) - CLIP_MEAN) / CLIP_STD


@dataclasses.dataclass
class DatasetConfig:
    train_size_large: int = 896
    train_size_small: int = 512
    img_scale: Tuple[float, float] = (1.0, 1.1)
    sample_margin: int = 30          # stage 1
    n_sample_frames: int = 24        # stage 2
    sample_rate: int = 4             # stage 2 max stride
    clip_size: int = 224
    max_retries: int = 16


class _MetaIndexed:
    """Shared meta loading + orientation-aware indexing."""

    def __init__(self, horizontal_meta: Sequence[str], vertical_meta: Sequence[str],
                 config: DatasetConfig):
        self.config = config
        self.horizontal: List[dict] = []
        self.vertical: List[dict] = []
        for p in horizontal_meta:
            if p:
                self.horizontal.extend(json.load(open(p)))
        for p in vertical_meta:
            if p:
                self.vertical.extend(json.load(open(p)))

    def __len__(self) -> int:
        return len(self.horizontal) + len(self.vertical)

    @property
    def num_horizontal(self) -> int:
        return len(self.horizontal)

    def meta_at(self, index: int) -> dict:
        if index < len(self.horizontal):
            return self.horizontal[index]
        return self.vertical[index - len(self.horizontal)]

    def resample_index(self, rng: random.Random, index: int) -> int:
        if index < len(self.horizontal):
            return rng.randrange(len(self.horizontal))
        return len(self.horizontal) + rng.randrange(len(self.vertical))

    def _img_size(self, w: int, h: int) -> Tuple[int, int]:
        c = self.config
        return ((c.train_size_large, c.train_size_small) if w > h
                else (c.train_size_small, c.train_size_large))


class HumanDanceCameraImageDataset(_MetaIndexed):
    """Stage-1 samples: {tgt, ref, clip, pose, plucker} single-frame."""

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = random.Random()
        for _ in range(self.config.max_retries):
            try:
                return self._load(index, rng)
            except Exception as e:  # noqa: BLE001 — resample on any IO/shape error
                logger.warning("bad sample %d (%s); resampling", index, e)
                index = self.resample_index(rng, index)
        raise RuntimeError("too many consecutive broken samples")

    def _load(self, index: int, rng: random.Random) -> Dict[str, np.ndarray]:
        cfg = self.config
        meta = self.meta_at(index)
        video_path, kps_path = meta["video_path"], meta["kps_path"]
        start, end = meta["start_frame"], meta["end_frame"]
        segment = end - start

        ref_idx = rng.randint(start, end - 1)
        margin = min(cfg.sample_margin, segment)
        lo, hi = max(start, ref_idx - margin), min(end - 1, ref_idx + margin)
        valid = [i for i in range(start, end) if not (lo <= i <= hi)]
        tgt_idx = rng.choice(valid) if valid else rng.randint(start, end - 1)

        frames = read_frames(video_path, indices=[ref_idx, tgt_idx])
        ref_img, tgt_img = frames[0], frames[1]
        pose_img = read_frames(kps_path, indices=[tgt_idx])[0]

        h, w = tgt_img.shape[:2]
        img_size = self._img_size(w, h)  # (W, H)
        rc = random_resize_crop_params(rng, (h, w), img_size, cfg.img_scale)

        tgt = apply_resize_crop(tgt_img[None], rc, img_size)[0]
        ref = apply_resize_crop(ref_img[None], rc, img_size)[0]
        pose = apply_resize_crop(pose_img[None], rc, img_size)[0]
        clip_img = clip_preprocess_np(ref_img, cfg.clip_size)

        cams = load_cameras(_camera_file(video_path), img_size)
        sel = [cams[ref_idx], cams[tgt_idx]]
        K = intrinsics_vector(sel[1:], img_size)
        c2w = get_relative_pose(sel)[1:]
        plucker = ray_condition(K, c2w, img_size[1], img_size[0])[0]

        return {
            "tgt": tgt.astype(np.float32) / 127.5 - 1.0,
            "ref": ref.astype(np.float32) / 127.5 - 1.0,
            "clip": clip_img,
            "pose": pose.astype(np.float32) / 255.0,
            "plucker": plucker,
        }


class HumanDanceCameraVideoDataset(_MetaIndexed):
    """Stage-2 samples: {tgt (f,...), ref, clip, pose (f,...), plucker (f,...)}."""

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = random.Random()
        for _ in range(self.config.max_retries):
            try:
                return self._load(index, rng)
            except Exception as e:  # noqa: BLE001
                logger.warning("bad sample %d (%s); resampling", index, e)
                index = self.resample_index(rng, index)
        raise RuntimeError("too many consecutive broken samples")

    def _load(self, index: int, rng: random.Random) -> Dict[str, np.ndarray]:
        cfg = self.config
        meta = self.meta_at(index)
        video_path, kps_path = meta["video_path"], meta["kps_path"]
        start, end = meta["start_frame"], meta["end_frame"]
        n = cfg.n_sample_frames

        # reference stride sampling (dance_video_h_v_camera.py:183-188):
        # random stride in [2, min(max_rate, sample_rate)], falling back to a
        # contiguous stride-1 clip when the segment is too short — never a
        # clamped/stuttered tail
        segment = end - start
        max_rate = (segment - 1) // max(n - 1, 1)
        if max_rate > 1:
            stride = rng.randint(2, max(2, min(max_rate, cfg.sample_rate)))
        else:
            stride = 1
        span = (n - 1) * stride + 1
        if span > segment:
            raise ValueError(f"segment {segment} too short for {n} frames")
        clip_start = rng.randint(start, end - span)
        tgt_indices = [clip_start + i * stride for i in range(n)]

        # ref frame outside the clip when possible (dance_video:199-207)
        outside = [i for i in range(start, end)
                   if i < tgt_indices[0] or i > tgt_indices[-1]]
        ref_idx = rng.choice(outside) if outside else rng.randint(start, end - 1)

        tgt_frames = read_frames(video_path, indices=tgt_indices)
        ref_img = read_frames(video_path, indices=[ref_idx])[0]
        pose_frames = read_frames(kps_path, indices=tgt_indices)

        h, w = tgt_frames.shape[1:3]
        img_size = self._img_size(w, h)
        rc = random_resize_crop_params(rng, (h, w), img_size, cfg.img_scale)

        tgt = apply_resize_crop(tgt_frames, rc, img_size)
        ref = apply_resize_crop(ref_img[None], rc, img_size)[0]
        pose = apply_resize_crop(pose_frames, rc, img_size)
        clip_img = clip_preprocess_np(ref_img, cfg.clip_size)

        cams = load_cameras(_camera_file(video_path), img_size)
        sel = [cams[ref_idx]] + [cams[i] for i in tgt_indices]
        K = intrinsics_vector(sel[1:], img_size)
        c2w = get_relative_pose(sel)[1:]
        plucker = ray_condition(K, c2w, img_size[1], img_size[0])

        return {
            "tgt": tgt.astype(np.float32) / 127.5 - 1.0,
            "ref": ref.astype(np.float32) / 127.5 - 1.0,
            "clip": clip_img,
            "pose": pose.astype(np.float32) / 255.0,
            "plucker": plucker,
        }


def clip_crop_raw(image: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 (H, W, 3) -> raw [0,1] float32 (size, size, 3) via CLIP's
    short-side resize + center crop — WITHOUT normalization (the pipelines
    normalize internally). The inference CLIs use this so conditioning
    matches training/`clip_preprocess_np` instead of an aspect-distorting
    direct resize."""
    from PIL import Image

    h, w = image.shape[:2]
    if h < w:
        new_h, new_w = size, int(size * w / h)
    else:
        new_h, new_w = int(size * h / w), size
    r = np.asarray(
        Image.fromarray(image).resize((new_w, new_h), Image.BICUBIC))
    rh, rw = r.shape[:2]
    y0, x0 = (rh - size) // 2, (rw - size) // 2
    return r[y0:y0 + size, x0:x0 + size].astype(np.float32) / 255.0
