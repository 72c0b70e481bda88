"""DWPose wholebody detector pipeline (detection -> pose -> skeleton dict).

Behavioral parity: reference ``src/dwpose/wholebody.py`` + ``DWPose/
dwpose_utils/__init__.py:39-70`` — YOLOX-L person boxes, per-box SimCC
wholebody inference, COCO-wholebody(133) -> OpenPose remap with a synthesized
neck joint, confidence masking at 0.3, multi-person support
(``num_people=-1``), and the repo's feet extension (6 foot points drawn,
``DWPose/dwpose_utils/util.py:153``, README.md:77).

COCO-wholebody layout: 0-16 body, 17-22 feet, 23-90 face, 91-111 left hand,
112-132 right hand.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.pose_draw import draw_pose
from . import rtmpose, yolox

# COCO(17) -> OpenPose(18) permutation with neck (index 1) synthesized from
# the shoulder midpoint.
_OPENPOSE_FROM_COCO = [0, -1, 6, 8, 10, 5, 7, 9, 12, 14, 16, 11, 13, 15, 2, 1, 4, 3]
CONF_THR = 0.3


def wholebody_to_openpose(kpts: np.ndarray, scores: np.ndarray) -> Dict:
    """(n, 133, 2) pixel keypoints + (n, 133) scores -> draw_pose dict with
    NORMALIZED coordinates filled by the caller (this returns pixel coords)."""
    n = kpts.shape[0]
    bodies = np.zeros((n, 18, 2), np.float32)
    body_scores = np.zeros((n, 18), np.float32)
    for i, src in enumerate(_OPENPOSE_FROM_COCO):
        if src >= 0:
            bodies[:, i] = kpts[:, src]
            body_scores[:, i] = scores[:, src]
    bodies[:, 1] = (kpts[:, 5] + kpts[:, 6]) / 2.0  # neck
    body_scores[:, 1] = np.minimum(scores[:, 5], scores[:, 6])

    return {
        "bodies": bodies,
        "body_scores": body_scores,
        "feet": kpts[:, 17:23],
        "feet_scores": scores[:, 17:23],
        "faces": kpts[:, 23:91],
        "face_scores": scores[:, 23:91],
        "hands": np.concatenate([kpts[:, 91:112], kpts[:, 112:133]], axis=0),
        "hand_scores": np.concatenate([scores[:, 91:112], scores[:, 112:133]], axis=0),
    }


def to_draw_format(pose: Dict, width: int, height: int,
                   conf_thr: float = CONF_THR) -> Dict:
    """Pixel pose dict -> normalized draw_pose inputs with masking: body
    joints below threshold get subset -1; other groups get coords -1."""
    wh = np.array([width, height], np.float32)
    n = pose["bodies"].shape[0]
    candidate = (pose["bodies"] / wh).reshape(-1, 2)
    subset = np.arange(n * 18, dtype=np.float32).reshape(n, 18)
    subset[pose["body_scores"] < conf_thr] = -1

    def masked(coords, scores):
        out = coords / wh
        out[scores < conf_thr] = -1
        return out

    return {
        "bodies": {"candidate": candidate, "subset": subset},
        "feet": masked(pose["feet"].copy(), pose["feet_scores"]),
        "faces": masked(pose["faces"].copy(), pose["face_scores"]),
        "hands": masked(pose["hands"].copy(), pose["hand_scores"]),
    }


class DWposeDetector:
    """frame RGB uint8 -> (skeleton canvas uint8, pose dict).

    ``det_variables`` / ``pose_variables`` are converted flax variables (from
    torch checkpoints or ONNX initializers via ``pose.onnx_reader`` +
    ``load_torch_state_dict``). ``num_people`` < 0 keeps every detection
    (reference multi-person mode).
    """

    def __init__(self, det_variables, pose_variables, num_people: int = -1):
        import jax

        self.det_model = yolox.YOLOX()
        self.pose_model = rtmpose.DWPoseModel()
        self.det_variables = det_variables
        self.pose_variables = pose_variables
        self.num_people = num_people
        self._det_fn = jax.jit(partial(self.det_model.apply, det_variables))
        self._pose_fn = jax.jit(partial(self.pose_model.apply, pose_variables))

    def detect_boxes(self, frame_rgb: np.ndarray, score_thr: float = 0.5) -> np.ndarray:
        """Person boxes, largest first.

        Reference semantics (DWPose/dwpose_utils/onnxdet.py:103-144): NMS,
        keep person boxes with score > 0.5, sort by box area descending,
        truncate to num_people.
        """
        bgr = frame_rgb[..., ::-1]
        inp, ratio = yolox.letterbox(bgr)
        pred = np.asarray(self._det_fn(inp[None]))[0]
        boxes = yolox.postprocess_person(pred, ratio, score_thr)
        if len(boxes):
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            boxes = boxes[np.argsort(areas)[::-1]]
        if self.num_people > 0:
            boxes = boxes[:self.num_people]
        return boxes

    def estimate_poses(self, frame_rgb: np.ndarray, boxes: np.ndarray) -> Tuple:
        bgr = np.ascontiguousarray(frame_rgb[..., ::-1])
        all_kpts, all_scores = [], []
        for box in boxes:
            center, scale = rtmpose.bbox_to_center_scale(box)
            crop, (c, s) = rtmpose.crop_affine(bgr, center, scale)
            x = rtmpose.normalize_crop(crop)[None]
            xl, yl = self._pose_fn(x)
            kpts, scores = rtmpose.simcc_decode(np.asarray(xl), np.asarray(yl))
            all_kpts.append(rtmpose.crop_to_image(kpts[0], c, s))
            all_scores.append(scores[0])
        if not all_kpts:
            return np.zeros((0, 133, 2), np.float32), np.zeros((0, 133), np.float32)
        return np.stack(all_kpts), np.stack(all_scores)

    def __call__(self, frame_rgb: np.ndarray) -> Tuple[np.ndarray, Dict]:
        h, w = frame_rgb.shape[:2]
        boxes = self.detect_boxes(frame_rgb)
        kpts, scores = self.estimate_poses(frame_rgb, boxes)
        pose_px = wholebody_to_openpose(kpts, scores)
        drawable = to_draw_format(pose_px, w, h)
        canvas = draw_pose(drawable, h, w)
        return canvas, pose_px


def load_detector(
    yolox_path: Optional[str] = None,
    dwpose_path: Optional[str] = None,
    num_people: int = -1,
) -> DWposeDetector:
    """Build a detector from checkpoint files (.pth / .onnx)."""
    def load(path, converter):
        if path.endswith(".onnx"):
            from .onnx_reader import read_onnx_initializers
            sd = read_onnx_initializers(path)
        else:
            import torch
            sd = torch.load(path, map_location="cpu", weights_only=True)
            sd = sd.get("state_dict", sd)
            sd = {k: v.numpy() for k, v in sd.items()}
        return converter(sd)

    det_vars = load(yolox_path, yolox.load_torch_state_dict)
    pose_vars = load(dwpose_path, rtmpose.load_torch_state_dict)
    return DWposeDetector(det_vars, pose_vars, num_people)
