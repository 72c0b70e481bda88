"""OpenPose-style skeleton rasterization (DWPose canvas format).

Behavioral parity: reference ``src/dwpose/util.py:79-260`` and the feet
extension ``DWPose/dwpose_utils/util.py:153-175`` — the PoseGuider was trained
on exactly these canvases, so limb topology, the 18-color wheel, the 0.6 body
dimming, HSV hand edges, white face dots and the 6 foot edges must match
pixel-for-pixel. The constants are the standard public OpenPose drawing spec.

Input keypoints are normalized to [0, 1]; invisible points are < eps or -1
(body subset). Canvas is RGB uint8, black background.
"""

from __future__ import annotations

import colorsys
import math
from typing import Dict, Sequence

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False

EPS = 0.01

BODY_LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]

BODY_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

HAND_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
    [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15],
    [15, 16], [0, 17], [17, 18], [18, 19], [19, 20],
]

FOOT_EDGES = [[0, 2], [0, 3], [0, 4], [1, 5], [1, 6], [1, 7]]


def _hsv_rgb(h: float) -> tuple:
    # float components, NOT truncated to int: the reference passes
    # matplotlib.colors.hsv_to_rgb(...)*255 floats straight to cv2
    # (DWPose/dwpose_utils/util.py:131,173) and cv2's own rounding differs
    # from int() truncation by one count on half-values
    r, g, b = colorsys.hsv_to_rgb(h, 1.0, 1.0)
    return (r * 255.0, g * 255.0, b * 255.0)


def draw_bodypose(canvas: np.ndarray, candidate: np.ndarray, subset: np.ndarray,
                  scale: float = 1.0) -> np.ndarray:
    H, W, _ = canvas.shape
    # the DATA-PREP rasterizer the PoseGuider was trained on uses width 5
    # (DWPose/dwpose_utils/util.py:73); the reference's second, inference-era
    # copy (src/dwpose/util.py:84) says 4 but is only used by the bit-rotted
    # train-time validation path
    stickwidth = int(np.round(5 * scale))
    candidate = np.asarray(candidate)
    subset = np.asarray(subset)

    for i in range(17):
        for person in subset:
            index = person[np.array(BODY_LIMB_SEQ[i]) - 1]
            if -1 in index:
                continue
            y = candidate[index.astype(int), 0] * float(W)
            x = candidate[index.astype(int), 1] * float(H)
            mx, my = x.mean(), y.mean()
            length = float(np.hypot(x[0] - x[1], y[0] - y[1]))
            angle = math.degrees(math.atan2(x[0] - x[1], y[0] - y[1]))
            polygon = cv2.ellipse2Poly(
                (int(my), int(mx)), (int(length / 2), stickwidth), int(angle), 0, 360, 1
            )
            cv2.fillConvexPoly(canvas, polygon, BODY_COLORS[i])

    canvas = (canvas * 0.6).astype(np.uint8)

    for i in range(18):
        for person in subset:
            index = int(person[i])
            if index == -1:
                continue
            px, py = candidate[index][0:2]
            cv2.circle(canvas, (int(px * W), int(py * H)),
                       int(np.round(4 * scale)), BODY_COLORS[i], thickness=-1)
    return canvas


def draw_handpose(canvas: np.ndarray, all_hand_peaks: Sequence[np.ndarray],
                  scale: float = 1.0) -> np.ndarray:
    H, W, _ = canvas.shape
    for peaks in all_hand_peaks:
        peaks = np.asarray(peaks)
        for ie, (a, b) in enumerate(HAND_EDGES):
            x1, y1 = (peaks[a] * (W, H)).astype(int)
            x2, y2 = (peaks[b] * (W, H)).astype(int)
            if min(x1, y1, x2, y2) > EPS:
                cv2.line(canvas, (x1, y1), (x2, y2),
                         _hsv_rgb(ie / len(HAND_EDGES)), thickness=2)
        for px, py in peaks:
            x, y = int(px * W), int(py * H)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), int(np.round(4 * scale)),
                           (0, 0, 255), thickness=-1)
    return canvas


def draw_facepose(canvas: np.ndarray, all_lmks: Sequence[np.ndarray],
                  scale: float = 1.0) -> np.ndarray:
    H, W, _ = canvas.shape
    for lmks in all_lmks:
        for px, py in np.asarray(lmks):
            x, y = int(px * W), int(py * H)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), int(np.round(3 * scale)),
                           (255, 255, 255), thickness=-1)
    return canvas


def draw_footpose(canvas: np.ndarray, all_foot_peaks: Sequence[np.ndarray],
                  scale: float = 1.0) -> np.ndarray:
    """Feet (6 points per person: reference extension, README.md:77)."""
    H, W, _ = canvas.shape
    for peaks in all_foot_peaks:
        peaks = np.asarray(peaks)
        for ie, (a, b) in enumerate(FOOT_EDGES):
            if a >= len(peaks) or b >= len(peaks):
                continue
            x1, y1 = (peaks[a] * (W, H)).astype(int)
            x2, y2 = (peaks[b] * (W, H)).astype(int)
            x1 = int(x1 + (x2 - x1) * 0.1)
            y1 = int(y1 + (y2 - y1) * 0.1)
            if min(x1, y1, x2, y2) > EPS:
                cv2.line(canvas, (x1, y1), (x2, y2),
                         _hsv_rgb(ie / len(FOOT_EDGES)), thickness=2)
        for px, py in peaks[2:]:
            x, y = int(px * W), int(py * H)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), int(np.round(4 * scale)),
                           (0, 255, 0), thickness=-1)
    return canvas


def draw_pose(pose: Dict[str, np.ndarray], H: int, W: int,
              scale: float = 1.0) -> np.ndarray:
    """Rasterize a pose dict {bodies:{candidate,subset}, hands, faces[, feet]}
    onto a black (H, W, 3) RGB canvas.

    ``scale`` is the UE-synthetic data-prep convention
    (DWPose/dwpose_utils/smplx2openpose.py:21-25): stroke widths scale with
    ``max(H, W) / 1920`` so skeletons render consistently across
    resolutions. The real-video prep path uses scale 1."""
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    bodies = pose["bodies"]
    canvas = draw_bodypose(canvas, bodies["candidate"], bodies["subset"], scale)
    if "hands" in pose and pose["hands"] is not None:
        canvas = draw_handpose(canvas, pose["hands"], scale)
    if "faces" in pose and pose["faces"] is not None:
        canvas = draw_facepose(canvas, pose["faces"], scale)
    if "feet" in pose and pose["feet"] is not None:
        canvas = draw_footpose(canvas, pose["feet"], scale)
    return canvas
