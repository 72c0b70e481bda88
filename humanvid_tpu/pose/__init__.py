"""Pose extraction subsystem (DWPose replacement, SURVEY §2.4/§2.10).

- ``yolox``: YOLOX-L person detector (flax) + letterbox/NMS host code
- ``rtmpose``: DWPose wholebody SimCC net (flax) + top-down crop/decode
- ``detector``: end-to-end DWposeDetector (detect -> pose -> openpose dict)
- ``onnx_reader``: dependency-free ONNX initializer extraction
- ``smplx``: UE-synthetic SMPL-X 2D keypoints -> COCO-wholebody converter
"""

from .detector import DWposeDetector, load_detector, to_draw_format, wholebody_to_openpose

__all__ = [
    "DWposeDetector",
    "load_detector",
    "to_draw_format",
    "wholebody_to_openpose",
]
