from .camera import (
    Camera,
    camera_file_to_plucker,
    get_relative_pose,
    intrinsics_vector,
    load_cameras,
    ray_condition,
    static_camera,
)
from .datasets import (
    DatasetConfig,
    HumanDanceCameraImageDataset,
    HumanDanceCameraVideoDataset,
    clip_preprocess_np,
)
from .loader import Loader, collate
from .samplers import OrientationBatchSampler

# heavier / optional pieces import lazily: .native_video (C++ libav core),
# .meta_tools (meta-info builders), .visualization (matplotlib plots),
# .pose_draw (skeleton rasterizer)

__all__ = [
    "Camera",
    "camera_file_to_plucker",
    "get_relative_pose",
    "intrinsics_vector",
    "load_cameras",
    "ray_condition",
    "static_camera",
    "DatasetConfig",
    "HumanDanceCameraImageDataset",
    "HumanDanceCameraVideoDataset",
    "clip_preprocess_np",
    "Loader",
    "collate",
    "OrientationBatchSampler",
]
