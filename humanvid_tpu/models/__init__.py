from .configs import (
    SD15_UNET,
    SD15_VIDEO_UNET,
    CameraEncoderConfig,
    CLIPVisionConfig,
    PoseGuiderConfig,
    UNetConfig,
    VAEConfig,
)
from .unet import UNetConditionModel
from .pose_guider import PoseGuider
from .camera_encoder import CameraPoseEncoder

__all__ = [
    "UNetConditionModel",
    "PoseGuider",
    "CameraPoseEncoder",
    "UNetConfig",
    "PoseGuiderConfig",
    "CameraEncoderConfig",
    "VAEConfig",
    "CLIPVisionConfig",
    "SD15_UNET",
    "SD15_VIDEO_UNET",
]
