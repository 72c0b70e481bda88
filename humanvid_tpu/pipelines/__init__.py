from .context import all_step_windows, ordered_halving, uniform_windows
from .system import CamAnimate, CamAnimateConfig, tiny_config
from .pose2img import Pose2ImagePipeline
from .pose2vid import Pose2VideoPipeline, decode_latents

__all__ = [
    "CamAnimate",
    "CamAnimateConfig",
    "tiny_config",
    "Pose2ImagePipeline",
    "Pose2VideoPipeline",
    "decode_latents",
    "all_step_windows",
    "uniform_windows",
    "ordered_halving",
]
