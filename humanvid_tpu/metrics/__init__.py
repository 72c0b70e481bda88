from .frame import l1, psnr, ssim
from .frechet import activation_statistics, frechet_distance, frechet_from_features
from .clip_sim import frame_consistency

__all__ = [
    "ssim",
    "psnr",
    "l1",
    "activation_statistics",
    "frechet_distance",
    "frechet_from_features",
    "frame_consistency",
    # heavier pieces import lazily: .inception (FID), .i3d (FVD), .lpips,
    # .runner (directory evaluation driver)
]
