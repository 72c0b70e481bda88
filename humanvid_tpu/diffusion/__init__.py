from .schedule import (
    NoiseSchedule,
    make_noise_schedule,
    add_noise,
    get_velocity,
    compute_snr,
    min_snr_weights,
)
from .ddim import DDIMState, ddim_set_timesteps, ddim_step

__all__ = [
    "NoiseSchedule",
    "make_noise_schedule",
    "add_noise",
    "get_velocity",
    "compute_snr",
    "min_snr_weights",
    "DDIMState",
    "ddim_set_timesteps",
    "ddim_step",
]
