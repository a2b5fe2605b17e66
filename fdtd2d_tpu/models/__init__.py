from fdtd2d_tpu.models.unet import UNet2D
from fdtd2d_tpu.models.diffusion import (
    DDPMSchedule,
    cosine_beta_schedule,
    snr_gamma_weight,
    importance_sample_timesteps,
    loss_weight,
    sample,
)

__all__ = [
    "UNet2D",
    "DDPMSchedule",
    "cosine_beta_schedule",
    "snr_gamma_weight",
    "importance_sample_timesteps",
    "loss_weight",
    "sample",
]
