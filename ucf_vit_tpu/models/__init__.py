from ucf_vit_tpu.models.vit import VIT
from ucf_vit_tpu.models.mae import MAE
from ucf_vit_tpu.models.unetr import UNETR
from ucf_vit_tpu.models.sap import SAP
from ucf_vit_tpu.models.diffusion import DiffusionVIT
from ucf_vit_tpu.models.ddpm import DDPMSchedule, ddpm_schedule, q_sample, sample_timesteps

__all__ = [
    "VIT",
    "MAE",
    "UNETR",
    "SAP",
    "DiffusionVIT",
    "DDPMSchedule",
    "ddpm_schedule",
    "q_sample",
    "sample_timesteps",
]
