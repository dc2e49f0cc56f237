from .schedule import get_named_beta_schedule, space_timesteps, betas_for_alpha_bar
from .gaussian import (
    DiffusionConfig,
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    LossType,
    create_gaussian_diffusion,
)
from .resample import create_schedule_sampler, UniformSampler, LossSecondMomentResampler

__all__ = [
    "get_named_beta_schedule",
    "space_timesteps",
    "betas_for_alpha_bar",
    "DiffusionConfig",
    "GaussianDiffusion",
    "ModelMeanType",
    "ModelVarType",
    "LossType",
    "create_gaussian_diffusion",
    "create_schedule_sampler",
    "UniformSampler",
    "LossSecondMomentResampler",
]
