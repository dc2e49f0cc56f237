from .base import create_model, create_model_and_diffusion
from .cdm import CDM, build_cdm
from .cmdm import CMDM, build_cmdm
from .text import create_text_encoder, get_lang_feat_dim_type

__all__ = [
    "create_model",
    "create_model_and_diffusion",
    "CDM",
    "build_cdm",
    "CMDM",
    "build_cmdm",
    "create_text_encoder",
    "get_lang_feat_dim_type",
]
