"""Model + diffusion factories (reference: models/base.py:9-83)."""
from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..diffusion import GaussianDiffusion, create_gaussian_diffusion
from ..utils.registry import MODEL
from .cdm import CDM, build_cdm
from .cmdm import CMDM, build_cmdm

_BUILDERS = {
    "CDM": build_cdm,
    "CMDM": build_cmdm,
}


def create_model(model_cfg: Any) -> nn.Module:
    """Instantiate the registered model named by the config
    (reference: models/base.py:72-76)."""
    name = str(model_cfg.name)
    MODEL.get(name)  # raises with the known list if unknown
    return _BUILDERS[name](model_cfg)


def create_model_and_diffusion(cfg: Any) -> Tuple[nn.Module, GaussianDiffusion]:
    """(reference: models/base.py:72-83 + 55-70)."""
    model = create_model(cfg.model)
    diffusion = create_gaussian_diffusion(cfg.diffusion)
    return model, diffusion
