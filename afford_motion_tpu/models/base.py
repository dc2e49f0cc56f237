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
    """(reference: models/base.py:72-83 + 55-70).

    ``model.dtype=float32`` is the documented full-precision restore flag
    (PARITY.md) — on TPU that must also pin the matmul precision, because
    the MXU default silently rounds f32 operands to bf16 (the round-3/4
    ``_dot_precision`` bug class). Scoped here so every entry point
    (train/test/sample/ddp) inherits it; the shipped bf16 default is
    unaffected."""
    import jax

    if str(cfg.model.get("dtype", "bfloat16")) == "float32":
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        # explicit reset: the config is process-global and A/B harnesses
        # build several models per process (bf16 legs must not inherit
        # the f32 leg's 6-pass matmuls — nor vice versa)
        jax.config.update("jax_default_matmul_precision", None)
    model = create_model(cfg.model)
    diffusion = create_gaussian_diffusion(cfg.diffusion)
    return model, diffusion
