"""Contact-map scene encoders used by the CMDM
(reference: models/modules.py:55-167).

Both consume a precomputed 4-level point hierarchy
(strides [1,4,4,4], nsamples [8,16,16,16]) built from the condition point
cloud once per batch — and, during sampling, once per *chain*, outside the
denoising scan.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.hierarchy import LevelGeometry
from .pointtransformer import (
    SCENEMAP_NSAMPLES,
    SCENEMAP_STRIDES,
    PointTransformerDecoder,
    PointTransformerEncoder,
)


class SceneMapEncoder(nn.Module):
    """4-level encoder -> (B, num_points/64, planes[-1]) group tokens
    (reference: models/modules.py:124-167)."""

    planes: Sequence[int] = (32, 64, 128, 256)
    blocks: Sequence[int] = (2, 2, 2, 2)
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, levels: List[LevelGeometry], point_feats: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        x0 = jnp.concatenate([levels[0].xyz, point_feats], axis=-1)
        enc = PointTransformerEncoder(
            self.planes, self.blocks, SCENEMAP_STRIDES, norm=self.norm,
            dtype=self.dtype, name="enc",
        )(levels, x0, train=train)
        return enc[-1]


class SceneMapEncoderDecoder(nn.Module):
    """4-level U-Net -> multi-scale features [x4, x3, x2, x1]
    (coarsest first; reference: models/modules.py:55-122)."""

    planes: Sequence[int] = (32, 64, 128, 256)
    blocks: Sequence[int] = (2, 2, 2, 2)
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, levels: List[LevelGeometry], point_feats: jnp.ndarray, *, train: bool = False
    ) -> List[jnp.ndarray]:
        x0 = jnp.concatenate([levels[0].xyz, point_feats], axis=-1)
        enc = PointTransformerEncoder(
            self.planes, self.blocks, SCENEMAP_STRIDES, norm=self.norm,
            dtype=self.dtype, name="enc",
        )(levels, x0, train=train)
        dec = PointTransformerDecoder(self.planes, norm=self.norm, dtype=self.dtype,
                                      name="dec")(levels, enc, train=train)
        return dec  # [coarsest, ..., finest]


SCENEMAP_GEOMETRY = {"strides": SCENEMAP_STRIDES, "nsamples": SCENEMAP_NSAMPLES}
