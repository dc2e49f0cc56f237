"""PointTransformer in dense (B, N, C) layout on precomputed hierarchies.

Capability-equivalent to the reference backbone
(reference: models/scene_models/pointtransformer.py:9-291) with the
TPU-first restructuring from SURVEY.md §2.9/§7:

- all geometry (FPS / kNN / 3-NN interpolation indices) comes from a
  ``LevelGeometry`` list built once per batch (ops/hierarchy.py) instead of
  being recomputed inside every layer;
- the flattened-with-offsets ragged layout becomes dense per-sample arrays
  (every shipped config uses fixed num_points);
- vector self-attention / grouping / pooling are gathers + reshapes + MXU
  matmuls that XLA fuses.

Normalization: the reference uses BatchNorm1d throughout
(pointtransformer.py:19-22,50) with SyncBN under DDP (train_ddp.py:63).
Here BatchNorm stats are computed over all non-feature axes; under
jit-with-sharding data parallelism XLA computes the cross-device reduction
automatically (GSPMD "sync BN" for free). ``norm='layer'`` is available as
a documented deviation flag.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.hierarchy import LevelGeometry


def bgather(x: jnp.ndarray, idx: jnp.ndarray, banded: bool = False,
            starts: Optional[jnp.ndarray] = None,
            window: int = 0) -> jnp.ndarray:
    """Batched neighbourhood gather: x (B, N, C), idx (B, ...) -> (B, ..., C).

    On TPU, 3-D (B, M, K) index gathers route to a Pallas kernel: with
    ``banded=True`` (indices produced by the windowed kNN on curve-ordered
    clouds — callers pass ``geom.banded``) the banded one-hot-matmul kernel
    (ops/pallas/banded.py — MXU work instead of a scalar-issue-bound row
    loop), else the row-copy kernel (ops/pallas/gather.py — 2.4x fwd /
    3.5x bwd vs the XLA gather). ``starts`` (B, G) are the per-item window
    starts the indices were produced with (LevelGeometry.down_starts /
    up_starts; None = proportional policy); ``window`` the W0 width knob
    they were built with (``LevelGeometry.window``; 0 = env/default)."""
    if idx.ndim == 3 and jax.default_backend() == "tpu":
        from ..ops.pallas import banded as banded_mod
        from ..ops.pallas.gather import gather_rows

        if banded and banded_mod.gather_supports(
            idx.shape[1], x.shape[1], x.shape[2], idx.shape[2],
            x.dtype.itemsize, window,
        ):
            return banded_mod.gather_banded(x, idx.astype(jnp.int32), starts,
                                            window)
        return gather_rows(x, idx.astype(jnp.int32))
    return jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)


class PointNorm(nn.Module):
    """Per-channel normalization over all non-feature axes.

    Stats/affine always compute in float32 (bf16 accumulation over the
    millions of (B, N, K) positions would lose precision); the result is
    cast back to ``dtype``."""

    kind: str = "batch"  # 'batch' | 'layer'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.kind == "batch":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
        elif self.kind == "layer":
            y = nn.LayerNorm(dtype=jnp.float32)(x)
        else:
            raise ValueError(self.kind)
        return y.astype(self.dtype)


class PointTransformerLayer(nn.Module):
    """Vector self-attention over kNN neighbourhoods
    (reference: pointtransformer.py:9-38)."""

    out_planes: int
    share_planes: int = 8
    norm: str = "batch"
    dtype: Any = jnp.float32
    # indices come from the banded windowed kNN (set from geom.banded by
    # the enclosing block/stage — a static attr, not a call arg, so the
    # remat path stays clean); window = the W0 they were built with
    banded: bool = False
    window: int = 0

    @nn.compact
    def __call__(self, p, x, knn_idx, *, train: bool = False):
        C, s = self.out_planes, self.share_planes
        B, N, K = knn_idx.shape
        p = p.astype(self.dtype)
        x = x.astype(self.dtype)

        x_q = nn.Dense(C, dtype=self.dtype)(x)
        # xyz, k and v share neighbour indices. TPU row-gathers are
        # per-row-overhead bound (a 3-channel gather costs as much as a
        # 64-channel one), so everything is packed into ONE gather.
        packed = bgather(
            jnp.concatenate(
                [p, nn.Dense(C, dtype=self.dtype)(x), nn.Dense(C, dtype=self.dtype)(x)],
                axis=-1,
            ), knn_idx, self.banded, window=self.window
        )                                                    # (B, N, K, 3+2C)
        rel = packed[..., :3] - p[:, :, None, :]             # (B, N, K, 3)
        x_k, x_v = packed[..., 3: 3 + C], packed[..., 3 + C:]

        # positional MLP: Dense(3) -> BN -> ReLU -> Dense(C)
        p_r = nn.Dense(3, dtype=self.dtype)(rel)
        p_r = nn.relu(PointNorm(self.norm, dtype=self.dtype)(p_r, train=train))
        p_r = nn.Dense(C, dtype=self.dtype)(p_r)

        # attention-weight MLP on (k - q + p_r), shared-plane reduced
        w = x_k - x_q[:, :, None, :] + p_r
        w = nn.relu(PointNorm(self.norm, dtype=self.dtype)(w, train=train))
        w = nn.Dense(C // s, dtype=self.dtype)(w)
        w = nn.relu(PointNorm(self.norm, dtype=self.dtype)(w, train=train))
        w = nn.Dense(C // s, dtype=self.dtype)(w)
        # softmax over neighbours in f32
        w = nn.softmax(w.astype(jnp.float32), axis=2).astype(self.dtype)

        # each group of `s` channel-planes shares one weight column
        agg = (x_v + p_r).reshape(B, N, K, s, C // s) * w[:, :, :, None, :]
        return agg.sum(axis=2).reshape(B, N, C)


class TransitionDown(nn.Module):
    """Strided downsampling: FPS + kNN grouping + linear + max-pool
    (reference: pointtransformer.py:41-69). Geometry comes precomputed."""

    out_planes: int
    stride: int = 1
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parent_xyz, x, geom: LevelGeometry, *, train: bool = False):
        x = x.astype(self.dtype)
        if self.stride == 1:
            h = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype)(x)
            return nn.relu(PointNorm(self.norm, dtype=self.dtype)(h, train=train))
        new_xyz = geom.xyz.astype(self.dtype)
        # single packed gather (see PointTransformerLayer note)
        packed = bgather(
            jnp.concatenate([parent_xyz.astype(self.dtype), x], axis=-1),
            geom.down_knn_idx, geom.banded, geom.down_starts, geom.window,
        )
        rel = packed[..., :3] - new_xyz[:, :, None, :]
        grouped = jnp.concatenate([rel, packed[..., 3:]], axis=-1)
        h = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype)(grouped)
        h = nn.relu(PointNorm(self.norm, dtype=self.dtype)(h, train=train))
        return h.max(axis=2)


class TransitionUp(nn.Module):
    """Upsampling fusion (reference: pointtransformer.py:72-99).

    Head form (``coarse_x is None``): concat with a global context vector.
    Fusion form: linear(fine) + 3-NN-interpolated linear(coarse), with the
    interpolation indices/weights from the coarse level's geometry.
    """

    out_planes: int
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        coarse_x: Optional[jnp.ndarray] = None,
        coarse_geom: Optional[LevelGeometry] = None,
        *,
        train: bool = False,
    ):
        x = x.astype(self.dtype)
        if coarse_x is None:
            C = self.out_planes
            g = nn.relu(nn.Dense(C, dtype=self.dtype)(x.mean(axis=1, keepdims=True)))
            h = jnp.concatenate([x, jnp.broadcast_to(g, x.shape[:-1] + (C,))], axis=-1)
            h = nn.Dense(C, dtype=self.dtype)(h)
            return nn.relu(PointNorm(self.norm, dtype=self.dtype)(h, train=train))

        a = nn.Dense(self.out_planes, dtype=self.dtype)(x)
        a = nn.relu(PointNorm(self.norm, dtype=self.dtype)(a, train=train))
        b = nn.Dense(self.out_planes, dtype=self.dtype)(coarse_x.astype(self.dtype))
        b = nn.relu(PointNorm(self.norm, dtype=self.dtype)(b, train=train))
        gathered = bgather(b, coarse_geom.up_idx, coarse_geom.banded,
                           coarse_geom.up_starts,
                           coarse_geom.window)  # (B, N_fine, 3, C)
        b_up = jnp.einsum(
            "bnkc,bnk->bnc", gathered, coarse_geom.up_weight.astype(self.dtype)
        )
        return a + b_up


class PointTransformerBlock(nn.Module):
    """Residual bottleneck around the vector-attention layer
    (reference: pointtransformer.py:102-123)."""

    planes: int
    share_planes: int = 8
    norm: str = "batch"
    dtype: Any = jnp.float32
    # remat path: ``train`` must not be a call argument (flax's lifted
    # checkpoint traces all call args), so it can be pinned here instead
    static_train: bool = False
    banded: bool = False  # knn_idx came from the banded windowed kNN
    window: int = 0       # ...with this W0 width knob

    @nn.compact
    def __call__(self, p, x, knn_idx, train: Optional[bool] = None):
        train = self.static_train if train is None else train
        x = x.astype(self.dtype)
        identity = x
        h = nn.Dense(self.planes, use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(PointNorm(self.norm, dtype=self.dtype)(h, train=train))
        h = PointTransformerLayer(self.planes, self.share_planes, self.norm,
                                  dtype=self.dtype, banded=self.banded,
                                  window=self.window)(
            p, h, knn_idx, train=train)
        h = nn.relu(PointNorm(self.norm, dtype=self.dtype)(h, train=train))
        h = nn.Dense(self.planes, use_bias=False, dtype=self.dtype)(h)
        h = PointNorm(self.norm, dtype=self.dtype)(h, train=train)
        return nn.relu(h + identity)


class PointEncoderStage(nn.Module):
    """TransitionDown + (blocks-1) PointTransformerBlocks — one 'enc_i'."""

    planes: int
    blocks: int
    stride: int
    share_planes: int = 8
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parent_xyz, x, geom: LevelGeometry, *, train: bool = False):
        x = TransitionDown(self.planes, self.stride, self.norm, dtype=self.dtype)(
            parent_xyz, x, geom, train=train
        )
        # NOTE: block-level remat (jax.checkpoint of the attention blocks)
        # was measured and REJECTED on chip — 8.48 vs 9.74 steps/s, the
        # recompute cost exceeds the HBM savings at these activation sizes
        # (docs/PERF.md negative-results ledger; former AM_REMAT_PT flag).
        for _ in range(1, self.blocks):
            x = PointTransformerBlock(self.planes, self.share_planes, self.norm,
                                      dtype=self.dtype, banded=geom.banded,
                                      window=geom.window)(
                geom.xyz, x, geom.knn_idx, train
            )
        return x


class PointDecoderStage(nn.Module):
    """TransitionUp + (blocks-1) PointTransformerBlocks — one 'dec_i'."""

    planes: int
    blocks: int = 2
    share_planes: int = 8
    norm: str = "batch"
    is_head: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        geom: LevelGeometry,
        coarse_x: Optional[jnp.ndarray] = None,
        coarse_geom: Optional[LevelGeometry] = None,
        *,
        train: bool = False,
    ):
        x = TransitionUp(self.planes, self.norm, dtype=self.dtype)(
            x, None if self.is_head else coarse_x,
            None if self.is_head else coarse_geom, train=train,
        )
        for _ in range(1, self.blocks):
            x = PointTransformerBlock(self.planes, self.share_planes, self.norm,
                                      dtype=self.dtype, banded=geom.banded,
                                      window=geom.window)(
                geom.xyz, x, geom.knn_idx, train=train
            )
        return x


class PointTransformerEncoder(nn.Module):
    """Generic multi-stage encoder; returns per-level feature list."""

    planes: Sequence[int]
    blocks: Sequence[int]
    strides: Sequence[int]
    share_planes: int = 8
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, levels: List[LevelGeometry], feats: jnp.ndarray, *, train: bool = False
    ) -> List[jnp.ndarray]:
        outs = []
        x = feats
        parent_xyz = levels[0].xyz
        for i, (plane, nblocks, stride) in enumerate(
            zip(self.planes, self.blocks, self.strides)
        ):
            x = PointEncoderStage(plane, nblocks, stride, self.share_planes, self.norm,
                                  dtype=self.dtype)(
                parent_xyz, x, levels[i], train=train
            )
            outs.append(x)
            parent_xyz = levels[i].xyz
        return outs


class PointTransformerDecoder(nn.Module):
    """Generic U-Net decoder over encoder outputs; returns per-level list
    coarsest-first ([x_top, ..., x_0])."""

    planes: Sequence[int]
    share_planes: int = 8
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, levels: List[LevelGeometry], enc_feats: List[jnp.ndarray],
        *, train: bool = False,
    ) -> List[jnp.ndarray]:
        L = len(enc_feats)
        outs = []
        x = PointDecoderStage(self.planes[-1], 2, self.share_planes, self.norm,
                              is_head=True, dtype=self.dtype)(
            enc_feats[-1], levels[-1], train=train
        )
        outs.append(x)
        for i in range(L - 2, -1, -1):
            x = PointDecoderStage(self.planes[i], 2, self.share_planes, self.norm,
                                  dtype=self.dtype)(
                enc_feats[i], levels[i], coarse_x=x, coarse_geom=levels[i + 1],
                train=train,
            )
            outs.append(x)
        return outs


# Strides/nsamples of the two canonical configurations.
SEG_STRIDES: Tuple[int, ...] = (1, 4, 4, 4, 4)
SEG_NSAMPLES: Tuple[int, ...] = (8, 16, 16, 16, 16)
SEG_PLANES: Tuple[int, ...] = (32, 64, 128, 256, 512)
SEG_BLOCKS: Tuple[int, ...] = (2, 3, 4, 6, 3)

SCENEMAP_STRIDES: Tuple[int, ...] = (1, 4, 4, 4)
SCENEMAP_NSAMPLES: Tuple[int, ...] = (8, 16, 16, 16)


class PointTransformerSeg(nn.Module):
    """5-level U-Net, per-point 32-d features — the frozen scene feature
    extractor (reference: pointtransformer.py:126-213,285-287)."""

    c: int = 6
    planes: Sequence[int] = SEG_PLANES
    blocks: Sequence[int] = SEG_BLOCKS
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, levels: List[LevelGeometry], feats: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        x0 = levels[0].xyz if self.c == 3 else jnp.concatenate([levels[0].xyz, feats], axis=-1)
        enc = PointTransformerEncoder(
            self.planes, self.blocks, SEG_STRIDES, norm=self.norm, dtype=self.dtype,
            name="enc",
        )(levels, x0, train=train)
        dec = PointTransformerDecoder(self.planes, norm=self.norm, dtype=self.dtype,
                                      name="dec")(levels, enc, train=train)
        return dec[-1]  # (B, N, planes[0])


def pointtransformer_seg_repro(**kwargs) -> "PointTransformerSeg":
    """(reference: pointtransformer.py:285-287)."""
    return PointTransformerSeg(**kwargs)


def pointtransformer_enc_repro(**kwargs) -> "PointTransformerEnc":
    """(reference: pointtransformer.py:289-291)."""
    return PointTransformerEnc(**kwargs)


def load_scene_model(name: str, c: int, num_points: int = 8192,
                     pretrained_weight: str = "", freeze: bool = True):
    """Scene-model factory by config name (reference: functions.py:96-126).

    Returns (module, variables-or-None): variables are the converted torch
    weights when ``pretrained_weight`` exists on disk."""
    if name == "PointTransformerSeg":
        model = PointTransformerSeg(c=c)
    elif name == "PointTransformerEnc":
        model = PointTransformerEnc(c=c)
    else:
        raise NotImplementedError(f"unknown scene model: {name}")
    variables = None
    import os

    if pretrained_weight and os.path.exists(pretrained_weight):
        from ..utils.torch_convert import convert_pointtransformer_seg

        variables = convert_pointtransformer_seg(pretrained_weight)
    return model, variables


class PointTransformerEnc(nn.Module):
    """Encoder-only variant (reference: pointtransformer.py:216-283)."""

    c: int = 6
    planes: Sequence[int] = SEG_PLANES
    blocks: Sequence[int] = SEG_BLOCKS
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, levels: List[LevelGeometry], feats: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x0 = levels[0].xyz if self.c == 3 else jnp.concatenate([levels[0].xyz, feats], axis=-1)
        enc = PointTransformerEncoder(
            self.planes, self.blocks, SEG_STRIDES, norm=self.norm, dtype=self.dtype,
            name="enc",
        )(levels, x0, train=train)
        return levels[-1].xyz, enc[-1]  # (B, N/256, 3), (B, N/256, 512)
