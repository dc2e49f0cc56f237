"""CDM — stage-1 contact/affordance diffusion denoiser
(reference: models/cdm.py:13-513).

Predicts the clean contact map x0 over a scene point cloud, conditioned on
a frozen text embedding, a timestep embedding, and optionally per-point
scene features. All four reference backbones are provided: MLP, Perceiver
(the published config), PointTrans, PointTransV2.

TPU-first differences from the reference:
- text embeddings arrive precomputed in ``cond['text_emb']`` (host-side
  frozen encoder; equivalent to the reference's per-forward
  ``encode_text_clip(...).detach()``, cdm.py:489-494);
- the frozen PointTransformerSeg scene features are computed by
  ``encode_scene`` ONCE per batch / per sampling chain (the reference
  recomputes them inside every denoiser forward, cdm.py:508) and wrapped
  in stop_gradient;
- point geometry (FPS/kNN) comes precomputed via hierarchy pytrees in
  ``cond['levels_seg']`` / ``cond['levels_pt']``.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import MODEL
from .layers import TimestepEmbedder, TransformerEncoder
from .perceiver import CrossAttentionLayer, SelfAttentionBlock
from .pointtransformer import (
    PointDecoderStage,
    PointEncoderStage,
    PointNorm,
    PointTransformerSeg,
)
from .text import get_lang_feat_dim_type

# 4-level geometry of the ContactPointTrans backbones and SceneMap encoders.
CDM_PT_STRIDES = (1, 4, 4, 4)
CDM_PT_NSAMPLES = (8, 16, 16, 16)
CDM_PT_PLANES = (64, 128, 256, 512)


class PointSceneMLP(nn.Module):
    """Point MLP + global mean-pooled scene context re-broadcast
    (reference: models/cdm.py:13-39)."""

    out_dim: int
    widening_factor: int = 1
    bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(self.widening_factor * in_dim, use_bias=self.bias,
                     dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.out_dim, use_bias=self.bias, dtype=self.dtype)(h)

        scene = jnp.broadcast_to(h.mean(axis=1, keepdims=True), h.shape)
        h = jnp.concatenate([h, scene], axis=-1)
        h = nn.LayerNorm(dtype=jnp.float32)(h).astype(self.dtype)
        h = nn.Dense(2 * self.out_dim, use_bias=self.bias, dtype=self.dtype)(h)
        h = nn.gelu(h)
        return nn.Dense(self.out_dim, use_bias=self.bias, dtype=self.dtype)(h)


class ContactMLP(nn.Module):
    """Pure point-MLP backbone (reference: models/cdm.py:41-85)."""

    point_mlp_dims: Sequence[int]
    widening_factor: int = 1
    bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, point_feat, text_emb, time_emb, cond, *, train: bool = False):
        N = x.shape[1]
        parts = [x]
        if point_feat is not None:
            parts.append(point_feat)
        parts.append(jnp.broadcast_to(text_emb, (x.shape[0], N, text_emb.shape[-1])))
        parts.append(jnp.broadcast_to(time_emb, (x.shape[0], N, time_emb.shape[-1])))
        h = jnp.concatenate([p.astype(self.dtype) for p in parts], axis=-1)
        for odim in self.point_mlp_dims:
            h = PointSceneMLP(odim, self.widening_factor, self.bias,
                              dtype=self.dtype)(h)
        return h


class ContactPerceiver(nn.Module):
    """Perceiver-IO backbone — the published CDM config
    (reference: models/cdm.py:88-188). Scene tokens are KV for a 2-token
    [text, time] query; after latent self-attention the per-point queries
    cross-attend back."""

    point_pos_emb: bool = True
    encoder_q_input_channels: int = 512
    encoder_kv_input_channels: int = 256
    encoder_num_heads: int = 8
    encoder_widening_factor: int = 1
    encoder_dropout: float = 0.1
    encoder_residual_dropout: float = 0.0
    encoder_self_attn_num_layers: int = 2
    decoder_q_input_channels: int = 256
    decoder_kv_input_channels: int = 512
    decoder_num_heads: int = 8
    decoder_widening_factor: int = 1
    decoder_dropout: float = 0.1
    decoder_residual_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, point_feat, text_emb, time_emb, cond, *, train: bool = False):
        if point_feat is not None:
            x = jnp.concatenate([x, point_feat.astype(x.dtype)], axis=-1)
        if self.point_pos_emb:
            x = jnp.concatenate([x, cond["c_pc_xyz"].astype(x.dtype)], axis=-1)

        enc_kv = nn.Dense(self.encoder_kv_input_channels, dtype=self.dtype)(x)
        lang = nn.Dense(self.encoder_q_input_channels, dtype=self.dtype)(text_emb)
        time = nn.Dense(self.encoder_q_input_channels, dtype=self.dtype)(time_emb)
        enc_q = jnp.concatenate([lang, time], axis=1)               # (B, 2, q)

        enc_q = CrossAttentionLayer(
            num_heads=self.encoder_num_heads,
            num_q_input_channels=self.encoder_q_input_channels,
            num_kv_input_channels=self.encoder_kv_input_channels,
            widening_factor=self.encoder_widening_factor,
            dropout=self.encoder_dropout,
            residual_dropout=self.encoder_residual_dropout,
            dtype=self.dtype,
        )(enc_q, enc_kv, train=train)
        enc_q = SelfAttentionBlock(
            num_layers=self.encoder_self_attn_num_layers,
            num_heads=self.encoder_num_heads,
            num_channels=self.encoder_q_input_channels,
            widening_factor=self.encoder_widening_factor,
            dropout=self.encoder_dropout,
            residual_dropout=self.encoder_residual_dropout,
            dtype=self.dtype,
        )(enc_q, train=train)

        dec_q = nn.Dense(self.decoder_q_input_channels, dtype=self.dtype)(enc_kv)
        dec_q = CrossAttentionLayer(
            num_heads=self.decoder_num_heads,
            num_q_input_channels=self.decoder_q_input_channels,
            num_kv_input_channels=self.decoder_kv_input_channels,
            widening_factor=self.decoder_widening_factor,
            dropout=self.decoder_dropout,
            residual_dropout=self.decoder_residual_dropout,
            dtype=self.dtype,
        )(dec_q, enc_q, train=train)
        return dec_q


class _CtxMLP(nn.Module):
    """Context-injection MLP: Dense -> BN -> ReLU -> Dense
    (reference: models/cdm.py:236-243)."""

    planes: int
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Dense(self.planes, dtype=self.dtype)(x)
        h = nn.relu(PointNorm(self.norm, dtype=self.dtype)(h, train=train))
        return nn.Dense(self.planes, dtype=self.dtype)(h)


class ContactPointTrans(nn.Module):
    """4-level point-transformer U-Net backbone with [text,time] context
    injected at the bottleneck (reference: models/cdm.py:190-287)."""

    blocks: Sequence[int] = (2, 2, 2, 2)
    planes: Sequence[int] = CDM_PT_PLANES
    norm: str = "batch"
    v2: bool = False  # PointTransV2: per-level ctx + bottleneck self-attn
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, point_feat, text_emb, time_emb, cond, *, train: bool = False):
        levels = cond["levels_pt"]
        if point_feat is not None:
            x = jnp.concatenate([x, point_feat.astype(x.dtype)], axis=-1)
        context = jnp.concatenate([text_emb, time_emb], axis=-1).astype(self.dtype)
        x0 = jnp.concatenate([levels[0].xyz.astype(x.dtype), x], axis=-1)

        feats: List[jnp.ndarray] = []
        h = x0
        parent_xyz = levels[0].xyz
        for i, plane in enumerate(self.planes):
            h = PointEncoderStage(
                plane, self.blocks[i], CDM_PT_STRIDES[i], norm=self.norm,
                dtype=self.dtype,
            )(parent_xyz, h, levels[i], train=train)
            feats.append(h)
            parent_xyz = levels[i].xyz

        def inject(feat, plane):
            ctx = jnp.broadcast_to(context, feat.shape[:2] + (context.shape[-1],))
            return _CtxMLP(plane, self.norm, dtype=self.dtype)(
                jnp.concatenate([feat, ctx], axis=-1), train=train
            )

        x4 = feats[3]
        if self.v2:
            x4 = TransformerEncoder(
                num_layers=1, d_model=self.planes[3], num_heads=8,
                dim_feedforward=1024, dropout=0.1, activation=nn.relu,
                dtype=self.dtype,
            )(x4, train=train)
        x4 = inject(x4, self.planes[3])
        x4 = PointDecoderStage(self.planes[3], 2, norm=self.norm, is_head=True,
                               dtype=self.dtype)(x4, levels[3], train=train)

        x3 = inject(feats[2], self.planes[2]) if self.v2 else feats[2]
        x3 = PointDecoderStage(self.planes[2], 2, norm=self.norm, dtype=self.dtype)(
            x3, levels[2], coarse_x=x4, coarse_geom=levels[3], train=train
        )
        x2 = inject(feats[1], self.planes[1]) if self.v2 else feats[1]
        x2 = PointDecoderStage(self.planes[1], 2, norm=self.norm, dtype=self.dtype)(
            x2, levels[1], coarse_x=x3, coarse_geom=levels[2], train=train
        )
        x1 = PointDecoderStage(self.planes[0], 2, norm=self.norm, dtype=self.dtype)(
            feats[0], levels[0], coarse_x=x2, coarse_geom=levels[1], train=train
        )
        return x1  # (B, N, planes[0])


@MODEL.register()
class CDM(nn.Module):
    """Stage-1 denoiser (reference: models/cdm.py:412-513). Registered as
    'CDM' in the model registry (selected by configs/model/cdm.yaml name)."""

    contact_dim: int
    time_emb_dim: int = 128
    text_feat_dim: int = 512
    point_feat_dim: int = 32
    use_scene_model: bool = True
    use_openscene: bool = False
    scene_in_dim: int = 6           # 3 + 3·use_color
    arch: str = "Perceiver"
    arch_cfg: Tuple[Tuple[str, Any], ...] = ()
    last_dim: int = 256
    norm: str = "batch"
    # computation dtype; params, the frozen scene model and the output head
    # stay float32
    dtype: Any = jnp.float32
    # banded windowed-neighborhood kernels for point hierarchies (Morton-
    # sorted clouds only; set by the TrainLoop — see ops/pallas/banded.py)
    use_banded: bool = False
    # banded W0 window width / adaptive-starts knobs (config values; 0/None
    # = resolve_* env+default policy — see ops/pallas/banded.py)
    banded_window: int = 0
    banded_adaptive: Any = None
    # bit-exact kNN for the hierarchies (no Pallas packed-bits kernel, no
    # approx_min_k) — the reference-parity eval path; see PARITY.md's
    # measured metric deltas for the shipped default
    knn_exact: bool = False

    @property
    def needs_seg_hierarchy(self) -> bool:
        return self.use_scene_model and not self.use_openscene

    @property
    def needs_pt_hierarchy(self) -> bool:
        return self.arch in ("PointTrans", "PointTransV2")

    def setup(self):
        ac = dict(self.arch_cfg)
        self.timestep_embedder = TimestepEmbedder(
            d_model=self.time_emb_dim, time_embed_dim=self.time_emb_dim, max_len=1000,
            dtype=self.dtype,
        )
        if self.needs_seg_hierarchy:
            # frozen feature extractor: always f32 (its pretrained torch
            # weights were produced in f32; it runs once per batch/chain)
            self.scene_model = PointTransformerSeg(c=self.scene_in_dim, norm=self.norm)
        if self.arch == "MLP":
            self.contact_model = ContactMLP(
                point_mlp_dims=tuple(ac.get("point_mlp_dims", (512, 512))),
                widening_factor=int(ac.get("point_mlp_widening_factor", 1)),
                bias=bool(ac.get("point_mlp_bias", True)),
                dtype=self.dtype,
            )
        elif self.arch == "Perceiver":
            self.contact_model = ContactPerceiver(
                **{k: v for k, v in ac.items() if k != "last_dim"},
                dtype=self.dtype,
            )
        elif self.arch in ("PointTrans", "PointTransV2"):
            self.contact_model = ContactPointTrans(
                blocks=tuple(ac.get("blocks", (2, 2, 2, 2))),
                norm=self.norm,
                v2=self.arch == "PointTransV2",
                dtype=self.dtype,
            )
        else:
            raise NotImplementedError(self.arch)
        # prediction head in f32: diffusion x0/loss math stays full precision
        self.contact_layer = nn.Dense(self.contact_dim, dtype=jnp.float32)

    def encode_scene(self, cond: Dict[str, Any], *, train: bool = False):
        """Frozen per-point scene features — compute once per batch/chain
        (the reference recomputes per denoiser forward, cdm.py:508).
        Returns None when the config provides features directly."""
        if not self.use_scene_model:
            return None
        if self.use_openscene or not self.needs_seg_hierarchy:
            return None  # raw features handled in _point_features
        feats = self.scene_model(cond["levels_seg"], cond["c_pc_feat"], train=False)
        return jax.lax.stop_gradient(feats)

    def _point_features(self, cond, text_emb, scene_feat):
        """Resolve per-point conditioning features
        (reference: models/cdm.py:497-508)."""
        if scene_feat is not None:
            return scene_feat
        if not self.use_scene_model or self.point_feat_dim == 0:
            return None
        pc_feat = cond["c_pc_feat"]
        if self.point_feat_dim == 1:
            if pc_feat.shape[-1] == 1:
                return pc_feat
            # OpenScene distilled features scored against the text embedding
            return jnp.einsum("bnd,bmd->bnm", pc_feat, text_emb)
        return pc_feat

    def denoise(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond: Dict[str, Any],
        scene_feat: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        time_emb = self.timestep_embedder(timesteps)               # (B, 1, De)
        text_emb = cond["text_emb"].astype(self.dtype)             # (B, 1, Dt)
        point_feat = self._point_features(cond, text_emb, scene_feat)
        h = self.contact_model(
            x.astype(self.dtype), point_feat, text_emb, time_emb, cond, train=train
        )
        return self.contact_layer(h.astype(jnp.float32))

    def __call__(self, x, timesteps, cond, *, train: bool = False):
        scene_feat = self.encode_scene(cond, train=train)
        return self.denoise(x, timesteps, cond, scene_feat, train=train)


def build_cdm(model_cfg: Any) -> CDM:
    """Construct a CDM from the model YAML block (configs/model/cdm.yaml)."""
    text_feat_dim, _ = get_lang_feat_dim_type(model_cfg.text_model.version)
    sm = model_cfg.scene_model
    use_scene_model = bool(sm.use_scene_model)
    use_openscene = bool(sm.get("use_openscene", False))
    point_feat_dim = int(sm.point_feat_dim) if use_scene_model else 0

    arch = str(model_cfg.arch)
    if arch == "MLP":
        ac = model_cfg.arch_mlp
    elif arch == "Perceiver":
        ac = model_cfg.arch_perceiver
    else:
        ac = model_cfg.arch_pointtrans
    arch_items = tuple(
        (k, tuple(v) if isinstance(v, list) else v)
        for k, v in ac.items()
        if k not in ("last_dim", "num_points")
    )

    return CDM(
        contact_dim=int(model_cfg.input_feats),
        time_emb_dim=int(model_cfg.time_emb_dim),
        text_feat_dim=text_feat_dim,
        point_feat_dim=point_feat_dim,
        use_scene_model=use_scene_model,
        use_openscene=use_openscene,
        scene_in_dim=3 + 3 * int(bool(sm.get("use_color", True))),
        arch=arch,
        arch_cfg=arch_items,
        last_dim=int(ac.last_dim),
        norm=str(model_cfg.get("norm", "batch")),
        dtype=jnp.dtype(str(model_cfg.get("dtype", "float32"))),
        knn_exact=bool(model_cfg.get("knn_exact", False)),
        # normally set by the TrainLoop for Morton-sorted packed data;
        # config override enables eval-side banded runs (metric A/B)
        use_banded=bool(model_cfg.get("use_banded", False)),
        banded_window=int(model_cfg.get("banded_window", 0) or 0),
        banded_adaptive=model_cfg.get("banded_adaptive", None),
    )
