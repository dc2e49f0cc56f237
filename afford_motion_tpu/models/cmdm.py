"""CMDM — stage-2 affordance-to-motion diffusion denoiser
(reference: models/cmdm.py:12-196).

Predicts the clean motion sequence x0 (196 × {66|263}) conditioned on the
stage-1 contact map (encoded by a SceneMap point-transformer into 128 group
tokens), a frozen text embedding, and the timestep.

TPU-first split: ``encode_contact`` (the expensive 8192-point encoder) is
a separate method so the sampling loop computes it ONCE per chain and the
``lax.scan`` body only runs ``denoise`` — the reference re-encodes the
identical contact cloud at every one of the 500/1000 denoising steps
(cmdm.py:149 inside forward). Classifier-free-guidance masks
(c_text_mask / c_text_erase / c_pc_mask / c_pc_erase) are applied on
device exactly as the reference does (cmdm.py:142-155,182-186).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import MODEL
from .layers import (
    PositionalEncoding,
    TimestepEmbedder,
    TransformerDecoderLayer,
    TransformerEncoder,
)
from .scene_map import SceneMapEncoder, SceneMapEncoderDecoder
from .text import get_lang_feat_dim_type


@MODEL.register()
class CMDM(nn.Module):
    """Stage-2 denoiser, arch 'trans_enc' (token concat + encoder stack) or
    'trans_dec' (self-attn blocks alternating with cross-attn to
    multi-scale contact features)."""

    motion_dim: int
    latent_dim: int = 512
    time_emb_dim: int = 512
    text_feat_dim: int = 512
    contact_dim: int = 6
    planes: Sequence[int] = (32, 64, 128, 256)
    blocks: Sequence[int] = (2, 2, 2, 2)
    arch: str = "trans_enc"
    mask_motion: bool = True
    num_layers: Sequence[int] = (1, 1, 1, 1, 1)
    num_heads: int = 8
    dropout: float = 0.1
    dim_feedforward: int = 1024
    norm: str = "batch"
    # computation dtype: bfloat16 halves activation HBM traffic (the
    # non-gather bound on TPU); params and the output head stay float32
    dtype: Any = jnp.float32
    # banded windowed-neighborhood kernels for the contact-cloud hierarchy
    # (requires Morton-sorted clouds; the TrainLoop sets this when the
    # packed store reports Morton order — see ops/pallas/banded.py)
    use_banded: bool = False
    # banded W0 window width (model.banded_window; 0 = resolve_window's
    # env+default policy, i.e. 128 since round 3) and adaptive per-item
    # window starts (model.banded_adaptive; None = default ON). Config
    # knobs — AM_BANDED_* env vars are debug overrides only.
    banded_window: int = 0
    banded_adaptive: Any = None
    # bit-exact kNN for the hierarchy (no Pallas packed-bits kernel, no
    # approx_min_k) — the reference-parity eval path; see PARITY.md's
    # measured metric deltas for the shipped default
    knn_exact: bool = False
    # ONE packed qkv matmul per attention instead of three (same math,
    # different param tree — torch's in_proj is packed the same way);
    # must match the checkpoint layout it loads
    fused_qkv: bool = False

    @property
    def needs_scenemap_hierarchy(self) -> bool:
        return True

    @property
    def needs_up_interpolation(self) -> bool:
        """trans_enc pools encoder-only group tokens — the hierarchy's 3-NN
        up-interpolation arrays are never read (only trans_dec's decoder
        uses them)."""
        return self.arch == "trans_dec"

    def setup(self):
        self.timestep_embedder = TimestepEmbedder(
            d_model=self.latent_dim, time_embed_dim=self.time_emb_dim, max_len=1000,
            dtype=self.dtype,
        )
        if self.arch == "trans_enc":
            self.contact_encoder = SceneMapEncoder(
                planes=tuple(self.planes), blocks=tuple(self.blocks), norm=self.norm,
                dtype=self.dtype,
            )
            self.contact_adapter = nn.Dense(self.latent_dim, dtype=self.dtype)
            self.self_attn_layer = TransformerEncoder(
                num_layers=sum(self.num_layers),
                d_model=self.latent_dim,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                activation=nn.gelu,
                dtype=self.dtype,
                fused_qkv=self.fused_qkv,
            )
        elif self.arch == "trans_dec":
            self.contact_encoder = SceneMapEncoderDecoder(
                planes=tuple(self.planes), blocks=tuple(self.blocks), norm=self.norm,
                dtype=self.dtype,
            )
            self.self_attn_layers = [
                TransformerEncoder(
                    num_layers=n,
                    d_model=self.latent_dim,
                    num_heads=self.num_heads,
                    dim_feedforward=self.dim_feedforward,
                    dropout=self.dropout,
                    activation=nn.gelu,
                    dtype=self.dtype,
                    fused_qkv=self.fused_qkv,
                )
                for n in self.num_layers
            ]
            # kv adapters for cross-attn to multi-scale features, coarsest
            # first: planes[-1], planes[-2], ... (reference: cmdm.py:98-103)
            self.kv_mapping_layers = [
                _KvMap(self.latent_dim, dtype=self.dtype)
                for _ in range(len(self.num_layers) - 1)
            ]
            self.cross_attn_layers = [
                TransformerDecoderLayer(
                    d_model=self.latent_dim,
                    num_heads=self.num_heads,
                    dim_feedforward=self.dim_feedforward,
                    dropout=self.dropout,
                    activation=nn.gelu,
                    dtype=self.dtype,
                    fused_qkv=self.fused_qkv,
                )
                for _ in range(len(self.num_layers) - 1)
            ]
        else:
            raise NotImplementedError(self.arch)

        self.language_adapter = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.motion_adapter = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.positional_encoder = PositionalEncoding(
            self.latent_dim, dropout=self.dropout, max_len=5000, dtype=self.dtype
        )
        # prediction head in f32: the diffusion loss/x0 math stays full precision
        self.motion_layer = nn.Dense(self.motion_dim, dtype=jnp.float32)

    # ------------------------------------------------------------ conditions
    def encode_contact(
        self, cond: Dict[str, Any], *, train: bool = False
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        """Encode (xyz ⊕ contact) into group tokens — hoist out of the
        sampling scan; the condition is constant across the chain."""
        return self.contact_encoder(
            cond["levels_sm"], cond["c_pc_contact"], train=train
        )

    # --------------------------------------------------------------- denoise
    def denoise(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond: Dict[str, Any],
        cont_emb: Union[jnp.ndarray, List[jnp.ndarray]],
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        B, L, _ = x.shape
        time_emb = self.timestep_embedder(timesteps)               # (B, 1, D)
        time_mask = jnp.zeros((B, 1), dtype=bool)

        # (B, Lt, Dt): Lt == 1 for pooled CLIP (reference cmdm.py:134-136),
        # Lt == max_length for per-token BERT with its pad mask
        # (cmdm.py:138-140; True marks padding)
        text_emb = cond["text_emb"].astype(self.dtype)
        Lt = text_emb.shape[1]
        if "text_token_mask" in cond:
            text_mask = cond["text_token_mask"].astype(bool)
        else:
            text_mask = jnp.zeros((B, Lt), dtype=bool)
        if "c_text_mask" in cond:
            # (B, 1) CFG drop flag broadcast over the text tokens
            text_mask = jnp.logical_or(text_mask, cond["c_text_mask"])
        if "c_text_erase" in cond:
            text_emb = text_emb * (1.0 - cond["c_text_erase"][..., None].astype(text_emb.dtype))
        text_emb = self.language_adapter(text_emb)

        h = self.motion_adapter(x)                                  # (B, L, D)

        if self.arch == "trans_enc":
            c = cont_emb
            cont_mask = jnp.zeros((B, c.shape[1]), dtype=bool)
            if "c_pc_mask" in cond:
                cont_mask = jnp.logical_or(
                    cont_mask, jnp.broadcast_to(cond["c_pc_mask"], cont_mask.shape)
                )
            if "c_pc_erase" in cond:
                c = c * (1.0 - cond["c_pc_erase"][..., None].astype(c.dtype))
            c = self.contact_adapter(c)                             # (B, G, D)

            tokens = jnp.concatenate([time_emb, text_emb, c, h], axis=1)
            tokens = self.positional_encoder(tokens, train=train)
            pad_mask = None
            if self.mask_motion:
                pad_mask = jnp.concatenate(
                    [time_mask, text_mask, cont_mask, cond["x_mask"]], axis=1
                )
            tokens = self.self_attn_layer(tokens, pad_mask, train=train)
            h = tokens[:, 1 + Lt + c.shape[1]:, :]
        else:  # trans_dec
            tokens = jnp.concatenate([time_emb, text_emb, h], axis=1)
            tokens = self.positional_encoder(tokens, train=train)
            pad_mask = None
            if self.mask_motion:
                pad_mask = jnp.concatenate([time_mask, text_mask, cond["x_mask"]], axis=1)
            n_stages = len(self.num_layers)
            for i in range(n_stages):
                tokens = self.self_attn_layers[i](tokens, pad_mask, train=train)
                if i != n_stages - 1:
                    mem = cont_emb[i]                               # coarsest first
                    mem_mask = jnp.zeros((B, mem.shape[1]), dtype=bool)
                    if "c_pc_mask" in cond:
                        mem_mask = jnp.logical_or(
                            mem_mask, jnp.broadcast_to(cond["c_pc_mask"], mem_mask.shape)
                        )
                    if "c_pc_erase" in cond:
                        mem = mem * (1.0 - cond["c_pc_erase"][..., None].astype(mem.dtype))
                    mem = self.kv_mapping_layers[i](mem)
                    tokens = self.cross_attn_layers[i](
                        tokens, mem, tgt_pad_mask=pad_mask, mem_pad_mask=mem_mask,
                        train=train,
                    )
            h = tokens[:, 1 + Lt:, :]

        return self.motion_layer(h.astype(jnp.float32))

    def __call__(self, x, timesteps, cond, *, train: bool = False):
        cont_emb = self.encode_contact(cond, train=train)
        return self.denoise(x, timesteps, cond, cont_emb, train=train)


class _KvMap(nn.Module):
    """Dense + LayerNorm kv adapter (reference: cmdm.py:98-103)."""

    latent_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.latent_dim, dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=jnp.float32)(h).astype(self.dtype)


def build_cmdm(model_cfg: Any) -> CMDM:
    """Construct a CMDM from the model YAML block (configs/model/cmdm.yaml)."""
    from ..utils.misc import compute_repr_dimension

    text_feat_dim, _ = get_lang_feat_dim_type(model_cfg.text_model.version)
    cm = model_cfg.contact_model
    return CMDM(
        motion_dim=int(model_cfg.input_feats),
        latent_dim=int(model_cfg.latent_dim),
        time_emb_dim=int(model_cfg.time_emb_dim),
        text_feat_dim=text_feat_dim,
        contact_dim=compute_repr_dimension(str(cm.contact_type)),
        planes=tuple(cm.planes),
        blocks=tuple(cm.blocks),
        arch=str(model_cfg.arch),
        mask_motion=bool(model_cfg.mask_motion),
        num_layers=tuple(model_cfg.num_layers),
        num_heads=int(model_cfg.num_heads),
        dropout=float(model_cfg.dropout),
        dim_feedforward=int(model_cfg.dim_feedforward),
        norm=str(model_cfg.get("norm", "batch")),
        dtype=jnp.dtype(str(model_cfg.get("dtype", "float32"))),
        knn_exact=bool(model_cfg.get("knn_exact", False)),
        # normally set by the TrainLoop for Morton-sorted packed data;
        # config override enables eval-side banded runs (metric A/B)
        use_banded=bool(model_cfg.get("use_banded", False)),
        banded_window=int(model_cfg.get("banded_window", 0) or 0),
        banded_adaptive=model_cfg.get("banded_adaptive", None),
        fused_qkv=bool(model_cfg.get("fused_qkv", False)),
    )
