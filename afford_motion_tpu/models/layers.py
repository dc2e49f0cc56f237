"""Shared NN building blocks (reference: models/modules.py:10-53 and the
torch nn.Transformer* layers used by models/cmdm.py:66-113).

Everything is flax.linen with explicit ``train`` flags; attention is plain
einsum that XLA fuses (sequence lengths here are ≤ a few hundred tokens +
8192-point KV sets — no flash/blockwise attention needed, SURVEY.md §5).

Mixed precision: every module takes ``dtype`` (the computation dtype —
bfloat16 halves the HBM traffic of activations, which is what bounds the
non-gather time on TPU; matmuls already run bf16 passes on the MXU either
way). Params stay float32; softmax logits and LayerNorm always compute in
float32 and cast back.

PyTorch-parity notes:
- ``TransformerEncoderLayer``/``TransformerDecoderLayer`` replicate torch's
  POST-layer-norm ordering (torch default norm_first=False), which the
  reference relies on (models/cmdm.py:66-77).
- masks follow the torch convention: True = padding (ignore).
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Flash (fused, logits-never-in-HBM) attention for the transformer
# denoisers via the Pallas TPU kernel. The einsum path materializes the
# (B, H, Lq, Lk) f32 logits + the bf16 weights in HBM every layer — at the
# sampling chain's 326-token sequences that round-trip is a large share of
# the per-step time. Opt-in (AM_FLASH_ATTN=1) until verified against the
# einsum path on the real chip; engages only when attention-weight dropout
# is inactive (the kernel has none — training keeps the einsum path, which
# also matches the reference's train-time dropout semantics).
_FLASH = os.environ.get("AM_FLASH_ATTN", "0") == "1"


def _flash_enabled() -> bool:
    """Flash-kernel gate (split out so tests can patch it without touching
    the global backend query other TPU-gated paths share)."""
    return _FLASH and jax.default_backend() == "tpu"


def sinusoidal_table(max_len: int, dim: int) -> np.ndarray:
    """Classic transformer sin/cos table, (max_len, dim), float32
    (reference: models/modules.py:10-26)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return pe.astype(np.float32)


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE over the sequence dim of (B, L, D)
    (reference: models/modules.py:28-36; the reference permutes to (L, B, D)
    first — same values, batch-first here)."""

    dim: int
    dropout: float = 0.1
    max_len: int = 5000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.dim))
        x = x.astype(self.dtype) + pe[None, : x.shape[1], :].astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep lookup + 2-layer SiLU MLP -> (B, 1, d_model)
    (reference: models/modules.py:38-53)."""

    d_model: int
    time_embed_dim: int
    max_len: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.time_embed_dim))
        emb = pe[timesteps][:, None, :]  # (B, 1, time_embed_dim)
        emb = nn.Dense(self.d_model, dtype=self.dtype)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.d_model, dtype=self.dtype)(emb)
        return emb


def _attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    pad_mask: Optional[jnp.ndarray],
    dropout: nn.Dropout,
) -> jnp.ndarray:
    """Masked scaled-dot-product attention over (B, L, H*C) projections."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    q = q.reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Lk, num_heads, -1).transpose(0, 2, 1, 3)
    v = v.reshape(B, Lk, num_heads, -1).transpose(0, 2, 1, 3)
    # logits + softmax in f32 regardless of compute dtype
    attn = jnp.einsum("bhic,bhjc->bhij", q * (hd ** -0.5), k,
                      preferred_element_type=jnp.float32)
    if pad_mask is not None:
        neg = jnp.finfo(attn.dtype).min
        attn = jnp.where(pad_mask[:, None, None, :], neg, attn)
    attn = nn.softmax(attn, axis=-1).astype(v.dtype)
    attn = dropout(attn)
    o = jnp.einsum("bhij,bhjc->bhic", attn, v)
    return o.transpose(0, 2, 1, 3).reshape(B, Lq, -1)


def _flash_attention(q, k, v, num_heads, pad_mask):
    """Fused attention via the Pallas TPU flash kernel: sequences padded to
    128-multiples; key padding (torch convention True=ignore) expressed as
    segment ids (padded keys get segment 1, every query stays segment 0 so
    no query row is fully masked — padded-query outputs are garbage on the
    einsum path too and are sliced off / masked downstream)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    lqp = -(-Lq // 128) * 128
    lkp = -(-Lk // 128) * 128

    def heads(x, L, Lp):
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        return x.reshape(B, Lp, num_heads, hd).transpose(0, 2, 1, 3)

    q_seg = jnp.zeros((B, lqp), dtype=jnp.int32)
    kv_seg = (
        pad_mask.astype(jnp.int32) if pad_mask is not None
        else jnp.zeros((B, Lk), dtype=jnp.int32)
    )
    kv_seg = jnp.pad(kv_seg, ((0, 0), (0, lkp - Lk)), constant_values=1)
    out = fa.flash_attention(
        heads(q, Lq, lqp), heads(k, Lk, lkp), heads(v, Lk, lkp),
        segment_ids=fa.SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=hd ** -0.5,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, lqp, D)[:, :Lq]


class TorchMultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (packed qkv, out proj).

    ``fused_qkv=True`` computes the projections as ONE matmul when the
    call is self-attention (query is key is value) or a kv-shared cross
    (key is value): torch's in_proj is packed the same way, so the
    converted checkpoint layout is actually simpler; 3 small matmuls
    become one (B*L, d)x(d, 3d) MXU pass. Changes the param tree
    (Dense_0 packed + Dense_1 out), so the flag must match the
    checkpoint it loads."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, query, key, value, pad_mask=None, *, train: bool = False):
        if self.fused_qkv and key is query and value is query:
            qkv = nn.Dense(3 * self.d_model, dtype=self.dtype)(query)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif self.fused_qkv and key is value:
            q = nn.Dense(self.d_model, dtype=self.dtype)(query)
            kv = nn.Dense(2 * self.d_model, dtype=self.dtype)(key)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            q = nn.Dense(self.d_model, dtype=self.dtype)(query)
            k = nn.Dense(self.d_model, dtype=self.dtype)(key)
            v = nn.Dense(self.d_model, dtype=self.dtype)(value)
        use_flash = (
            _flash_enabled()
            and (not train or self.dropout == 0.0)
            and (self.d_model // self.num_heads) % 8 == 0
        )
        if use_flash:
            o = _flash_attention(q, k, v, self.num_heads, pad_mask)
        else:
            drop = nn.Dropout(self.dropout, deterministic=not train)
            o = _attention(q, k, v, self.num_heads, pad_mask, drop)
        return nn.Dense(self.d_model, dtype=self.dtype)(o)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer, torch semantics (self-attn -> add -> LN ->
    FFN -> add -> LN)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: Callable = nn.gelu
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, pad_mask=None, *, train: bool = False):
        x = x.astype(self.dtype)
        attn = TorchMultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            fused_qkv=self.fused_qkv,
        )(x, x, x, pad_mask, train=train)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (torch nn.TransformerEncoder)."""

    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: Callable = nn.gelu
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, pad_mask=None, *, train: bool = False):
        for _ in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dropout, self.activation, dtype=self.dtype,
                fused_qkv=self.fused_qkv,
            )(x, pad_mask, train=train)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn, cross-attn to memory, FFN
    (torch nn.TransformerDecoderLayer, used by models/cmdm.py:104-113)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: Callable = nn.gelu
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, memory, tgt_pad_mask=None, mem_pad_mask=None, *, train: bool = False):
        x = x.astype(self.dtype)
        memory = memory.astype(self.dtype)
        drop = lambda: nn.Dropout(self.dropout, deterministic=not train)
        attn = TorchMultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            fused_qkv=self.fused_qkv,
        )(x, x, x, tgt_pad_mask, train=train)
        x = nn.LayerNorm(dtype=jnp.float32)(x + drop()(attn)).astype(self.dtype)
        cross = TorchMultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            fused_qkv=self.fused_qkv,
        )(x, memory, memory, mem_pad_mask, train=train)
        x = nn.LayerNorm(dtype=jnp.float32)(x + drop()(cross)).astype(self.dtype)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = self.activation(h)
        h = drop()(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=jnp.float32)(x + drop()(h)).astype(self.dtype)
