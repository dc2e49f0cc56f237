"""Perceiver-IO attention stack used by the CDM's published backbone
(reference: models/modules.py:234-661, vendored there from
krasserm/perceiver-io; re-derived here in flax from the Perceiver-IO paper
structure: pre-LN cross/self attention with residual MLPs).

Shape notes for the CDM use (models/cdm.py:173-186): the encoder
cross-attends 2 query tokens (text, time) against 8192 point tokens —
O(2·8192) — and the decoder cross-attends 8192 point queries against the
2-token latent, so no attention matrix ever exceeds (8192 × 2). KV-cache /
rotary / causal features of the vendored file are dead code for this
system and intentionally omitted.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import _attention


class PerceiverMHA(nn.Module):
    """Multi-head attention with separate q / kv input widths
    (Perceiver-IO appendix E)."""

    num_heads: int
    num_q_input_channels: int
    num_kv_input_channels: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    num_output_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_kv, pad_mask=None, *, train: bool = False):
        qk = self.num_qk_channels or self.num_q_input_channels
        v_ch = self.num_v_channels or qk
        out_ch = self.num_output_channels or self.num_q_input_channels
        assert qk % self.num_heads == 0 and v_ch % self.num_heads == 0

        q = nn.Dense(qk, dtype=self.dtype)(x_q)
        k = nn.Dense(qk, dtype=self.dtype)(x_kv)
        v = nn.Dense(v_ch, dtype=self.dtype)(x_kv)
        drop = nn.Dropout(self.dropout, deterministic=not train)
        o = _attention(q, k, v, self.num_heads, pad_mask, drop)
        return nn.Dense(out_ch, dtype=self.dtype)(o)


class PerceiverMLP(nn.Module):
    """Pre-LN residual MLP (LN -> Dense(w·c) -> GELU -> Dense(c))."""

    num_channels: int
    widening_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(self.widening_factor * self.num_channels, dtype=self.dtype)(h)
        h = nn.gelu(h)
        return nn.Dense(self.num_channels, dtype=self.dtype)(h)


class CrossAttentionLayer(nn.Module):
    """Pre-LN cross-attention + residual MLP
    (reference: models/modules.py:504-541)."""

    num_heads: int
    num_q_input_channels: int
    num_kv_input_channels: int
    widening_factor: int = 1
    dropout: float = 0.0
    residual_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_kv, pad_mask=None, *, train: bool = False):
        x_q = x_q.astype(self.dtype)
        rdrop = nn.Dropout(self.residual_dropout, deterministic=not train)
        attn = PerceiverMHA(
            num_heads=self.num_heads,
            num_q_input_channels=self.num_q_input_channels,
            num_kv_input_channels=self.num_kv_input_channels,
            dropout=self.dropout,
            dtype=self.dtype,
        )(nn.LayerNorm(dtype=jnp.float32)(x_q).astype(self.dtype),
          nn.LayerNorm(dtype=jnp.float32)(x_kv).astype(self.dtype),
          pad_mask, train=train)
        x = x_q + rdrop(attn)
        x = x + rdrop(PerceiverMLP(self.num_q_input_channels, self.widening_factor,
                                   dtype=self.dtype)(x))
        return x


class SelfAttentionLayer(nn.Module):
    """Pre-LN self-attention + residual MLP
    (reference: models/modules.py:544-578)."""

    num_heads: int
    num_channels: int
    widening_factor: int = 1
    dropout: float = 0.0
    residual_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, *, train: bool = False):
        x = x.astype(self.dtype)
        rdrop = nn.Dropout(self.residual_dropout, deterministic=not train)
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        attn = PerceiverMHA(
            num_heads=self.num_heads,
            num_q_input_channels=self.num_channels,
            num_kv_input_channels=self.num_channels,
            dropout=self.dropout,
            dtype=self.dtype,
        )(h, h, pad_mask, train=train)
        x = x + rdrop(attn)
        x = x + rdrop(PerceiverMLP(self.num_channels, self.widening_factor,
                                   dtype=self.dtype)(x))
        return x


class SelfAttentionBlock(nn.Module):
    """Stack of SelfAttentionLayers (reference: models/modules.py:581-648)."""

    num_layers: int
    num_heads: int
    num_channels: int
    widening_factor: int = 1
    dropout: float = 0.0
    residual_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, *, train: bool = False):
        for _ in range(self.num_layers):
            x = SelfAttentionLayer(
                num_heads=self.num_heads,
                num_channels=self.num_channels,
                widening_factor=self.widening_factor,
                dropout=self.dropout,
                residual_dropout=self.residual_dropout,
                dtype=self.dtype,
            )(x, pad_mask, train=train)
        return x
