"""Frozen T2M text/motion matching encoders in JAX
(reference: utils/eval/modules.py — MovementConvEncoder:79-98,
TextEncoderBiGRUCo:311-350, MotionEncoderBiGRUCo:353-386).

These are pure functions over parameter dicts whose keys/layouts match the
torch checkpoints 1:1 (``finest.tar``), so weights carry over without any
renaming: ``load_t2m_checkpoint`` reads the torch file and converts arrays.
The GRU math is the exact torch nn.GRU cell (gate order r, z, n; separate
input/hidden biases), so co-embeddings are numerically equivalent.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


# HIGHEST everywhere an f32 matmul feeds a METRIC: the TPU MXU default
# silently rounds f32 operands to bf16 (same bug class as the round-3/4
# _dot_precision fixes); the reference computes these in true-f32 torch
_EXACT = jax.lax.Precision.HIGHEST


def _linear(p: Dict, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, p[f"{prefix}.weight"].T, precision=_EXACT) \
        + p[f"{prefix}.bias"]


def _layer_norm(p: Dict, prefix: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p[f"{prefix}.weight"] + p[f"{prefix}.bias"]


def _conv1d_s2(w: jnp.ndarray, b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """torch Conv1d(kernel=4, stride=2, padding=1) over (B, L, C_in)."""
    out = lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)),          # (K, C_in, C_out) for IOK? see dn
        window_strides=(2,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=_EXACT,
    )
    return out + b


def _gru_cell(x, h, w_ih, w_hh, b_ih, b_hh):
    """Exact torch GRU cell: gates [r, z, n]."""
    gi = jnp.matmul(x, w_ih.T, precision=_EXACT) + b_ih
    gh = jnp.matmul(h, w_hh.T, precision=_EXACT) + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _bigru_last(p: Dict, prefix: str, x: jnp.ndarray, lengths: jnp.ndarray,
                h0: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional GRU final hidden states, concat [fwd_h_T, bwd_h_T].

    Equivalent to torch pack_padded_sequence + GRU: the forward direction's
    final state is taken at t = len-1; the backward direction runs over the
    sequence reversed WITHIN its valid length.
    """
    B, L, _ = x.shape
    idx = jnp.arange(L)

    def run(xs, w_ih, w_hh, b_ih, b_hh, h_init):
        def step(h, xt):
            x_t, valid_t = xt
            h_new = _gru_cell(x_t, h, w_ih, w_hh, b_ih, b_hh)
            h = jnp.where(valid_t[:, None], h_new, h)  # freeze past the length
            return h, None
        valid = idx[None, :] < lengths[:, None]        # (B, L)
        h, _ = lax.scan(step, h_init, (jnp.swapaxes(xs, 0, 1), valid.T))
        return h

    h0f, h0b = h0[0], h0[1]                            # (1, H) each
    h0f = jnp.broadcast_to(h0f, (B, h0f.shape[-1]))
    h0b = jnp.broadcast_to(h0b, (B, h0b.shape[-1]))

    fwd = run(x, p[f"{prefix}.weight_ih_l0"], p[f"{prefix}.weight_hh_l0"],
              p[f"{prefix}.bias_ih_l0"], p[f"{prefix}.bias_hh_l0"], h0f)

    # reverse each row within its valid length: pos -> len-1-pos
    rev_idx = jnp.clip(lengths[:, None] - 1 - idx[None, :], 0, L - 1)
    x_rev = jnp.take_along_axis(x, rev_idx[..., None], axis=1)
    bwd = run(x_rev, p[f"{prefix}.weight_ih_l0_reverse"], p[f"{prefix}.weight_hh_l0_reverse"],
              p[f"{prefix}.bias_ih_l0_reverse"], p[f"{prefix}.bias_hh_l0_reverse"], h0b)

    return jnp.concatenate([fwd, bwd], axis=-1)


def movement_encoder(p: Dict, motions: jnp.ndarray) -> jnp.ndarray:
    """(B, L, D) -> (B, L/4, latent) (reference: modules.py:79-98).
    Dropout layers are identity at eval."""
    h = _conv1d_s2(p["main.0.weight"], p["main.0.bias"], motions)
    h = _leaky_relu(h)
    h = _conv1d_s2(p["main.3.weight"], p["main.3.bias"], h)
    h = _leaky_relu(h)
    return _linear(p, "out_net", h)


def motion_encoder(p: Dict, movements: jnp.ndarray, m_lens: jnp.ndarray) -> jnp.ndarray:
    """(B, L', latent), lengths -> (B, coemb) (reference: modules.py:353-386)."""
    h = _linear(p, "input_emb", movements)
    g = _bigru_last(p, "gru", h, m_lens, p["hidden"][:, 0, :])
    g = _linear(p, "output_net.0", g)
    g = _layer_norm(p, "output_net.1", g)
    g = _leaky_relu(g)
    return _linear(p, "output_net.3", g)


def text_encoder(p: Dict, word_embs: jnp.ndarray, pos_ohot: jnp.ndarray,
                 cap_lens: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 300) + (B, T, 15) + lengths -> (B, coemb)
    (reference: modules.py:311-350)."""
    pos = _linear(p, "pos_emb", pos_ohot)
    h = _linear(p, "input_emb", word_embs + pos)
    g = _bigru_last(p, "gru", h, cap_lens, p["hidden"][:, 0, :])
    g = _linear(p, "output_net.0", g)
    g = _layer_norm(p, "output_net.1", g)
    g = _leaky_relu(g)
    return _linear(p, "output_net.3", g)


def synthetic_t2m_params(dim_pose: int = 263, strip_last4: bool = True,
                         seed: int = 0) -> Dict[str, Dict[str, np.ndarray]]:
    """Random parameter dicts with the REAL checkpoint key layout and dims
    (finest.tar / the MDM T2M evaluator) — for shape-honest benchmarks and
    tests without the gated asset: every conv/GRU/linear has the protocol's
    dimensions, only the values are random. Protocol dims per
    reference utils/eval/evaluator_wrapper.py:220-240 + modules.py."""
    from .word_vectorizer import POS_enumerator

    rng = np.random.default_rng(seed)

    def W(*s):
        return (rng.normal(size=s) * 0.02).astype(np.float32)

    d_in = dim_pose - 4 if strip_last4 else dim_pose
    hid_mov, lat_mov = 512, 512
    movement = {
        "main.0.weight": W(hid_mov, d_in, 4), "main.0.bias": W(hid_mov),
        "main.3.weight": W(lat_mov, hid_mov, 4), "main.3.bias": W(lat_mov),
        "out_net.weight": W(lat_mov, lat_mov), "out_net.bias": W(lat_mov),
    }

    def bigru(prefix_in: int, hid: int):
        p = {}
        for sfx in ("", "_reverse"):
            p[f"gru.weight_ih_l0{sfx}"] = W(3 * hid, prefix_in)
            p[f"gru.weight_hh_l0{sfx}"] = W(3 * hid, hid)
            p[f"gru.bias_ih_l0{sfx}"] = W(3 * hid)
            p[f"gru.bias_hh_l0{sfx}"] = W(3 * hid)
        p["hidden"] = W(2, 1, hid)
        return p

    dim_word, dim_pos = 300, len(POS_enumerator)
    hid_txt, hid_mot, coemb = 512, 1024, 512
    text = {
        "pos_emb.weight": W(dim_word, dim_pos), "pos_emb.bias": W(dim_word),
        "input_emb.weight": W(hid_txt, dim_word), "input_emb.bias": W(hid_txt),
        **bigru(hid_txt, hid_txt),
        "output_net.0.weight": W(hid_txt, 2 * hid_txt), "output_net.0.bias": W(hid_txt),
        "output_net.1.weight": W(hid_txt), "output_net.1.bias": W(hid_txt),
        "output_net.3.weight": W(coemb, hid_txt), "output_net.3.bias": W(coemb),
    }
    motion = {
        "input_emb.weight": W(hid_mot, lat_mov), "input_emb.bias": W(hid_mot),
        **bigru(hid_mot, hid_mot),
        "output_net.0.weight": W(hid_mot, 2 * hid_mot), "output_net.0.bias": W(hid_mot),
        "output_net.1.weight": W(hid_mot), "output_net.1.bias": W(hid_mot),
        "output_net.3.weight": W(coemb, hid_mot), "output_net.3.bias": W(coemb),
    }
    return {"movement_encoder": movement, "text_encoder": text,
            "motion_encoder": motion}


def load_t2m_checkpoint(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read the torch ``finest.tar`` and return numpy param dicts keyed
    'movement_encoder' / 'text_encoder' / 'motion_encoder'
    (reference: evaluator_wrapper.py:211-216)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for net in ("movement_encoder", "text_encoder", "motion_encoder"):
        out[net] = {k: v.detach().numpy().astype(np.float32) for k, v in ckpt[net].items()}
    return out
