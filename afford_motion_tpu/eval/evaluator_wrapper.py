"""Frozen text-motion-match evaluator wrapper
(reference: utils/eval/evaluator_wrapper.py:177-287).

Wraps the JAX T2M encoders with the reference's co-embedding protocol:
length-sorted batches, movement encoding at unit_length=4, text encoding
over padded token sequences. Two configurations:
- 'ours': dim_pose=66 (the in-repo retrained evaluator for pos-repr sets)
- 'mdm' : dim_pose=263, motion input strips the last 4 channels (the
  original T2M/MDM evaluator convention)
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .t2m_models import load_t2m_checkpoint, motion_encoder, movement_encoder, text_encoder
from .word_vectorizer import POS_enumerator

OURS_OPT = {
    "dim_word": 300,
    "max_motion_length": 196,
    "dim_pos_ohot": len(POS_enumerator),
    "dim_motion_hidden": 1024,
    "max_text_len": 20,
    "dim_text_hidden": 512,
    "dim_coemb_hidden": 512,
    "dim_pose": 66,
    "dim_movement_enc_hidden": 512,
    "dim_movement_latent": 512,
    "unit_length": 4,
    "strip_last4": False,
}

MDM_OPT = dict(OURS_OPT, dim_pose=263, strip_last4=True)


class EvaluatorWrapper:
    """(reference: evaluator_wrapper.py:220-287)."""

    def __init__(self, ckpt_path: str, variant: str = "ours", params=None):
        self.opt = dict(OURS_OPT if variant == "ours" else MDM_OPT)
        # ``params``: pre-built parameter dicts (e.g. t2m_models.
        # synthetic_t2m_params for shape-honest benches) bypass the torch
        # checkpoint load
        self.params = params if params is not None else load_t2m_checkpoint(ckpt_path)
        # Params are passed as jit ARGUMENTS, not closure constants: with
        # them baked into the HLO every distinct checkpoint is a distinct
        # program — a persistent-compile-cache MISS and a full ~3.5 min
        # remote compile per checkpoint per process (measured: the whole
        # offline eval was compile-bound because of this). As arguments
        # the program is checkpoint-independent: one compile per shape,
        # shared across processes/checkpoints via the persistent cache;
        # weights upload once per process.
        self._dev_params = None
        self._co = jax.jit(self._co_embeddings)
        self._mo = jax.jit(self._motion_embedding)
        # Device-input fast path (HBM-staged pools,
        # eval_humanml.DeviceResidentPool): the length-sort permutation is
        # applied as a standalone EAGER device gather, then the SAME
        # jitted executable as the host path runs. Keeping the gather out
        # of the jitted program guarantees bit-identical embeddings —
        # fusing it in compiles a different XLA program whose tiling
        # drifts at the ULP level (observed on TPU at protocol scale).

    def _staged_params(self):
        """Stage checkpoint weights in HBM as ONE packed transfer.

        ``jax.device_put`` of the raw pytree issues one RPC per leaf on
        the remote backend — measured MINUTES for this 42-leaf/87 MB tree
        through the tunnel, and it was the hidden variable cost of every
        fresh-process evaluation. A single concatenated upload runs at
        wire speed; the per-leaf views are device-side slices (bitwise
        the same values)."""
        if self._dev_params is None:
            leaves, treedef = jax.tree_util.tree_flatten(self.params)
            np_leaves = [np.asarray(l) for l in leaves]
            by_dtype = {}
            for i, l in enumerate(np_leaves):
                by_dtype.setdefault(l.dtype.str, []).append(i)
            out = [None] * len(np_leaves)
            for dt, idxs in by_dtype.items():
                flat = np.concatenate([np_leaves[i].ravel() for i in idxs])
                dev = jnp.asarray(flat)  # one transfer per dtype group
                o = 0
                for i in idxs:
                    n = np_leaves[i].size
                    out[i] = dev[o: o + n].reshape(np_leaves[i].shape)
                    o += n
            self._dev_params = jax.tree_util.tree_unflatten(treedef, out)
        return self._dev_params

    # ---------------------------------------------------------------- kernels
    def _motion_embedding(self, params, motions, m_lens):
        if self.opt["strip_last4"]:
            motions = motions[..., :-4]
        movements = movement_encoder(params["movement_encoder"], motions)
        return motion_encoder(
            params["motion_encoder"], movements, m_lens // self.opt["unit_length"]
        )

    def _co_embeddings(self, params, word_embs, pos_ohot, cap_lens, motions, m_lens):
        motion_emb = self._motion_embedding(params, motions, m_lens)
        text_emb = text_encoder(
            params["text_encoder"], word_embs, pos_ohot, cap_lens
        )
        return text_emb, motion_emb

    # ------------------------------------------------------------------- API
    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions, m_lens,
                          unsort: bool = False, device_out: bool = False):
        """Length-desc-sorted protocol; text output re-aligned to the sorted
        motion order, matching the reference's semantics
        (evaluator_wrapper.py:254-273: both outputs follow align_idx).

        ``unsort=True`` returns both outputs in the INPUT row order
        instead (inverse permutation applied). Embedding VALUES are
        per-item (the encoders have no cross-item ops), so this changes
        only row order — used by the pooled extraction path, where one
        device call covers several protocol pools and each pool's rows
        must come back in place.

        ``device_out=True`` returns jax arrays WITHOUT the blocking
        device->host pull (the unsort gather runs on device) — callers
        batching many chunks pull once at the end instead of paying one
        blocking round-trip per chunk."""
        m_arr = np.asarray(m_lens)
        align_idx = np.argsort(m_arr)[::-1].copy()
        if isinstance(motions, jax.Array):
            # eager on-device gather, then the same compiled _co as below
            motions_s = motions.astype(jnp.float32)[jnp.asarray(align_idx)]
        else:
            motions_s = jnp.asarray(np.asarray(motions)[align_idx], dtype=jnp.float32)
        text_emb, motion_emb = self._co(
            self._staged_params(),
            jnp.asarray(word_embs, dtype=jnp.float32),
            jnp.asarray(pos_ohot, dtype=jnp.float32),
            jnp.asarray(cap_lens),
            motions_s,
            jnp.asarray(m_arr[align_idx]),
        )
        if device_out:
            perm = np.argsort(align_idx) if unsort else None
            if perm is not None:
                return text_emb, motion_emb[jnp.asarray(perm)]
            return text_emb[jnp.asarray(align_idx)], motion_emb
        text_emb, motion_emb = np.asarray(text_emb), np.asarray(motion_emb)
        if unsort:
            # text was computed in input order; motion needs the inverse
            return text_emb, motion_emb[np.argsort(align_idx)]
        return text_emb[align_idx], motion_emb

    def get_motion_embeddings(self, motions, m_lens, unsort: bool = False,
                              device_out: bool = False):
        m_arr = np.asarray(m_lens)
        align_idx = np.argsort(m_arr)[::-1].copy()
        if isinstance(motions, jax.Array):
            motions_s = motions.astype(jnp.float32)[jnp.asarray(align_idx)]
        else:
            motions_s = jnp.asarray(np.asarray(motions)[align_idx], dtype=jnp.float32)
        emb = self._mo(self._staged_params(), motions_s,
                       jnp.asarray(m_arr[align_idx]))
        if device_out:
            return emb[jnp.asarray(np.argsort(align_idx))] if unsort else emb
        emb = np.asarray(emb)
        return emb[np.argsort(align_idx)] if unsort else emb
