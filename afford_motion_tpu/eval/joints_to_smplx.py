"""Joints -> SMPL-X parameter projection + refinement
(reference: utils/joints_to_smplx.py:46-130, utils/misc.py:78-143).

A 2-layer transformer regressor maps 22x3 joint sequences to 69-d SMPL-X
parameters; an Adam refinement then minimizes the masked joint MSE (+ an
acceleration-smoothness term over the last 40% of steps). Unlike the
reference's per-sequence Python Adam loop, refinement here is one jitted
``lax.fori_loop`` over the padded batch.

The regressor weights come from the reference's torch checkpoint
(utils/joints_to_smplx/060.pt) via ``convert_torch_regressor``; the body
model is the JAX SMPL-X LBS (smplx_lbs.py).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..models.layers import PositionalEncoding, TransformerEncoder
from ..utils.io import get_logger
from .smplx_lbs import (
    SMPLXModel, params_to_joints, params_to_verts_joints, smplx_forward,
)

logger = get_logger()

NJOINTS = 22
PARAM_DIM = 3 + NJOINTS * 3  # 69


class JointsToSMPLXRegressor(nn.Module):
    """(reference: utils/joints_to_smplx.py:46-98)."""

    latent_dim: int = 256
    num_heads: int = 4
    ff_size: int = 512
    num_layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask=None, *, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.latent_dim // 2)(x)
        h = nn.relu(h)
        h = nn.Dense(self.latent_dim)(h)
        h = nn.relu(h)
        h = PositionalEncoding(self.latent_dim, dropout=self.dropout, max_len=1000)(
            h, train=train
        )
        h = TransformerEncoder(
            num_layers=self.num_layers, d_model=self.latent_dim,
            num_heads=self.num_heads, dim_feedforward=self.ff_size,
            dropout=self.dropout, activation=nn.relu,
        )(h, x_mask, train=train)
        return nn.Dense(PARAM_DIM)(h)


def convert_torch_regressor(path: str) -> Dict[str, Any]:
    """torch state dict (060.pt) -> flax params for JointsToSMPLXRegressor."""
    import torch

    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in torch.load(path, map_location="cpu", weights_only=False).items()}

    def dense(w, b):
        return {"kernel": w.T, "bias": b}

    params: Dict[str, Any] = {
        "Dense_0": dense(sd["input_layer.0.weight"], sd["input_layer.0.bias"]),
        "Dense_1": dense(sd["input_layer.2.weight"], sd["input_layer.2.bias"]),
        "Dense_2": dense(sd["output_layer.weight"], sd["output_layer.bias"]),
    }
    enc: Dict[str, Any] = {}
    n_layers = len({k.split(".")[2] for k in sd if k.startswith("TransEncoder.layers.")})
    for i in range(n_layers):
        p = f"TransEncoder.layers.{i}"
        d = sd[f"{p}.self_attn.in_proj_weight"].shape[1]
        in_w = sd[f"{p}.self_attn.in_proj_weight"]
        in_b = sd[f"{p}.self_attn.in_proj_bias"]
        qw, kw, vw = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        qb, kb, vb = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
        enc[f"TransformerEncoderLayer_{i}"] = {
            "TorchMultiHeadAttention_0": {
                "Dense_0": dense(qw, qb),
                "Dense_1": dense(kw, kb),
                "Dense_2": dense(vw, vb),
                "Dense_3": dense(sd[f"{p}.self_attn.out_proj.weight"],
                                 sd[f"{p}.self_attn.out_proj.bias"]),
            },
            "Dense_0": dense(sd[f"{p}.linear1.weight"], sd[f"{p}.linear1.bias"]),
            "Dense_1": dense(sd[f"{p}.linear2.weight"], sd[f"{p}.linear2.bias"]),
            "LayerNorm_0": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "LayerNorm_1": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
        }
    params["TransformerEncoder_0"] = enc
    return params


def save_regressor_npz(path: str, params: Dict[str, Any]) -> None:
    """Persist flax regressor params as a flat npz ('/'-joined keys)."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(getattr(k, "key", str(k)) for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_regressor_npz(path: str) -> Dict[str, Any]:
    flat = np.load(path)
    tree: Dict[str, Any] = {}
    for name in flat.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[name]
    return tree


def make_refine_fn(model: SMPLXModel, lr: float, steps: int):
    """Jitted Adam refinement of 69-d params against target joints
    (reference: utils/misc.py:78-125: joints MSE; + 0.1x acceleration
    penalty once step >= 0.6*steps). Masked frames contribute nothing."""

    smooth_start = int(0.6 * steps)

    @jax.jit
    def refine(init_params, joints, x_mask):
        # init_params (B, L, 69), joints (B, L, 66), x_mask (B, L) True=pad
        valid = (~x_mask).astype(jnp.float32)[..., None]
        tx = optax.adam(lr)

        def loss_fn(params, use_smooth):
            B, L, _ = params.shape
            flat = params.reshape(B * L, PARAM_DIM)
            # joints-only forward: bit-identical to params_to_verts_joints'
            # joints output, but the vertex stack and the per-frame
            # rest-joint regression (constant at betas=0) drop out of the
            # 200-step loop — see smplx_lbs.smplx_joints
            j = params_to_joints(model, flat)
            j = j.reshape(B, L, NJOINTS * 3)
            # masked mean over (valid frames, joints, 3) — the reference's
            # torch.mean over the unpadded sequence (utils/misc.py:133)
            jl = jnp.sum(((j - joints) ** 2) * valid) / jnp.maximum(
                jnp.sum(valid) * (NJOINTS * 3), 1.0
            )
            # acceleration smoothness over params
            vel = params[:, 1:] - params[:, :-1]
            acc = vel[:, 1:] - vel[:, :-1]
            acc_valid = valid[:, 2:] * valid[:, 1:-1] * valid[:, :-2]
            sl = jnp.sum((acc ** 2) * acc_valid) / jnp.maximum(jnp.sum(acc_valid) * PARAM_DIM, 1.0)
            return jl + use_smooth * 0.1 * sl

        def body(i, state):
            params, opt_state = state
            use_smooth = (i >= smooth_start).astype(jnp.float32)
            grads = jax.grad(loss_fn)(params, use_smooth)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, steps, body, (init_params, tx.init(init_params)))
        return params

    return refine


class JointsToSMPLXFitter:
    """Facade used by Text2MotionInSceneEvaluator
    (reference: utils/evaluate.py:254-279). Raises at construction when the
    regressor weights or SMPL-X model are missing so callers degrade."""

    def __init__(self, weights_path: str, opt_rate: float = 0.02, opt_steps: int = 200):
        if not weights_path or not Path(weights_path).exists():
            raise FileNotFoundError(f"JointsToSMPLX weights not found: {weights_path}")
        self.body_model = SMPLXModel.load_default()
        self.regressor = JointsToSMPLXRegressor()
        if weights_path.endswith(".npz"):
            # natively trained weights (tools/train_joints_to_smplx.py)
            self.params = {"params": load_regressor_npz(weights_path)}
        else:
            self.params = {"params": convert_torch_regressor(weights_path)}
        self.opt_rate = opt_rate
        self.opt_steps = opt_steps
        self._refine = make_refine_fn(self.body_model, opt_rate, opt_steps)
        self._predict = jax.jit(
            lambda p, x, m: self.regressor.apply(p, x, m, train=False)
        )
        # jitted LBS forward: the eager per-op cascade of smplx_forward is
        # ~20x slower than the compiled program on a remote backend
        # (round-5 scene-protocol probe: 653ms vs 34ms per 196-frame
        # sequence); model arrays are closure constants so the np.asarray
        # on parents resolves at trace time
        self._verts_fn = jax.jit(
            lambda p: params_to_verts_joints(self.body_model, p)[0]
        )

    @property
    def faces(self) -> np.ndarray:
        return self.body_model.faces

    def fit(self, joints: np.ndarray, x_mask: np.ndarray) -> np.ndarray:
        """(B, L, 66) + (B, L) -> refined params (B, L, 69).

        On a multi-device mesh the batch shards over the data axis (GSPMD
        — regressor params replicated, rows independent; per-row results
        match single-device to fp reduction-order level — CPU-mesh
        equivalence test). One chip saturates at a single 196-frame sequence
        (docs/PERF.md round-4 fit batch scan), so eval fit throughput
        scales with the mesh, like the test sampler (test.py:118-141)."""
        from ..parallel.mesh import create_mesh_for_batch, replicate, shard_batch

        joints = np.asarray(joints, dtype=np.float32)
        x_mask_np = np.asarray(x_mask)
        mesh = create_mesh_for_batch(len(joints))
        if len(mesh.devices.ravel()) > 1:
            params = replicate(self.params, mesh)
            sharded = shard_batch(
                {"joints": joints, "x_mask": x_mask_np}, mesh)
            pred = self._predict(params, sharded["joints"], sharded["x_mask"])
            return np.asarray(
                self._refine(pred, sharded["joints"], sharded["x_mask"]))
        joints = jnp.asarray(joints)
        x_mask = jnp.asarray(x_mask_np)
        pred = self._predict(self.params, joints, x_mask)
        return np.asarray(self._refine(pred, joints, x_mask))

    def vertices(self, params: np.ndarray) -> np.ndarray:
        """Fitted params (L, 69) -> body vertices (L, V, 3) via the jitted
        LBS (one sequence per call keeps the (L, V, 4, 4) skinning
        transforms small; fitting is the batched part)."""
        return np.asarray(self.vertices_device(params))

    def vertices_device(self, params: np.ndarray):
        """Device-resident form of :meth:`vertices` — consumers that feed
        the vertex stack straight back into jitted physics (evaluate.py
        eval_physics) must NOT round-trip the ~25MB (L, V, 3) array
        through the host (round-5 rehearsal finding: on a tunneled
        backend that D2H+H2D pair was ~1s per sequence, dominating the
        scene protocol)."""
        return self._verts_fn(jnp.asarray(params, dtype=jnp.float32))

    def to_vertices(self, joints: np.ndarray, x_mask: np.ndarray) -> np.ndarray:
        """(B, L, 66) -> list-like (B, l_valid?, V, 3); returns the padded
        (B, L, V, 3) array — callers mask with x_mask."""
        params = self.fit(joints, x_mask)
        B, L, _ = params.shape
        verts = self.vertices(params.reshape(B * L, PARAM_DIM)).reshape(B, L, -1, 3)
        # trim to valid frames for the first sequence-style usage
        return [verts[b][~np.asarray(x_mask[b])] for b in range(B)]
