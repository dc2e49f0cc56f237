"""SMPL-X body model (linear blend skinning) in JAX.

Replaces the reference's smplkit dependency (reference: utils/misc.py:24-76
— neutral SMPL-X layer driven by 69-d params: transl(3) ⊕ orient(3,
axis-angle) ⊕ body_pose(63 = 21 joints axis-angle); hands/face are left at
rest). Loads the official SMPLX_NEUTRAL.npz when available; a synthetic
model with the same structure drives unit tests.

The whole forward (Rodrigues -> pose blendshapes -> kinematic chain ->
skinning) is jit-compatible and vmapped over frames, so the evaluator's
per-sequence fitting loop runs on device.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

NUM_JOINTS = 55          # SMPL-X: pelvis + 21 body + jaw + 2 eyes + 30 hand
NUM_BODY_JOINTS = 21


@struct.dataclass
class SMPLXModel:
    v_template: jnp.ndarray    # (V, 3)
    shapedirs: jnp.ndarray     # (V, 3, n_betas)
    posedirs: jnp.ndarray      # ((J-1)*9, V*3)
    J_regressor: jnp.ndarray   # (J, V)
    lbs_weights: jnp.ndarray   # (V, J)
    parents: jnp.ndarray       # (J,) int32, parents[0] == -1
    faces_arr: jnp.ndarray     # (F, 3) int32

    @property
    def faces(self) -> np.ndarray:
        return np.asarray(self.faces_arr)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    # ------------------------------------------------------------------ load
    @classmethod
    def load(cls, path: str) -> "SMPLXModel":
        """Load from the official SMPLX_NEUTRAL.npz (allow_pickle for the
        chumpy-free exports) — keys: v_template, shapedirs, posedirs,
        J_regressor, weights, kintree_table, f."""
        data = np.load(path, allow_pickle=True)
        parents = np.asarray(data["kintree_table"])[0].astype(np.int64)
        parents[0] = -1
        posedirs = np.asarray(data["posedirs"], dtype=np.float32)  # (V, 3, (J-1)*9)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T      # ((J-1)*9, V*3)
        shapedirs = np.asarray(data["shapedirs"], dtype=np.float32)[..., :10]
        return cls(
            v_template=jnp.asarray(data["v_template"], dtype=jnp.float32),
            shapedirs=jnp.asarray(shapedirs),
            posedirs=jnp.asarray(posedirs),
            J_regressor=jnp.asarray(data["J_regressor"], dtype=jnp.float32),
            lbs_weights=jnp.asarray(data["weights"], dtype=jnp.float32),
            parents=jnp.asarray(parents, dtype=jnp.int32),
            faces_arr=jnp.asarray(np.asarray(data["f"], dtype=np.int64), dtype=jnp.int32),
        )

    @classmethod
    def load_default(cls) -> "SMPLXModel":
        if os.environ.get("SMPLX_USE_SYNTHETIC"):
            # tests / demos without the real body model on disk
            return cls.synthetic()
        for cand in (
            os.environ.get("SMPLX_MODEL_PATH", ""),
            "./data/smplx/SMPLX_NEUTRAL.npz",
            "./data/body_models/smplx/SMPLX_NEUTRAL.npz",
        ):
            if cand and Path(cand).exists():
                return cls.load(cand)
        raise FileNotFoundError(
            "SMPL-X body model not found (set SMPLX_MODEL_PATH or place "
            "SMPLX_NEUTRAL.npz under ./data/smplx/)"
        )

    @classmethod
    def synthetic(cls, num_verts: int = 128, seed: int = 0,
                  num_faces: Optional[int] = None) -> "SMPLXModel":
        """Random model with the real kinematic structure, for tests — and,
        at ``num_verts=10475, num_faces=20908`` (the official SMPL-X mesh
        resolution), for shape-honest eval benchmarks without the gated
        asset: every matmul/scatter in the LBS and SDF paths has the real
        dimensions, only the values are random."""
        rng = np.random.default_rng(seed)
        # SMPL-X parent table (first 22 joints are the body; the rest hang
        # off wrists/neck)
        parents = np.array(
            [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
             15, 15, 15,
             20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
             21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53],
            dtype=np.int64,
        )
        J = len(parents)
        v_template = rng.normal(size=(num_verts, 3)).astype(np.float32) * 0.3
        # J_regressor: soft assignment so regressed joints are plausible
        reg = np.abs(rng.normal(size=(J, num_verts)).astype(np.float32))
        reg = reg / reg.sum(axis=1, keepdims=True)
        w = np.abs(rng.normal(size=(num_verts, J)).astype(np.float32))
        w = w / w.sum(axis=1, keepdims=True)
        n_faces = num_faces if num_faces is not None else max(num_verts, 4)
        faces = rng.integers(0, num_verts, size=(n_faces, 3)).astype(np.int64)
        return cls(
            v_template=jnp.asarray(v_template),
            shapedirs=jnp.asarray(rng.normal(size=(num_verts, 3, 10)).astype(np.float32) * 0.01),
            posedirs=jnp.asarray(rng.normal(size=((J - 1) * 9, num_verts * 3)).astype(np.float32) * 0.001),
            J_regressor=jnp.asarray(reg),
            lbs_weights=jnp.asarray(w),
            parents=jnp.asarray(parents, dtype=jnp.int32),
            faces_arr=jnp.asarray(faces, dtype=jnp.int32),
        )


def rodrigues(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    axis = axis_angle / jnp.maximum(angle, 1e-8)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([
        zeros, -z, y,
        z, zeros, -x,
        -y, x, zeros,
    ], axis=-1).reshape(axis_angle.shape[:-1] + (3, 3))
    a = angle[..., None]
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    return eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * (K @ K)


def _rigid_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(J, 3, 3), (J, 3) -> (J, 4, 4) homogeneous."""
    J = R.shape[0]
    top = jnp.concatenate([R, t[:, :, None]], axis=-1)          # (J, 3, 4)
    bottom = jnp.broadcast_to(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (J, 1, 4))
    return jnp.concatenate([top, bottom], axis=1)


def smplx_forward(
    model: SMPLXModel,
    transl: jnp.ndarray,      # (B, 3)
    orient: jnp.ndarray,      # (B, 3) axis-angle
    body_pose: jnp.ndarray,   # (B, 63) axis-angle for joints 1..21
    betas: Optional[jnp.ndarray] = None,  # (B, n_betas)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (vertices (B, V, 3), joints (B, J, 3))."""

    def single(transl, orient, body_pose, betas):
        J = model.parents.shape[0]
        # HIGHEST: the TPU MXU default rounds f32 operands to bf16; the
        # J_regressor contraction is over all V=10475 verts, where that
        # rounding visibly shifts the regressed joints (same bug class as
        # the round-3/4 _dot_precision fixes)
        exact = jax.lax.Precision.HIGHEST
        v_shaped = model.v_template + jnp.einsum(
            "vdk,k->vd", model.shapedirs, betas, precision=exact
        )
        joints0 = jnp.matmul(model.J_regressor, v_shaped,
                             precision=exact)                   # (J, 3)

        full_pose = jnp.zeros((J, 3), dtype=orient.dtype)
        full_pose = full_pose.at[0].set(orient)
        full_pose = full_pose.at[1: 1 + NUM_BODY_JOINTS].set(body_pose.reshape(21, 3))
        R = rodrigues(full_pose)                                 # (J, 3, 3)

        pose_feature = (R[1:] - jnp.eye(3)).reshape(-1)          # ((J-1)*9,)
        v_posed = v_shaped + jnp.matmul(
            pose_feature, model.posedirs, precision=exact).reshape(-1, 3)

        # kinematic chain: parents come earlier, so a python loop over the
        # static tree unrolls into a fixed op DAG
        rel = joints0.at[1:].add(-joints0[np.asarray(model.parents)[1:]])
        transforms = [_rigid_transform(R[:1], rel[:1])[0]]
        parents_np = np.asarray(model.parents)
        for j in range(1, J):
            Tj = transforms[parents_np[j]] @ _rigid_transform(R[j: j + 1], rel[j: j + 1])[0]
            transforms.append(Tj)
        A = jnp.stack(transforms)                                 # (J, 4, 4)
        posed_joints = A[:, :3, 3]

        # remove the rest-pose joint locations from the skinning transforms
        correction = jnp.einsum("jab,jb->ja", A[:, :3, :3], joints0)
        A_skin = A.at[:, :3, 3].add(-correction)

        T = jnp.einsum("vj,jab->vab", model.lbs_weights, A_skin,
                       precision=exact)                          # (V, 4, 4)
        v_h = jnp.concatenate([v_posed, jnp.ones((v_posed.shape[0], 1))], axis=-1)
        verts = jnp.einsum("vab,vb->va", T, v_h)[:, :3]
        return verts + transl, posed_joints + transl

    if betas is None:
        betas = jnp.zeros((transl.shape[0], model.shapedirs.shape[-1]))
    # trace the WHOLE forward under highest matmul precision: besides the
    # three big annotated contractions, the 4x4 kinematic chain, the
    # correction einsum and the final (V,4,4)x(V,4) blend also land on the
    # MXU, where the f32 default rounds operands to bf16 (~5e-3 on verts)
    with jax.default_matmul_precision("highest"):
        return jax.vmap(single)(transl, orient, body_pose, betas)


def params_to_verts_joints(model: SMPLXModel, params: jnp.ndarray):
    """69-d param rows -> (verts, joints[:, :22]) (reference: utils/misc.py:26-76)."""
    transl, orient, body_pose = params[:, :3], params[:, 3:6], params[:, 6:69]
    verts, joints = smplx_forward(model, transl, orient, body_pose)
    return verts, joints[:, :22, :]
