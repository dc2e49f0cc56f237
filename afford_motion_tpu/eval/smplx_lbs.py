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

import functools
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
            # tests / demos without the real body model on disk;
            # SMPLX_SYNTHETIC_VERTS/FACES pick the mesh resolution (the
            # protocol rehearsal uses the official 10475/20908 so every
            # LBS/SDF shape is production-honest)
            nv = int(os.environ.get("SMPLX_SYNTHETIC_VERTS", "128"))
            nf = os.environ.get("SMPLX_SYNTHETIC_FACES", "")
            return cls.synthetic(num_verts=nv, num_faces=int(nf) if nf else None)
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
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Closed form ``R = cosθ·I + sinθ·K + (1−cosθ)·nnᵀ`` built elementwise —
    no ``K @ K`` batched 3x3 matmul (which XLA pads onto 128-wide MXU
    tiles; at ``Precision.HIGHEST`` that was ~half the joints-only LBS
    forward on chip, docs/PERF.md round-4 fit follow-up). Pure VPU f32."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    axis = axis_angle / jnp.maximum(angle, 1e-8)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    a = angle[..., 0]
    s, c = jnp.sin(a), jnp.cos(a)
    C = 1.0 - c
    R = jnp.stack([
        c + C * x * x,     -s * z + C * x * y, s * y + C * x * z,
        s * z + C * x * y, c + C * y * y,      -s * x + C * y * z,
        -s * y + C * x * z, s * x + C * y * z, c + C * z * z,
    ], axis=-1).reshape(axis_angle.shape[:-1] + (3, 3))
    return R


def _matmul44(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched 4x4 matmul in mul+sum form: exact f32 on the VPU instead
    of a contraction-4 dot padded onto 128-wide MXU tiles."""
    return (A[..., :, :, None] * B[..., None, :, :]).sum(axis=-2)


@functools.lru_cache(maxsize=8)
def _tree_levels(parents: tuple) -> tuple:
    """Joints grouped by kinematic-tree depth: ((idx, parent_idx), ...)
    for depths 1..max — the chain composes level-by-level (depth ~11 for
    SMPL-X) instead of joint-by-joint (54 sequential 4x4 matmuls)."""
    parents_np = np.asarray(parents)
    depth = np.zeros(len(parents_np), np.int64)
    for j in range(1, len(parents_np)):
        depth[j] = depth[parents_np[j]] + 1
    levels = []
    for d in range(1, int(depth.max()) + 1):
        idx = np.where(depth == d)[0]
        levels.append((idx, parents_np[idx]))
    return tuple(levels)


def chain_transforms(R: jnp.ndarray, rel: jnp.ndarray,
                     parents_np: np.ndarray) -> jnp.ndarray:
    """Per-joint local rigid transforms -> global transforms along the
    kinematic tree. R (J, 3, 3), rel (J, 3) -> (J, 4, 4). Level-batched:
    every joint at tree depth d composes with its (already-final) parent
    in one batched VPU 4x4 matmul, so the critical path is the tree depth
    (~11), not the joint count (55)."""
    T_local = _rigid_transform(R, rel)                       # (J, 4, 4)
    A = T_local
    for idx, par in _tree_levels(tuple(int(p) for p in parents_np)):
        A = A.at[idx].set(_matmul44(A[par], T_local[idx]))
    return A


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

        # kinematic chain, level-batched over tree depth (VPU 4x4 matmuls)
        rel = joints0.at[1:].add(-joints0[np.asarray(model.parents)[1:]])
        A = chain_transforms(R, rel, np.asarray(model.parents))   # (J, 4, 4)
        posed_joints = A[:, :3, 3]

        # remove the rest-pose joint locations from the skinning transforms
        # (mul+sum: a contraction-3 "matmul" belongs on the VPU, exact f32)
        correction = (A[:, :3, :3] * joints0[:, None, :]).sum(axis=-1)
        A_skin = A.at[:, :3, 3].add(-correction)

        T = jnp.einsum("vj,jab->vab", model.lbs_weights, A_skin,
                       precision=exact)                          # (V, 4, 4)
        v_h = jnp.concatenate([v_posed, jnp.ones((v_posed.shape[0], 1))], axis=-1)
        # per-vertex 4x4 blend in mul+sum form (contraction 4 — VPU)
        verts = (T * v_h[:, None, :]).sum(axis=-1)[:, :3]
        return verts + transl, posed_joints + transl

    if betas is None:
        betas = jnp.zeros((transl.shape[0], model.shapedirs.shape[-1]))
    # trace the WHOLE forward under highest matmul precision: besides the
    # three big annotated contractions, the 4x4 kinematic chain, the
    # correction einsum and the final (V,4,4)x(V,4) blend also land on the
    # MXU, where the f32 default rounds operands to bf16 (~5e-3 on verts)
    with jax.default_matmul_precision("highest"):
        return jax.vmap(single)(transl, orient, body_pose, betas)


def smplx_joints(
    model: SMPLXModel,
    transl: jnp.ndarray,      # (B, 3)
    orient: jnp.ndarray,      # (B, 3) axis-angle
    body_pose: jnp.ndarray,   # (B, 63)
    betas: Optional[jnp.ndarray] = None,  # (B, n_betas)
) -> jnp.ndarray:
    """Joints-only forward (B, J, 3) — bit-identical to
    ``smplx_forward(...)[1]``, but skips everything the joints don't
    depend on: the pose blendshapes and the whole vertex-skinning stack
    (posedirs, lbs_weights, the (V,4,4) blend) never touch the joints and
    are not traced at all. With ``betas=None`` additionally
    ``v_shaped == v_template`` exactly (``shapedirs @ 0 == 0`` in f32),
    so the rest-pose joints are a CONSTANT of the model — regressed ONCE
    (unbatched) instead of per frame. This is the hot path of the
    200-step Adam refinement (reference: utils/misc.py:78-125 optimizes a
    joints-only MSE): the batched per-frame J_regressor/shapedirs
    contractions over all V=10475 vertices were ~all of its FLOPs under
    ``Precision.HIGHEST``."""
    J = model.parents.shape[0]
    parents_np = np.asarray(model.parents)
    with jax.default_matmul_precision("highest"):
        exact = jax.lax.Precision.HIGHEST

        def rest_joints(betas_row) -> jnp.ndarray:               # (J, 3)
            v_shaped = model.v_template + jnp.einsum(
                "vdk,k->vd", model.shapedirs, betas_row, precision=exact)
            return jnp.matmul(model.J_regressor, v_shaped, precision=exact)

        def single(transl, orient, body_pose, joints0):
            rel = joints0.at[1:].add(-joints0[parents_np[1:]])
            full_pose = jnp.zeros((J, 3), dtype=orient.dtype)
            full_pose = full_pose.at[0].set(orient)
            full_pose = full_pose.at[1: 1 + NUM_BODY_JOINTS].set(
                body_pose.reshape(21, 3))
            R = rodrigues(full_pose)                               # (J, 3, 3)
            A = chain_transforms(R, rel, parents_np)               # (J, 4, 4)
            return A[:, :3, 3] + transl

        if betas is None:
            # constant across frames AND refinement steps (betas == 0)
            joints0 = jnp.matmul(model.J_regressor, model.v_template,
                                 precision=exact)                  # (J, 3)
            return jax.vmap(
                functools.partial(single, joints0=joints0)
            )(transl, orient, body_pose)
        joints0 = jax.vmap(rest_joints)(betas)
        return jax.vmap(single)(transl, orient, body_pose, joints0)


def params_to_verts_joints(model: SMPLXModel, params: jnp.ndarray):
    """69-d param rows -> (verts, joints[:, :22]) (reference: utils/misc.py:26-76)."""
    transl, orient, body_pose = params[:, :3], params[:, 3:6], params[:, 6:69]
    verts, joints = smplx_forward(model, transl, orient, body_pose)
    return verts, joints[:, :22, :]


def params_to_joints(model: SMPLXModel, params: jnp.ndarray) -> jnp.ndarray:
    """69-d param rows -> joints (B, 22, 3) via the joints-only forward."""
    transl, orient, body_pose = params[:, :3], params[:, 3:6], params[:, 6:69]
    return smplx_joints(model, transl, orient, body_pose)[:, :22, :]
