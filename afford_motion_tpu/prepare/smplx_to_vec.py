"""SMPL-X parameter sequences -> 22-joint position vectors + mirror
augmentation (reference: prepare/smplx_to_vec.py:18-96), using the JAX
SMPL-X LBS instead of smplkit. Hand poses influence only hand joints (all
descendants of the wrists), so the 22 body-joint output is identical with
hands at rest."""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..eval.smplx_lbs import SMPLXModel, smplx_joints

JOINTS = 22
RIGHT_CHAIN = [2, 5, 8, 11, 14, 17, 19, 21]
LEFT_CHAIN = [1, 4, 7, 10, 13, 16, 18, 20]


def convert_smplx_to_pos(
    smplx: Tuple[np.ndarray, np.ndarray],
    model: SMPLXModel,
    same_betas: bool = False,
) -> np.ndarray:
    """(pose_seq (L, >=69), betas (n_betas,)) -> (L, 66) joint positions."""
    import jax.numpy as jnp

    pose_seq, betas = smplx
    L = pose_seq.shape[0]
    betas = np.zeros_like(betas) if same_betas else betas
    betas_b = jnp.broadcast_to(jnp.asarray(betas, dtype=jnp.float32), (L, len(betas)))
    # joints-only forward (bit-identical joints; skips the vertex stack)
    joints = smplx_joints(
        model,
        jnp.asarray(pose_seq[:, :3], dtype=jnp.float32),
        jnp.asarray(pose_seq[:, 3:6], dtype=jnp.float32),
        jnp.asarray(pose_seq[:, 6:69], dtype=jnp.float32),
        betas=betas_b,
    )
    return np.asarray(joints[:, :JOINTS, :]).reshape(L, JOINTS * 3).astype(np.float32)


def mirror_pos(joints: np.ndarray) -> np.ndarray:
    """x-flip + left/right chain swap (reference: smplx_to_vec.py:22-33)."""
    m = joints.copy().reshape(-1, JOINTS, 3)
    m[:, :, 0] *= -1
    tmp = m[:, RIGHT_CHAIN, :].copy()
    m[:, RIGHT_CHAIN, :] = m[:, LEFT_CHAIN, :]
    m[:, LEFT_CHAIN, :] = tmp
    return m.reshape(-1, JOINTS * 3).astype(np.float32)


def smplx_to_vec(
    smplx: Tuple[np.ndarray, np.ndarray],
    dataset: str,
    save_path: str,
    model: Optional[SMPLXModel] = None,
) -> None:
    """HumanML3D gets the mirrored twin saved as M<name>.npy
    (reference: smplx_to_vec.py:69-96)."""
    model = model or SMPLXModel.load_default()
    same_betas = dataset == "HumanML3D"
    vec = convert_smplx_to_pos(smplx, model, same_betas=same_betas)
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    np.save(save_path, vec)
    if dataset == "HumanML3D":
        dirname, basename = os.path.dirname(save_path), os.path.basename(save_path)
        np.save(os.path.join(dirname, "M" + basename), mirror_pos(vec))
