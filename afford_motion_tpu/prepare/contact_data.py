"""Contact-map training data generation
(reference: prepare/generate_contact_data.py:361-487).

Per motion/scene pair: crop a REGION_SIZE x REGION_SIZE window jittered
around the pelvis trajectory, sample num_points scene points, recenter
(xy bbox middle, 2%-height floor), and compute the per-joint chamfer
distance map (for each scene point: distance to the nearest trajectory
position of each of the 22 joints). Outputs exactly the files the datasets
read: motions/{i:05d}.npy, contacts/{i:05d}.npz{points,mask,dist}, anno.csv.

The chamfer hotspot (BASELINE.md flags it) runs either on host KDTree
(sklearn) or as a jitted brute-force distance matmul on the accelerator —
the (L*22) x N distance problem is tiny for the MXU.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

JOINTS = 22


def chamfer_distance_host(
    x: np.ndarray, y: np.ndarray
) -> np.ndarray:
    """min_x ||y - x|| for each y — the 'y_to_x' directed chamfer used by
    the reference (generate_contact_data.py:449-455) via sklearn KDTree."""
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=1, algorithm="kd_tree").fit(x)
    dist, _ = nn.kneighbors(y)
    return dist  # (len(y), 1)


def joint_distance_map(
    pose_seq: np.ndarray, scene_xyz: np.ndarray, device: bool = True
) -> np.ndarray:
    """(L, 22, 3) trajectory + (N, 3) scene -> (N, 22) min distances."""
    if device:
        try:
            return _joint_distance_map_jax(pose_seq, scene_xyz)
        except Exception:
            pass
    dist = [
        chamfer_distance_host(pose_seq[:, j, :], scene_xyz) for j in range(pose_seq.shape[1])
    ]
    return np.concatenate(dist, axis=-1).astype(np.float32)


def _joint_distance_map_jax(pose_seq: np.ndarray, scene_xyz: np.ndarray) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def compute(traj, scene):
        # traj (L, J, 3), scene (N, 3)
        t2 = jnp.sum(traj * traj, axis=-1)                     # (L, J)
        s2 = jnp.sum(scene * scene, axis=-1)                   # (N,)
        cross = jnp.einsum(
            "ljd,nd->ljn", traj, scene, precision=lax.Precision.HIGHEST
        )
        d2 = jnp.maximum(t2[..., None] - 2 * cross + s2[None, None, :], 0.0)
        return jnp.sqrt(d2.min(axis=0)).T                       # (N, J)

    return np.asarray(compute(jnp.asarray(pose_seq), jnp.asarray(scene_xyz)))


_BATCH_KERNELS: Dict[Tuple[int, int, int], object] = {}


def joint_distance_map_batch(
    pose_seqs: Sequence[np.ndarray], scenes: np.ndarray
) -> np.ndarray:
    """Batched corpus-scale form of :func:`joint_distance_map`: ``B``
    variable-length (L_i, J, 3) trajectories + (B, N, 3) scenes ->
    (B, N, J) min distances in ONE jitted device call.

    The per-pair path recompiles for every distinct trajectory length and
    pays one dispatch + one host->device transfer per pair — pathological
    at corpus scale on a remote backend (reference offline cost:
    prepare/generate_contact_data.py:361-487 runs this per pair on KDTree).
    Here trajectories pad to a bucketed L_max (few compile shapes), padding
    rows are masked to +inf before the min, so results are bit-identical
    to the per-pair kernel (tests/test_prepare.py pins this)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = len(pose_seqs)
    J = pose_seqs[0].shape[1]
    N = scenes.shape[1]
    lmax = max(p.shape[0] for p in pose_seqs)
    lmax = -(-lmax // 32) * 32  # bucket to multiples of 32
    traj = np.zeros((B, lmax, J, 3), dtype=np.float32)
    lens = np.zeros((B,), dtype=np.int32)
    for i, p in enumerate(pose_seqs):
        traj[i, : p.shape[0]] = p
        lens[i] = p.shape[0]

    key = (lmax, J, N)
    if key not in _BATCH_KERNELS:
        @jax.jit
        def compute(traj, lens, scene):
            t2 = jnp.sum(traj * traj, axis=-1)                 # (B, L, J)
            s2 = jnp.sum(scene * scene, axis=-1)               # (B, N)
            cross = jnp.einsum(
                "bljd,bnd->bljn", traj, scene, precision=lax.Precision.HIGHEST
            )
            d2 = jnp.maximum(
                t2[..., None] - 2 * cross + s2[:, None, None, :], 0.0
            )
            valid = jnp.arange(traj.shape[1])[None, :] < lens[:, None]
            d2 = jnp.where(valid[:, :, None, None], d2, jnp.inf)
            return jnp.sqrt(d2.min(axis=1)).swapaxes(1, 2)     # (B, N, J)

        _BATCH_KERNELS[key] = compute
    return np.asarray(_BATCH_KERNELS[key](
        jnp.asarray(traj), jnp.asarray(lens), jnp.asarray(scenes)
    ))


def _flush_pending(pending: List[Tuple], save_dir: str, device: bool) -> None:
    """Compute the chamfer maps for a chunk of staged pairs (one batched
    device call when available) and write the per-pair output files."""
    if device and len(pending) > 1:
        try:
            dists = joint_distance_map_batch(
                [p[1] for p in pending],
                np.stack([p[2][:, 0:3] for p in pending]),
            )
        except Exception:
            dists = [joint_distance_map(p[1], p[2][:, 0:3], device=False)
                     for p in pending]
    else:
        dists = [joint_distance_map(p[1], p[2][:, 0:3], device=device)
                 for p in pending]
    for (i, pose_seq, points, indices), dist in zip(pending, dists):
        np.save(os.path.join(save_dir, "motions", f"{i:05d}.npy"), pose_seq)
        np.savez(
            os.path.join(save_dir, "contacts", f"{i:05d}.npz"),
            points=points, mask=indices, dist=np.asarray(dist),
        )


def process(
    motions: Sequence[Tuple],
    scene_data: Dict[str, Dict],
    save_dir: str,
    num_points: int = 8192,
    region_size: float = 4.0,
    traj_pad_ratio: float = 0.5,
    rng: Optional[np.random.Generator] = None,
    chunk: int = 16,
    device: bool = True,
) -> None:
    """Process motion-condition pairs into the contact_motion tree.

    ``motions``: iterable of (pose_seq (L, >=66), texts | None,
    (scene_id, scene_trans 4x4), other_info dict).
    ``scene_data``: scene_id -> {'pcd': (N, 6) xyz+rgb}.
    """
    rng = rng or np.random.default_rng()
    TRAJ_PAD = region_size * traj_pad_ratio
    os.makedirs(os.path.join(save_dir, "motions"), exist_ok=True)
    os.makedirs(os.path.join(save_dir, "contacts"), exist_ok=True)

    anno_rows: List[List[str]] = []
    pending: List[Tuple] = []  # chunked device chamfer (joint_distance_map_batch)
    for i, (pose_seq, texts, (scene_id, scene_trans), other_info) in enumerate(motions):
        pose_seq = pose_seq.copy().astype(np.float32)
        pelvis_seq = pose_seq[:, :3]
        pose_seq = pose_seq[:, : JOINTS * 3].reshape(-1, JOINTS, 3)
        utterances = "$$".join(texts) if texts else ""
        append_info = "".join(str(v) for v in (other_info or {}).values())

        assert scene_id is not None
        scene_trans = np.asarray(scene_trans, dtype=np.float32)[0:3, -1].copy()

        # region window around the trajectory, jittered
        traj_max = pelvis_seq.max(axis=0)[0:2]
        traj_min = pelvis_seq.min(axis=0)[0:2]
        traj_size = traj_max - traj_min
        traj_size = traj_size + TRAJ_PAD * np.exp(-traj_size)
        pad = np.maximum((region_size - traj_size) / 2, [0, 0])
        center = (traj_max + traj_min) / 2
        sample_xy = rng.uniform(low=center - pad, high=center + pad)
        region_min = sample_xy - region_size / 2
        region_max = sample_xy + region_size / 2

        scene_pcd = scene_data[scene_id]["pcd"].copy()
        scene_pcd[:, 0:3] += scene_trans
        in_region = (
            (scene_pcd[:, 0] >= region_min[0]) & (scene_pcd[:, 0] <= region_max[0])
            & (scene_pcd[:, 1] >= region_min[1]) & (scene_pcd[:, 1] <= region_max[1])
        )
        indices = np.arange(len(scene_pcd))[in_region]
        assert len(indices) > 0, "No points in the region!"
        while len(indices) < num_points:
            indices = np.concatenate([indices, indices])
        indices = rng.choice(indices, num_points, replace=False)

        points = scene_data[scene_id]["pcd"].copy()
        points[:, 0:3] += scene_trans
        points = points[indices]

        # recenter: xy bbox middle, 2%-height floor
        xyz = points[:, 0:3]
        xy_center = (xyz[:, 0:2].max(axis=0) + xyz[:, 0:2].min(axis=0)) * 0.5
        z_height = np.percentile(xyz[:, 2], 2)
        trans_vec = np.array([-xy_center[0], -xy_center[1], -z_height], dtype=np.float32)
        points[:, 0:3] += trans_vec
        pose_seq = pose_seq + trans_vec
        scene_trans = scene_trans + trans_vec

        pending.append((i, pose_seq, points, indices))
        anno_rows.append([
            scene_id,
            f"{scene_trans[0]:.8f}", f"{scene_trans[1]:.8f}", f"{scene_trans[2]:.8f}",
            utterances, append_info,
        ])
        if len(pending) >= chunk:
            _flush_pending(pending, save_dir, device)
            pending = []
    if pending:
        _flush_pending(pending, save_dir, device)

    with open(os.path.join(save_dir, "anno.csv"), "w", newline="") as fp:
        writer = csv.writer(fp)
        writer.writerow(
            ["scene_id", "scene_trans_x", "scene_trans_y", "scene_trans_z",
             "utterance", "others"]
        )
        writer.writerows(anno_rows)
