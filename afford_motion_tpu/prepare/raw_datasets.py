"""Raw-dataset extraction: AMASS/HumanML3D, HUMANISE, PROX -> SMPL-X
parameter pkls (reference: prepare/datasets/*).

These operate on the external raw releases (AMASS SMPL-X npz files, the
HUMANISE align_data_release tree, PROX fittings) and are gated on those
files existing. The smplkit matrix_to_parameter utility is replaced by
``apply_rigid_to_params``.
"""
from __future__ import annotations

import glob
import json
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from ..utils.io import get_logger
from ..utils.misc import natsorted

logger = get_logger()


def aa_to_matrix(aa: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    return Rotation.from_rotvec(aa).as_matrix()


def matrix_to_aa(R: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(R).as_rotvec()


def apply_rigid_to_params(
    T: np.ndarray, trans: np.ndarray, orient: np.ndarray, pelvis: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-express SMPL-X (transl, global orient) after a rigid transform T,
    accounting for the pelvis offset (the smplkit matrix_to_parameter
    equivalent used at prepare/datasets/HUMANISE/HUMANISE.py:114 and
    PROX.py:110). pelvis is the CURRENT world pelvis location per frame."""
    R, t = T[:3, :3], T[:3, 3]
    offset = pelvis - trans                         # rest pelvis offset (per frame)
    new_trans = (trans + offset) @ R.T + t - offset
    new_orient = matrix_to_aa(R[None] @ aa_to_matrix(orient))
    return new_trans.astype(np.float32), new_orient.astype(np.float32)


class HumanML3DExtractor:
    """AMASS SMPL-X sequences cropped/downsampled to 20 fps per the
    HumanML3D index.csv (reference: prepare/datasets/HumanML3D/HumanML3D.py:11-97)."""

    FPS = 20
    LEAD_TRIM = {
        "Eyes_Japan_Dataset": 3, "MPI_HDM05": 3, "TotalCapture": 1,
        "MPI_Limits": 1, "Transitions_mocap": 0.5,
    }

    def __init__(self, data_dir: str, index_csv: str, out_dir: str = "./data/HumanML3D/motions"):
        import pandas as pd

        self.data_dir = data_dir
        self.smplh_dir = data_dir.replace("smplx_neutral", "smplh")
        self.index = pd.read_csv(index_csv)
        self.out_dir = out_dir

    def process(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        for i in range(len(self.index)):
            row = self.index.loc[i]
            source_path = row["source_path"]
            if "humanact12" in source_path:
                continue
            src = os.path.join(self.data_dir, "/".join(source_path.split("/")[2:]))
            src = src.replace("poses.npy", "stageii.npz").replace(" ", "_")
            if not os.path.exists(src):
                logger.warning(f"missing {src}")
                continue
            bdata = np.load(src, allow_pickle=True)
            smplh = src.replace(self.data_dir, self.smplh_dir).replace(".npz", ".npz")
            try:
                fps = float(np.load(
                    os.path.join(self.smplh_dir, "/".join(source_path.split("/")[2:])).replace(".npy", ".npz"),
                    allow_pickle=True,
                )["mocap_framerate"])
            except Exception:
                logger.warning(f"no framerate for {src}")
                continue
            step = int(fps / self.FPS)
            frames = np.arange(0, bdata["trans"].shape[0], step)
            data = np.concatenate([
                bdata["trans"][frames],
                bdata["root_orient"][frames],
                bdata["pose_body"][frames],
                bdata["pose_hand"][frames],
            ], axis=-1).astype(np.float32)

            for key, secs in self.LEAD_TRIM.items():
                if key in source_path:
                    data = data[int(secs * self.FPS):]
            data = data[int(row["start_frame"]): int(row["end_frame"])]
            betas = np.asarray(bdata["betas"][:10], dtype=np.float32)
            out = os.path.join(self.out_dir, str(row["new_name"]).replace(".npy", ".pkl"))
            with open(out, "wb") as fp:
                pickle.dump((data, betas), fp)


class HUMANISEExtractor:
    """HUMANISE aligned motions: re-anchor each pure motion at the sampled
    scene placement (reference: prepare/datasets/HUMANISE/HUMANISE.py:16-124)."""

    ANCHOR = {"sit": -1, "stand up": 0, "walk": -1, "lie": -1}

    def __init__(self, data_dir: str, out_root: str = "./data/HUMANISE"):
        self.data_dir = data_dir
        self.out_root = out_root

    def process(self) -> None:
        import csv

        save_dir = os.path.join(self.out_root, "motions")
        os.makedirs(save_dir, exist_ok=True)
        aligns = natsorted(
            glob.glob(os.path.join(self.data_dir, "align_data_release", "*", "*", "anno.pkl"))
        )
        anno_list, motion_cache = [], {}
        for align in aligns:
            with open(align, "rb") as f:
                anno_list.extend(pickle.load(f))
        rows = []
        for idx, anno in enumerate(anno_list):
            motion_id, action = anno["motion"], anno["action"]
            if motion_id not in motion_cache:
                with open(os.path.join(self.data_dir, "pure_motion", action, motion_id, "motion.pkl"), "rb") as fp:
                    motion_cache[motion_id] = pickle.load(fp)
            (gender, origin_trans, origin_orient, betas, pose_body, pose_hand,
             pose_jaw, pose_eye, joints_traj) = motion_cache[motion_id]
            pelvis = joints_traj[:, 0, :]
            anchor = self.ANCHOR[action]

            # T = translate(sampled) @ rotz(sampled) @ translate(-anchor pelvis xy)
            T1 = np.eye(4, dtype=np.float32)
            T1[0:2, -1] = -pelvis[anchor, 0:2]
            ang = float(anno["rotation"])
            c, s = np.cos(ang), np.sin(ang)
            T2 = np.eye(4, dtype=np.float32)
            T2[:2, :2] = [[c, -s], [s, c]]
            T3 = np.eye(4, dtype=np.float32)
            T3[0:3, -1] = anno["translation"]
            T = T3 @ T2 @ T1
            new_trans, new_orient = apply_rigid_to_params(T, origin_trans, origin_orient, pelvis)

            param_seq = np.concatenate([new_trans, new_orient, pose_body, pose_hand], axis=-1)
            with open(os.path.join(save_dir, f"{idx:06d}.pkl"), "wb") as fp:
                pickle.dump((param_seq, betas[:10]), fp)
            st = anno["scene_translation"]
            rows.append([
                f"{idx:06d}", anno["scene"], f"{st[0]:.8f}", f"{st[1]:.8f}", f"{st[2]:.8f}",
                anno["object_id"], anno["object_semantic_label"], action, anno["utterance"],
            ])
        with open(os.path.join(self.out_root, "annotations.csv"), "w", newline="") as fp:
            w = csv.writer(fp)
            w.writerow(["motion_id", "scene_id", "scene_trans_x", "scene_trans_y",
                        "scene_trans_z", "object_id", "object_semantic_label",
                        "action", "text"])
            w.writerows(rows)


class PROXExtractor:
    """PROX fittings re-expressed in recentered world coordinates
    (reference: prepare/datasets/PROX/PROX.py:14-131). Needs the JAX SMPL-X
    body models to locate the per-frame pelvis."""

    FEMALE_SUBJECTS = {162, 3452, 159, 3403}

    def __init__(self, data_dir: str, out_root: str = "./data/PROX"):
        self.data_dir = data_dir
        self.out_root = out_root

    def _cam_and_center(self) -> Tuple[Dict, Dict]:
        cam_trans = {}
        for f in glob.glob(os.path.join(self.out_root, "cam2world", "*.json")):
            if "_" in os.path.basename(f):
                continue
            with open(f) as fp:
                cam_trans[os.path.basename(f).split(".")[0]] = np.array(json.load(fp), dtype=np.float32)
        center_path = os.path.join(self.out_root, "normalize_to_center.json")
        if os.path.exists(center_path):
            centers = {k: np.array(v, dtype=np.float32) for k, v in json.load(open(center_path)).items()}
        else:
            from .process_scene import read_ply_xyzrgb

            centers = {}
            for s in cam_trans:
                pts = read_ply_xyzrgb(os.path.join(self.out_root, "scenes", f"{s}.ply"))[:, :3]
                m = np.eye(4, dtype=np.float32)
                m[0:3, -1] = [-pts[:, 0].mean(), -pts[:, 1].mean(), -np.percentile(pts[:, 2], 2)]
                centers[s] = m
            json.dump({k: v.tolist() for k, v in centers.items()}, open(center_path, "w"))
        return cam_trans, centers

    def process(self) -> None:
        from ..eval.smplx_lbs import SMPLXModel, smplx_joints
        import jax.numpy as jnp

        model = SMPLXModel.load_default()  # neutral stands in for m/f pelvis lookup
        cam_trans, centers = self._cam_and_center()
        save_dir = os.path.join(self.out_root, "motions")
        os.makedirs(save_dir, exist_ok=True)

        sequences = [s for s in os.listdir(self.data_dir)
                     if os.path.isdir(os.path.join(self.data_dir, s))]
        for sequence in sequences:
            scene_id = sequence.split("_")[0]
            pkls = natsorted(glob.glob(os.path.join(self.data_dir, sequence, "results", "*", "000.pkl")))
            pose_params, betas_list = [], []
            for pkl in pkls:
                with open(pkl, "rb") as fp:
                    p = pickle.load(fp)
                transl = np.asarray(p["transl"], dtype=np.float32)
                orient = np.asarray(p["global_orient"], dtype=np.float32)
                body_pose = np.asarray(p["body_pose"], dtype=np.float32)
                joints = smplx_joints(
                    model, jnp.asarray(transl), jnp.asarray(orient), jnp.asarray(body_pose)
                )
                pelvis = np.asarray(joints[:, 0, :])
                T = centers[scene_id] @ cam_trans[scene_id]
                new_trans, new_orient = apply_rigid_to_params(T, transl, orient, pelvis)
                hands = np.zeros((1, 90), dtype=np.float32)  # PCA hands left at rest
                pose_params.append(np.concatenate([new_trans, new_orient, body_pose, hands], axis=1))
                betas_list.append(np.asarray(p["betas"], dtype=np.float32))
            if not pose_params:
                continue
            pose_params = np.concatenate(pose_params, axis=0)
            betas = np.concatenate(betas_list, axis=0).mean(axis=0)
            with open(os.path.join(save_dir, f"{sequence}.pkl"), "wb") as fp:
                pickle.dump((pose_params, betas), fp)


def create_extractor(dataset: str, data_dir: str):
    """(reference: prepare/process.py dispatch)."""
    if dataset == "HumanML3D":
        index_csv = os.path.join(os.path.dirname(__file__), "humanml3d_index.csv")
        return HumanML3DExtractor(data_dir, index_csv)
    if dataset == "HUMANISE":
        return HUMANISEExtractor(data_dir)
    if dataset == "PROX":
        return PROXExtractor(data_dir)
    raise NotImplementedError(dataset)
