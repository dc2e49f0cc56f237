"""Synthetic data-directory generator.

Creates a miniature data tree with EXACTLY the reference's on-disk layout
(SURVEY.md §2.27 outputs) so end-to-end train/test/bench runs work without
the real AMASS/HUMANISE/PROX data: anno.csv + contact_motion/{motions,
contacts}/ + split txts for the MotionX sets, and H3D/{new_joint_vecs,
texts, Mean.npy, Std.npy, contacts, train/test/all.txt}.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Sequence

import numpy as np


def make_synthetic_motionx_set(
    root: str,
    set_name: str,
    n_items: int = 8,
    num_points: int = 256,
    n_joints: int = 22,
    horizon_range=(24, 60),
    seed: int = 0,
) -> None:
    rng = np.random.default_rng(seed)
    base = Path(root) / set_name
    (base / "contact_motion" / "motions").mkdir(parents=True, exist_ok=True)
    (base / "contact_motion" / "contacts").mkdir(parents=True, exist_ok=True)
    (base / "contact_motion" / "contacts_fur").mkdir(parents=True, exist_ok=True)
    (base / "contact_motion" / "target_mask").mkdir(parents=True, exist_ok=True)
    (base / "scenes").mkdir(parents=True, exist_ok=True)

    rows = ["scene_id,scene_trans_x,scene_trans_y,scene_trans_z,utterance"]
    for i in range(n_items):
        L = int(rng.integers(*horizon_range))
        motion = rng.normal(size=(L, n_joints, 3)).astype(np.float32)
        np.save(base / "contact_motion" / "motions" / f"{i:05d}.npy", motion)

        points = rng.normal(size=(num_points, 6)).astype(np.float32)
        points[:, 3:6] = np.clip(points[:, 3:6], -1, 1)
        dist = np.abs(rng.normal(size=(num_points, n_joints))).astype(np.float32)
        mask = np.zeros(num_points, dtype=bool)
        np.savez(base / "contact_motion" / "contacts" / f"{i:05d}.npz",
                 points=points, dist=dist, mask=mask)
        np.savez(base / "contact_motion" / "contacts_fur" / f"{i:05d}.npz",
                 points=points, dist=dist, mask=mask)
        np.save(base / "contact_motion" / "target_mask" / f"{i:05d}.npy",
                rng.random(num_points) < 0.1)
        rows.append(f"scene{i},0.0,0.0,0.0,walk to the chair$$sit down")

    (base / "contact_motion" / "anno.csv").write_text("\n".join(rows) + "\n")
    ids = list(range(n_items))
    (base / "train.txt").write_text("\n".join(str(i) for i in ids[: n_items * 3 // 4]) + "\n")
    (base / "test.txt").write_text("\n".join(str(i) for i in ids[n_items * 3 // 4:]) + "\n")
    (base / "all.txt").write_text("\n".join(str(i) for i in ids) + "\n")
    (base / "train_without_mirror.txt").write_text(
        "\n".join(str(i) for i in ids[: n_items * 3 // 4]) + "\n"
    )
    (base / "test_without_mirror.txt").write_text(
        "\n".join(str(i) for i in ids[n_items * 3 // 4:]) + "\n"
    )


def make_synthetic_h3d(
    root: str,
    n_items: int = 8,
    num_points: int = 256,
    n_joints: int = 22,
    dim: int = 263,
    horizon_range=(28, 80),
    seed: int = 1,
) -> None:
    rng = np.random.default_rng(seed)
    base = Path(root) / "H3D"
    (base / "new_joint_vecs").mkdir(parents=True, exist_ok=True)
    (base / "texts").mkdir(parents=True, exist_ok=True)
    (base / "contacts").mkdir(parents=True, exist_ok=True)

    names = [f"{i:06d}" for i in range(n_items)]
    for i, name in enumerate(names):
        L = int(rng.integers(*horizon_range))
        np.save(base / "new_joint_vecs" / f"{name}.npy",
                rng.normal(size=(L, dim)).astype(np.float32))
        (base / "texts" / f"{name}.txt").write_text(
            "a person walks forward#a/DET person/NOUN walk/VERB forward/ADV#0.0#0.0\n"
            "someone strolls ahead#someone/NOUN stroll/VERB ahead/ADV#0.0#0.0\n"
        )
        points = rng.normal(size=(num_points, 6)).astype(np.float32)
        dist = np.abs(rng.normal(size=(num_points, n_joints))).astype(np.float32)
        np.savez(base / "contacts" / f"{name}.npz", points=points, dist=dist)

    np.save(base / "Mean.npy", np.zeros(dim, dtype=np.float32))
    np.save(base / "Std.npy", np.ones(dim, dtype=np.float32))
    split = n_items * 3 // 4
    (base / "train.txt").write_text("\n".join(names[:split]) + "\n")
    (base / "test.txt").write_text("\n".join(names[split:]) + "\n")
    (base / "all.txt").write_text("\n".join(names) + "\n")


def make_synthetic_custom(
    root: str,
    n_items: int = 4,
    num_points: int = 256,
    seed: int = 7,
) -> None:
    """The novel-set 'custom' layout (custom/anno.csv with others/frame
    columns + custom/points/*.npz) driving the *CustomDataset classes."""
    rng = np.random.default_rng(seed)
    base = Path(root) / "custom"
    (base / "points").mkdir(parents=True, exist_ok=True)
    (base / "scenes").mkdir(parents=True, exist_ok=True)
    rows = ["scene_id,scene_trans_x,scene_trans_y,scene_trans_z,utterance,others,frame"]
    for i in range(n_items):
        points = rng.normal(size=(num_points, 6)).astype(np.float32)
        points[:, 3:6] = rng.integers(0, 255, size=(num_points, 3))
        np.savez(base / "points" / f"{i:04d}.npz", points=points)
        rows.append(
            f"scene{i},0.0,0.0,0.0,walk to the window,"
            f"walk/VERB to/ADP the/DET window/NOUN,48"
        )
    (base / "anno.csv").write_text("\n".join(rows) + "\n")


def make_synthetic_data_dir(
    root: str,
    sets: Sequence[str] = ("HumanML3D", "HUMANISE", "PROX"),
    n_items: int = 8,
    num_points: int = 256,
) -> str:
    """Full miniature data tree covering every dataset class."""
    os.makedirs(root, exist_ok=True)
    for k, s in enumerate(sets):
        make_synthetic_motionx_set(root, s, n_items, num_points, seed=k)
    make_synthetic_h3d(root, n_items, num_points)
    make_synthetic_custom(root, max(2, n_items // 2), num_points)
    return root
