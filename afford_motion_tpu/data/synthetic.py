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


def make_synthetic_h3d_protocol(
    root: str,
    n_train: int = 64,
    n_test: int = 4384,
    num_points: int = 8192,
    n_joints: int = 22,
    dim: int = 263,
    horizon_range=(40, 199),
    seed: int = 11,
) -> None:
    """Protocol-scale synthetic H3D tree for eval-rehearsal runs.

    Same on-disk layout as :func:`make_synthetic_h3d` but with independent
    train/test split sizes so the test split can match the reference's real
    HumanML3D eval corpus (4,384 test sequences feed both the generation
    loop and the offline protocol's GT pools —
    reference h3d_eval/eval_h3d_dataset_offline.py:129-160) while the train
    split stays small (only used to mint a checkpoint). Scene point clouds
    are written at the production 8,192-point resolution for every item so
    the test-time conditioning I/O cost is shape-honest.
    """
    rng = np.random.default_rng(seed)
    base = Path(root) / "H3D"
    (base / "new_joint_vecs").mkdir(parents=True, exist_ok=True)
    (base / "texts").mkdir(parents=True, exist_ok=True)
    (base / "contacts").mkdir(parents=True, exist_ok=True)

    n_items = n_train + n_test
    names = [f"{i:06d}" for i in range(n_items)]
    for name in names:
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
    (base / "train.txt").write_text("\n".join(names[:n_train]) + "\n")
    (base / "test.txt").write_text("\n".join(names[n_train:]) + "\n")
    (base / "all.txt").write_text("\n".join(names) + "\n")


def make_synthetic_t2m_ckpt(path: str, dim_pose: int = 263, dim_move: int = 512,
                            dim_word: int = 300, dim_pos: int = 15,
                            hid_text: int = 512, hid_motion: int = 1024,
                            coemb: int = 512, strip: bool = True) -> None:
    """Random-weight torch ``finest.tar`` with the real T2M evaluator layout
    (reference: evaluator_wrapper.py:200-216 keys movement/text/motion
    encoder) so the torch→JAX conversion path is exercised end-to-end
    without the gated checkpoint. Shared by tests and the protocol
    rehearsal driver."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class Movement(nn.Module):
        def __init__(self):
            super().__init__()
            self.main = nn.Sequential(
                nn.Conv1d(dim_pose - 4 if strip else dim_pose, dim_move, 4, 2, 1),
                nn.Dropout(0.2), nn.LeakyReLU(0.2),
                nn.Conv1d(dim_move, dim_move, 4, 2, 1),
                nn.Dropout(0.2), nn.LeakyReLU(0.2),
            )
            self.out_net = nn.Linear(dim_move, dim_move)

    class Text(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_emb = nn.Linear(dim_pos, dim_word)
            self.input_emb = nn.Linear(dim_word, hid_text)
            self.gru = nn.GRU(hid_text, hid_text, batch_first=True, bidirectional=True)
            self.output_net = nn.Sequential(
                nn.Linear(hid_text * 2, hid_text), nn.LayerNorm(hid_text),
                nn.LeakyReLU(0.2), nn.Linear(hid_text, coemb))
            self.hidden = nn.Parameter(torch.randn(2, 1, hid_text))

    class Motion(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_emb = nn.Linear(dim_move, hid_motion)
            self.gru = nn.GRU(hid_motion, hid_motion, batch_first=True, bidirectional=True)
            self.output_net = nn.Sequential(
                nn.Linear(hid_motion * 2, hid_motion), nn.LayerNorm(hid_motion),
                nn.LeakyReLU(0.2), nn.Linear(hid_motion, coemb))
            self.hidden = nn.Parameter(torch.randn(2, 1, hid_motion))

    def shrink(m):  # keep deep GRU activations finite on random weights
        with torch.no_grad():
            for p in m.parameters():
                p.mul_(0.2)

    move, text, motion = Movement(), Text(), Motion()
    for m in (move, text, motion):
        shrink(m)
    torch.save({
        "movement_encoder": move.state_dict(),
        "text_encoder": text.state_dict(),
        "motion_encoder": motion.state_dict(),
        "epoch": 1,
    }, path)


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
