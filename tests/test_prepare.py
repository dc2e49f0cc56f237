"""Prepare-pipeline tests: the contact-data generator must produce files
the dataset classes can load, closing the prep -> train loop."""
import os
import pickle

import numpy as np
import pytest

from afford_motion_tpu.prepare.contact_data import joint_distance_map, process
from afford_motion_tpu.prepare.raw_datasets import apply_rigid_to_params
from afford_motion_tpu.prepare.smplx_to_vec import mirror_pos
from afford_motion_tpu.prepare.split import split_humanise, split_prox


def test_joint_distance_map_matches_bruteforce():
    rng = np.random.default_rng(0)
    pose = rng.normal(size=(10, 22, 3)).astype(np.float32)
    scene = rng.normal(size=(64, 3)).astype(np.float32)
    got = joint_distance_map(pose, scene, device=False)
    want = np.stack(
        [np.sqrt(((scene[:, None] - pose[:, j][None]) ** 2).sum(-1)).min(1)
         for j in range(22)], axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_dev = joint_distance_map(pose, scene, device=True)
    np.testing.assert_allclose(got_dev, want, rtol=1e-3, atol=1e-4)


def test_joint_distance_map_batch_bit_matches_per_pair():
    """The corpus-scale batched chamfer kernel must be BIT-identical to the
    per-pair jitted kernel across ragged trajectory lengths (padding rows
    masked before the min)."""
    from afford_motion_tpu.prepare.contact_data import joint_distance_map_batch

    rng = np.random.default_rng(3)
    lengths = [7, 33, 32, 100]
    poses = [rng.normal(size=(L, 22, 3)).astype(np.float32) for L in lengths]
    scenes = rng.normal(size=(len(poses), 128, 3)).astype(np.float32)
    got = joint_distance_map_batch(poses, scenes)
    assert got.shape == (4, 128, 22)
    for i, p in enumerate(poses):
        want = joint_distance_map(p, scenes[i], device=True)
        np.testing.assert_array_equal(got[i], want)


def test_process_outputs_feed_the_dataset(tmp_path):
    rng = np.random.default_rng(1)
    N_SCENE, N_SAMPLE = 4096, 256
    scene_pcd = np.concatenate([
        rng.uniform(-3, 3, size=(N_SCENE, 3)), rng.uniform(-1, 1, size=(N_SCENE, 3)),
    ], axis=-1).astype(np.float32)
    motions = []
    for i in range(3):
        L = 30 + i * 4
        pose = rng.normal(size=(L, 66)).astype(np.float32) * 0.5
        trans = np.eye(4, dtype=np.float32)
        motions.append((pose, [f"caption {i}"], ("scene0000_00", trans), {}))

    out = str(tmp_path / "HUMANISE" / "contact_motion")
    process(motions, {"scene0000_00": {"pcd": scene_pcd}}, out,
            num_points=N_SAMPLE, rng=np.random.default_rng(0))

    # protocol: anno.csv + motions + contacts with the expected shapes
    import pandas as pd
    anno = pd.read_csv(os.path.join(out, "anno.csv"))
    assert len(anno) == 3 and "utterance" in anno.columns
    m = np.load(os.path.join(out, "motions", "00000.npy"))
    assert m.shape == (30, 22, 3)
    npz = np.load(os.path.join(out, "contacts", "00000.npz"))
    assert npz["points"].shape == (N_SAMPLE, 6)
    assert npz["dist"].shape == (N_SAMPLE, 22)
    assert npz["mask"].shape == (N_SAMPLE,)
    # recentered: xy bbox middle ~0, floor ~0
    xyz = npz["points"][:, :3]
    np.testing.assert_allclose(
        (xyz[:, :2].max(0) + xyz[:, :2].min(0)) / 2, 0.0, atol=1e-4
    )

    # the produced tree is directly loadable by ContactMapDataset
    base = tmp_path / "HUMANISE"
    (base / "train.txt").write_text("0\n1\n2\n")
    (base / "test.txt").write_text("")
    from afford_motion_tpu.data import create_dataset
    from afford_motion_tpu.utils.config import DictConfig
    cfg = DictConfig({
        "name": "ContactMapDataset", "data_dir": str(tmp_path), "shuffle_seed": 0,
        "sets": ["HUMANISE"], "sets_config": {"HUMANISE": {"ratio": 1.0}},
        "data_repr": "contact_cont_joints",
        "data_repr_joints": [0, 10, 11, 12, 20, 21],
        "use_raw_dist": False, "sigma": 0.5, "num_points": N_SAMPLE,
        "use_color": True, "use_openscene": False, "point_feat_dim": 32,
        "train_transforms": ["NumpyToTensor"], "test_transforms": ["NumpyToTensor"],
        "transform_cfg": {},
    })
    ds = create_dataset(cfg, "train")
    item = ds[0]
    assert item["x"].shape == (N_SAMPLE, 6)


def test_mirror_pos_swaps_chains():
    rng = np.random.default_rng(2)
    joints = rng.normal(size=(5, 66)).astype(np.float32)
    m = mirror_pos(joints).reshape(5, 22, 3)
    j = joints.reshape(5, 22, 3)
    # left hip (1) <-> right hip (2) with x negated
    np.testing.assert_allclose(m[:, 1, 0], -j[:, 2, 0], rtol=1e-6)
    np.testing.assert_allclose(m[:, 2, 0], -j[:, 1, 0], rtol=1e-6)
    np.testing.assert_allclose(m[:, 0, 1:], j[:, 0, 1:], rtol=1e-6)  # pelvis yz kept
    # double mirror = identity
    np.testing.assert_allclose(mirror_pos(mirror_pos(joints)), joints, rtol=1e-6)


def test_apply_rigid_to_params_moves_pelvis_correctly():
    """After applying T, the new pelvis (trans + offset) must equal
    T @ old pelvis."""
    rng = np.random.default_rng(3)
    L = 6
    trans = rng.normal(size=(L, 3)).astype(np.float32)
    orient = rng.normal(size=(L, 3)).astype(np.float32) * 0.3
    offset = rng.normal(size=(1, 3)).astype(np.float32) * 0.1
    pelvis = trans + offset

    ang = 0.7
    T = np.eye(4, dtype=np.float32)
    T[:2, :2] = [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
    T[0:3, 3] = [1.0, -2.0, 0.5]

    new_trans, new_orient = apply_rigid_to_params(T, trans, orient, pelvis)
    new_pelvis = new_trans + offset
    want = pelvis @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(new_pelvis, want, rtol=1e-4, atol=1e-5)


def test_splits(tmp_path):
    import pandas as pd

    for s, ids in (("HUMANISE", ["scene0100_00", "scene0700_00"]),
                   ("PROX", ["MPH11", "MPH1Library"])):
        base = tmp_path / s / "contact_motion"
        base.mkdir(parents=True)
        pd.DataFrame({
            "scene_id": ids, "scene_trans_x": [0, 0], "scene_trans_y": [0, 0],
            "scene_trans_z": [0, 0], "utterance": ["a", "b"],
        }).to_csv(base / "anno.csv", index=False)
    split_humanise(str(tmp_path))
    split_prox(str(tmp_path))
    assert (tmp_path / "HUMANISE" / "train.txt").read_text().strip() == "000000"
    assert (tmp_path / "HUMANISE" / "test.txt").read_text().strip() == "000001"
    assert (tmp_path / "PROX" / "train.txt").read_text().strip() == "000000"
