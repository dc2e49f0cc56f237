"""Visualizer + mesh toolkit tests."""
import os
import pickle

import numpy as np
import pytest

from afford_motion_tpu.eval.visualize import (
    KINEMATIC_CHAIN,
    ContactVisualizer,
    skeleton_to_mesh,
)
from afford_motion_tpu.utils.config import DictConfig
from afford_motion_tpu.utils.mesh import (
    SimpleMesh,
    concatenate,
    cylinder_between,
    export_mesh_ply,
    export_pointcloud_ply,
    load_mesh_ply,
    uv_sphere,
)


def test_mesh_roundtrip(tmp_path):
    m = uv_sphere(0.5, center=(1, 2, 3))
    path = str(tmp_path / "sphere.ply")
    m.export(path)
    loaded = load_mesh_ply(path)
    np.testing.assert_allclose(loaded.vertices, m.vertices, rtol=1e-6)
    np.testing.assert_array_equal(loaded.faces, m.faces)


def test_cylinder_geometry():
    c = cylinder_between([0, 0, 0], [0, 0, 2.0], radius=0.1)
    assert c.vertices[:, 2].min() >= -1e-6 and c.vertices[:, 2].max() <= 2.0 + 1e-6
    r = np.linalg.norm(c.vertices[:-2, :2], axis=1)
    np.testing.assert_allclose(r, 0.1, atol=1e-6)


def test_skeleton_to_mesh_shapes():
    rng = np.random.default_rng(0)
    skeleton = rng.normal(size=(3, 22, 3)).astype(np.float32)
    meshes = skeleton_to_mesh(skeleton, KINEMATIC_CHAIN)
    assert len(meshes) == 3
    assert all(m.vertices.shape[1] == 3 and len(m.faces) > 0 for m in meshes)


class _FakeDataset:
    use_raw_dist = False
    sigma = 0.5

    def denormalize(self, x, clip=False):
        x = x * 0.1 + 0.5
        return np.clip(x, 1e-20, 1.0) if clip else x


class _FakeLoader:
    dataset = _FakeDataset()


def test_contact_visualizer_writes_stage_link(tmp_path):
    cfg = DictConfig({
        "visualizer": {"name": "ContactVisualizer", "vis_joints": [0, 1]},
        "dataset": {"data_repr": "contact_cont_joints",
                    "data_repr_joints": [0, 10, 11, 12, 20, 21]},
    })
    vis = ContactVisualizer(cfg)
    rng = np.random.default_rng(1)
    B, N = 2, 64
    sample = rng.normal(size=(B, N, 6)).astype(np.float32)
    kwargs = {
        "c_pc_xyz": rng.normal(size=(B, N, 3)).astype(np.float32),
        "c_text": ["walk", "sit"],
    }
    vis.visualize(sample, str(tmp_path), 0, _FakeLoader(), **kwargs)
    # the contact.npy stage link must exist with (N, 3 + J) layout
    link = tmp_path / "000-walk" / "contact.npy"
    assert link.exists()
    arr = np.load(link)
    assert arr.shape == (N, 3 + 6)
    plys = list((tmp_path / "000-walk").glob("contact_joint_*.ply"))
    assert len(plys) == 6  # contact_cont_joints -> all 6 channels
