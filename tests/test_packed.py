"""Packed memmap store tests: pack the synthetic tree, then verify the
packed fast path produces items equivalent to the live npz path (bit-exact
for full-precision diffusion targets, f16-quantization-close for the
conditioning wire)."""
import argparse
import os
import random

import numpy as np
import pytest

from afford_motion_tpu.data import create_dataset
from afford_motion_tpu.data.packed import PackedStore, pack_h3d, pack_motionx
from afford_motion_tpu.data.synthetic import make_synthetic_data_dir
from afford_motion_tpu.utils.config import DictConfig

N_POINTS = 128
N_ITEMS = 6


@pytest.fixture(scope="module")
def packed_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed_data")
    data_dir = make_synthetic_data_dir(str(root), n_items=N_ITEMS, num_points=N_POINTS)
    # small geometry caches so geo fields flow through the pack
    import prepare as prepare_cli

    for dataset in ("H3D", "HUMANISE"):
        prepare_cli.cmd_geometry(argparse.Namespace(
            out_dir=data_dir, dataset=dataset, kind="sm", batch_size=8,
        ))
    pack_h3d(data_dir)
    pack_motionx(data_dir, "HUMANISE")
    return data_dir


def _h3d_cfg(data_dir, **over):
    cfg = {
        "name": "ContactMotionHumanML3DDataset",
        "data_dir": data_dir,
        "shuffle_seed": 2023,
        "data_repr": "h3d",
        "contact_type": "contact_cont_joints",
        "contact_joints": [0, 10, 11, 12, 20, 21],
        "use_raw_dist": False,
        "sigma": 0.8,
        "num_points": N_POINTS,
        "min_horizon": 24,
        "max_horizon": 196,
        "mix_train_ratio": 0.0,
        "half_wire": True,
        "train_transforms": ["NumpyToTensor"],
        "test_transforms": ["NumpyToTensor"],
        "transform_cfg": {"gravity_dim": 2},
    }
    cfg.update(over)
    return DictConfig(cfg)


def _items(ds_a, ds_b, idx=0, seed=7):
    """Fetch the same logical item from two datasets with aligned RNG."""
    ds_b.indices = list(ds_a.indices)
    out = []
    for ds in (ds_a, ds_b):
        random.seed(seed)
        np.random.seed(seed)
        out.append(ds[idx])
    return out


def test_store_roundtrip(packed_dir):
    st = PackedStore.try_open(os.path.join(packed_dir, "H3D", "packed"))
    assert st is not None
    base = st.meta["bases"][0]
    row = st.row(base)
    assert row["xyz16"].dtype == np.float16
    assert row["dist32"].dtype == np.float32
    assert np.allclose(row["dist16"], row["dist32"], atol=2e-3, rtol=1e-2)
    assert any(k.startswith("geo_sm") for k in st.geo_keys)
    assert st.row("does_not_exist") is None
    # meta mismatch refuses to open
    assert PackedStore.try_open(
        os.path.join(packed_dir, "H3D", "packed"),
        expect={"contact_type": "contact_all_joints"},
    ) is None


def test_h3d_stage2_packed_equivalence(packed_dir):
    packed = create_dataset(_h3d_cfg(packed_dir), "train")
    live = create_dataset(_h3d_cfg(packed_dir, use_packed=False), "train")
    assert getattr(packed, "_packed", None) is not None
    assert getattr(live, "_packed", None) is None

    a, b = _items(packed, live)
    np.testing.assert_array_equal(a["x"], b["x"])       # motion: RAM corpus
    np.testing.assert_array_equal(a["x_mask"], b["x_mask"])
    assert a["c_pc_xyz"].dtype == np.float16 == b["c_pc_xyz"].dtype
    np.testing.assert_array_equal(a["c_pc_xyz"], b["c_pc_xyz"])
    assert a["c_pc_contact"].dtype == np.float16
    np.testing.assert_allclose(
        a["c_pc_contact"].astype(np.float32),
        b["c_pc_contact"].astype(np.float32), atol=2e-2,
    )
    geo_keys = [k for k in b if k.startswith("geo_")]
    assert geo_keys
    for k in geo_keys:
        np.testing.assert_allclose(
            np.asarray(a[k], dtype=np.float32),
            np.asarray(b[k], dtype=np.float32), atol=1e-3,
        )


def test_h3d_stage2_trans_enc_drops_up_arrays(packed_dir):
    ds = create_dataset(_h3d_cfg(packed_dir, geometry_arch="trans_enc"), "train")
    assert getattr(ds, "_packed", None) is not None
    item = ds[0]
    assert not any("_up_idx" in k or "_up_weight" in k for k in item)
    assert any(k.startswith("geo_sm") for k in item)


def test_h3d_stage1_target_bit_exact(packed_dir):
    cfg = _h3d_cfg(
        packed_dir, name="ContactHumanML3DDataset",
        data_repr="contact_cont_joints",
        data_repr_joints=[0, 10, 11, 12, 20, 21],
    )
    packed = create_dataset(cfg, "train")
    live_cfg = _h3d_cfg(
        packed_dir, name="ContactHumanML3DDataset",
        data_repr="contact_cont_joints",
        data_repr_joints=[0, 10, 11, 12, 20, 21], use_packed=False,
    )
    live = create_dataset(live_cfg, "train")
    assert getattr(packed, "_packed", None) is not None
    a, b = _items(packed, live)
    # the stage-1 diffusion target comes from dist32: bit-identical
    np.testing.assert_array_equal(a["x"], b["x"])
    np.testing.assert_array_equal(a["c_pc_xyz"], b["c_pc_xyz"])


def test_packed_disabled_for_test_phase(packed_dir):
    cfg = _h3d_cfg(
        packed_dir, name="ContactHumanML3DDataset",
        data_repr="contact_cont_joints",
        data_repr_joints=[0, 10, 11, 12, 20, 21],
    )
    ds = create_dataset(cfg, "test")
    assert getattr(ds, "_packed", None) is None
    item = ds[0]
    assert item["c_pc_xyz"].dtype == np.float32  # eval keeps f32 wire


def _motionx_cfg(data_dir, **over):
    cfg = {
        "name": "ContactMotionDataset",
        "data_dir": data_dir,
        "shuffle_seed": 2023,
        "sets": ["HUMANISE"],
        "sets_config": {"HUMANISE": {"ratio": 1.0, "load_text": True}},
        "data_repr": "pos",
        "contact_type": "contact_cont_joints",
        "contact_joints": [0, 10, 11, 12, 20, 21],
        "use_raw_dist": False,
        "sigma": 0.5,
        "num_points": N_POINTS,
        "min_horizon": 24,
        "max_horizon": 196,
        "mix_train_ratio": 0.0,
        "half_wire": True,
        "train_transforms": ["RandomRotation", "ApplyTransformCMDM", "NumpyToTensor"],
        "test_transforms": ["NumpyToTensor"],
        "transform_cfg": {"gravity_dim": 2},
    }
    cfg.update(over)
    return DictConfig(cfg)


def test_motionx_contact_motion_packed_equivalence(packed_dir):
    packed = create_dataset(_motionx_cfg(packed_dir), "train")
    live = create_dataset(_motionx_cfg(packed_dir, use_packed=False), "train")
    assert packed._packed.get("HUMANISE") is not None
    a, b = _items(packed, live)
    # motion32 is f32-exact; the shared rotation is drawn from the aligned RNG
    np.testing.assert_allclose(a["x"], b["x"], atol=1e-5)
    np.testing.assert_array_equal(a["x_mask"], b["x_mask"])
    np.testing.assert_allclose(
        np.asarray(a["c_pc_xyz"], np.float32),
        np.asarray(b["c_pc_xyz"], np.float32), atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(a["c_pc_contact"], np.float32),
        np.asarray(b["c_pc_contact"], np.float32), atol=2e-2,
    )
    geo_keys = [k for k in b if k.startswith("geo_")]
    assert geo_keys
    for k in geo_keys:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32), atol=1e-3
        )


def test_motionx_contact_map_packed_equivalence(packed_dir):
    cfg = dict(
        name="ContactMapDataset",
        data_repr="contact_cont_joints",
        data_repr_joints=[0, 10, 11, 12, 20, 21],
        use_color=True, use_openscene=False, point_feat_dim=32,
        train_transforms=["RandomRotation", "ApplyTransformCDM", "NumpyToTensor"],
    )
    packed = create_dataset(_motionx_cfg(packed_dir, **cfg), "train")
    live = create_dataset(_motionx_cfg(packed_dir, use_packed=False, **cfg), "train")
    assert packed._packed.get("HUMANISE") is not None
    a, b = _items(packed, live)
    # stage-1 target x: dist32 -> bit-exact through the shared rotation
    np.testing.assert_allclose(a["x"], b["x"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a["c_pc_feat"], np.float32),
        np.asarray(b["c_pc_feat"], np.float32), atol=1e-2,
    )


def test_pack_detects_stale_geometry(tmp_path):
    """Geometry caches built BEFORE a later `sort` re-run reference
    pre-sort row positions; the fp fingerprint must catch the mismatch and
    strip all cached geometry from the pack (fps wire falls back to the
    in-step hierarchy build instead of training wrong neighborhoods)."""
    import prepare as prepare_cli

    data_dir = make_synthetic_data_dir(str(tmp_path), n_items=3,
                                       num_points=N_POINTS)
    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="H3D", kind="sm", batch_size=4,
    ))
    # invalidate: sort AFTER geometry (rewrites point rows)
    prepare_cli.cmd_sort(argparse.Namespace(
        out_dir=data_dir, dataset="H3D", curve="hilbert",
    ))
    out = pack_h3d(data_dir)
    store = PackedStore.try_open(out)
    assert store is not None
    assert not store.geo_keys, "stale geometry fields must be stripped"
    assert not any(k.startswith("geo_") for k in store.meta["fields"])


def test_pack_accepts_fresh_geometry(tmp_path):
    """Sorted first, then geometry + pack: fingerprints match and the geo
    fields survive."""
    import prepare as prepare_cli

    data_dir = make_synthetic_data_dir(str(tmp_path), n_items=3,
                                       num_points=N_POINTS)
    prepare_cli.cmd_sort(argparse.Namespace(
        out_dir=data_dir, dataset="H3D", curve="hilbert",
    ))
    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="H3D", kind="sm", batch_size=4,
    ))
    out = pack_h3d(data_dir)
    store = PackedStore.try_open(out)
    assert store is not None
    assert store.geo_keys, "fresh geometry fields must be kept"
    assert store.meta.get("curve") == "hilbert"
