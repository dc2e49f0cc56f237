"""Rigid-invariant geometry cache: cached indices must reproduce the
on-the-fly hierarchy exactly, including after a rigid augmentation."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from afford_motion_tpu.models.cmdm import CMDM
from afford_motion_tpu.models.conditioning import add_hierarchies
from afford_motion_tpu.models.scene_map import SCENEMAP_NSAMPLES, SCENEMAP_STRIDES
from afford_motion_tpu.ops import build_point_hierarchy
from afford_motion_tpu.ops.hierarchy import geometry_from_arrays, geometry_to_arrays


def _rigid(xyz, angle=0.7, t=(1.0, -2.0, 0.5)):
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    return xyz @ R.T + np.asarray(t, dtype=np.float32)


def test_geometry_roundtrip_and_rigid_invariance():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 256, 3)).astype(np.float32)
    levels = build_point_hierarchy(jnp.asarray(xyz), SCENEMAP_STRIDES, SCENEMAP_NSAMPLES)
    arrays = geometry_to_arrays(levels, prefix="geo_sm")

    # roundtrip on the same cloud
    rebuilt = geometry_from_arrays(
        {k: jnp.asarray(v) for k, v in arrays.items()},
        jnp.asarray(xyz), len(SCENEMAP_STRIDES), prefix="geo_sm",
    )
    for lvl, rb in zip(levels, rebuilt):
        np.testing.assert_array_equal(np.asarray(lvl.knn_idx), np.asarray(rb.knn_idx))
        np.testing.assert_allclose(np.asarray(lvl.xyz), np.asarray(rb.xyz), rtol=1e-6)

    # indices recomputed on a rigidly transformed cloud match the cache
    xyz_t = np.stack([_rigid(xyz[i]) for i in range(2)])
    levels_t = build_point_hierarchy(jnp.asarray(xyz_t), SCENEMAP_STRIDES, SCENEMAP_NSAMPLES)
    for lvl_t, lvl in zip(levels_t, levels):
        if lvl.fps_idx is not None:
            assert (np.asarray(lvl_t.fps_idx) == np.asarray(lvl.fps_idx)).mean() > 0.99
        assert (np.asarray(lvl_t.knn_idx) == np.asarray(lvl.knn_idx)).mean() > 0.98
        if lvl.up_weight is not None:
            np.testing.assert_allclose(
                np.asarray(lvl_t.up_weight), np.asarray(lvl.up_weight), rtol=1e-2, atol=1e-3
            )


def test_cmdm_same_output_with_cached_geometry():
    rng = np.random.default_rng(1)
    B, N, L, D = 2, 256, 8, 66
    model = CMDM(motion_dim=D, latent_dim=32, time_emb_dim=32, text_feat_dim=32,
                 contact_dim=6, planes=(8, 16, 32, 64), blocks=(2, 2, 2, 2),
                 arch="trans_enc", num_layers=(1,), num_heads=4, dim_feedforward=64)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    base_cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 32)).astype(np.float32)),
        "c_pc_xyz": xyz,
        "c_pc_contact": jnp.asarray(rng.random(size=(B, N, 6)).astype(np.float32)),
        "x_mask": jnp.zeros((B, L), dtype=bool),
    }
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([1, 2])

    cond_fly = add_hierarchies(model, base_cond)
    variables = model.init(jax.random.PRNGKey(0), x, t, cond_fly, train=False)
    out_fly = model.apply(variables, x, t, cond_fly, train=False)

    arrays = geometry_to_arrays(cond_fly["levels_sm"], prefix="geo_sm")
    cond_cached = dict(base_cond)
    cond_cached.update({k: jnp.asarray(v) for k, v in arrays.items()})
    cond_cached = add_hierarchies(model, cond_cached)
    out_cached = model.apply(variables, x, t, cond_cached, train=False)
    np.testing.assert_allclose(np.asarray(out_fly), np.asarray(out_cached),
                               rtol=1e-5, atol=1e-5)


def test_dataset_picks_up_geometry_cache(tmp_path):
    """ContactMotionDataset items must carry geo_* arrays when the cache
    dir exists, and the loader must batch them."""
    from afford_motion_tpu.data import create_dataset
    from afford_motion_tpu.data.synthetic import make_synthetic_data_dir
    from afford_motion_tpu.utils.config import DictConfig

    data_dir = make_synthetic_data_dir(str(tmp_path / "data"), n_items=4,
                                       num_points=128, sets=("HUMANISE",))
    # build the cache like prepare.py geometry does
    base = os.path.join(data_dir, "HUMANISE", "contact_motion")
    geo_dir = os.path.join(base, "geometry_sm")
    os.makedirs(geo_dir)
    for i in range(4):
        pts = np.load(os.path.join(base, "contacts", f"{i:05d}.npz"))["points"][:, :3]
        levels = build_point_hierarchy(jnp.asarray(pts[None]),
                                       SCENEMAP_STRIDES, SCENEMAP_NSAMPLES)
        arrays = {k: np.asarray(v)[0] for k, v in
                  geometry_to_arrays(levels, prefix="geo_sm").items()}
        np.savez(os.path.join(geo_dir, f"{i:05d}.npz"), **arrays)

    cfg = DictConfig({
        "name": "ContactMotionDataset", "data_dir": data_dir, "shuffle_seed": 0,
        "sets": ["HUMANISE"], "sets_config": {"HUMANISE": {"ratio": 1.0}},
        "data_repr": "pos", "contact_type": "contact_cont_joints",
        "contact_joints": [0, 10, 11, 12, 20, 21], "use_raw_dist": False,
        "sigma": 0.5, "num_points": 128, "min_horizon": 24, "max_horizon": 196,
        "mix_train_ratio": 0.0,
        "train_transforms": ["RandomRotation", "ApplyTransformCMDM", "NumpyToTensor"],
        "test_transforms": ["NumpyToTensor"],
        "transform_cfg": {"gravity_dim": 2},
    })
    ds = create_dataset(cfg, "train")
    item = ds[0]
    assert "geo_sm0_knn_idx" in item
    batch = next(iter(ds.get_dataloader(batch_size=2)))
    assert batch["geo_sm0_knn_idx"].shape[0] == 2
    assert batch["geo_sm1_fps_idx"].shape == (2, 128 // 4)
