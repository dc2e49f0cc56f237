"""fps-only geometry wire: ship only FPS indices, recompute kNN/up on
device (ops/hierarchy.build_point_hierarchy_from_fps)."""
import numpy as np
import jax
import jax.numpy as jnp

from afford_motion_tpu.ops.hierarchy import (
    build_point_hierarchy,
    build_point_hierarchy_from_fps,
    geometry_to_arrays,
)
from tests.test_train import tiny_cmdm, tiny_diffusion, tiny_batch, init_state
from afford_motion_tpu.train import make_train_step

STRIDES = (1, 4, 4, 4)
NSAMPLES = (8, 16, 16, 16)


def test_from_fps_matches_full_build():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    full = build_point_hierarchy(xyz, STRIDES, NSAMPLES)
    arrays = {
        k: v for k, v in geometry_to_arrays(full, prefix="geo_sm").items()
        if "_fps_idx" in k
    }
    rebuilt = build_point_hierarchy_from_fps(
        xyz, arrays, STRIDES, NSAMPLES, prefix="geo_sm"
    )
    assert len(rebuilt) == len(full)
    for a, b in zip(full, rebuilt):
        np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz))
        np.testing.assert_array_equal(np.asarray(a.knn_idx), np.asarray(b.knn_idx))
        if a.down_knn_idx is not None:
            np.testing.assert_array_equal(
                np.asarray(a.down_knn_idx), np.asarray(b.down_knn_idx)
            )
        if a.up_idx is not None:
            np.testing.assert_array_equal(np.asarray(a.up_idx), np.asarray(b.up_idx))
            np.testing.assert_allclose(
                np.asarray(a.up_weight), np.asarray(b.up_weight), rtol=1e-6
            )


def test_from_fps_without_up():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    full = build_point_hierarchy(xyz, STRIDES, NSAMPLES)
    arrays = {
        k: v for k, v in geometry_to_arrays(full, prefix="geo_sm").items()
        if "_fps_idx" in k
    }
    lv = build_point_hierarchy_from_fps(
        xyz, arrays, STRIDES, NSAMPLES, prefix="geo_sm", with_up=False
    )
    assert all(l.up_idx is None and l.up_weight is None for l in lv)


def test_train_step_with_fps_wire_and_f16_target():
    """End-to-end: fps-only geo keys in the cond + f16 motion target."""
    rng = np.random.default_rng(2)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)

    full = build_point_hierarchy(cond["c_pc_xyz"], STRIDES, NSAMPLES)
    fps_arrays = {
        k: np.asarray(v).astype(np.int16)
        for k, v in geometry_to_arrays(full, prefix="geo_sm").items()
        if "_fps_idx" in k
    }
    cond_fps = dict(cond)
    cond_fps.update({k: jnp.asarray(v) for k, v in fps_arrays.items()})
    x16 = x.astype(jnp.float16)

    step = make_train_step(model, diffusion)
    state = init_state(model, x, cond)
    _, m_ref = step(init_state(model, x, cond), x, cond, np.uint32(3))
    _, m_fps = step(init_state(model, x, cond), x16, cond_fps, np.uint32(3))
    assert np.isfinite(float(m_fps["loss"]))
    # same RNG + same (deterministically rebuilt) geometry: losses agree to
    # the f16 target quantization
    np.testing.assert_allclose(
        float(m_fps["loss"]), float(m_ref["loss"]), rtol=5e-3, atol=5e-3
    )


def test_dataset_fps_wire(tmp_path):
    from afford_motion_tpu.data import create_dataset
    from tests.test_packed import _h3d_cfg
    from afford_motion_tpu.data.synthetic import make_synthetic_data_dir
    import argparse
    import prepare as prepare_cli
    from afford_motion_tpu.data.packed import pack_h3d

    data_dir = make_synthetic_data_dir(str(tmp_path), n_items=4, num_points=128)
    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="H3D", kind="sm", batch_size=4,
    ))
    pack_h3d(data_dir)
    ds = create_dataset(
        _h3d_cfg(data_dir, geometry_wire="fps", half_wire_x=True), "train"
    )
    assert getattr(ds, "_packed", None) is not None
    item = ds[0]
    geo = [k for k in item if k.startswith("geo_")]
    assert geo and all("_fps_idx" in k for k in geo)
    assert item["x"].dtype == np.float16
    # live (unpacked) path obeys the same wire
    ds2 = create_dataset(
        _h3d_cfg(data_dir, geometry_wire="fps", half_wire_x=True,
                 use_packed=False), "train"
    )
    item2 = ds2[0]
    geo2 = [k for k in item2 if k.startswith("geo_")]
    assert geo2 and all("_fps_idx" in k for k in geo2)
    assert item2["x"].dtype == np.float16
    # eval phase: untouched f32 wire (stage-1 dataset: no contact_folder)
    ds3 = create_dataset(
        _h3d_cfg(data_dir, name="ContactHumanML3DDataset",
                 data_repr="contact_cont_joints",
                 data_repr_joints=[0, 10, 11, 12, 20, 21],
                 half_wire_x=True), "test"
    )
    item3 = ds3[0]
    assert item3["x"].dtype == np.float32
    assert item3["c_pc_xyz"].dtype == np.float32
