"""Device-resident corpus (train/device_store.py): assembled batches must
match the host packed-path wire bit-for-bit given aligned RNG draws."""
import argparse
import random

import numpy as np
import pytest

import jax.numpy as jnp

from afford_motion_tpu.data import create_dataset
from afford_motion_tpu.data.packed import pack_h3d
from afford_motion_tpu.data.synthetic import make_synthetic_data_dir
from afford_motion_tpu.models.conditioning import host_prepare_cond
from afford_motion_tpu.train.device_store import DeviceStore, make_assemble_fn
from tests.test_packed import _h3d_cfg

N_POINTS = 128


class _HashText:
    def encode(self, texts):
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % (2 ** 31))
            out[i] = rng.normal(size=16).astype(np.float32)
        return out


@pytest.fixture(scope="module")
def store_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("dstore")
    data_dir = make_synthetic_data_dir(str(root), n_items=6, num_points=N_POINTS)
    import prepare as prepare_cli

    prepare_cli.cmd_sort(argparse.Namespace(out_dir=data_dir, dataset="H3D"))
    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="H3D", kind="sm", batch_size=8))
    pack_h3d(data_dir)
    cfg = _h3d_cfg(data_dir, geometry_wire="fps", half_wire_x=True)
    ds = create_dataset(cfg, "train")
    assert getattr(ds, "_packed", None) is not None
    store = DeviceStore.try_build(ds)
    assert store is not None
    return ds, store


def test_meta_and_fields(store_env):
    ds, store = store_env
    assert store.meta["n_items"] == len(ds.name_list)
    assert store.arrays["motion16"].dtype == jnp.float16
    assert store.arrays["xyz16"].shape[1] == N_POINTS
    assert any("_fps_idx" in k for k in store.arrays)


def test_assembled_batch_matches_host_wire(store_env):
    ds, store = store_env
    te = _HashText()
    assemble = make_assemble_fn(store)

    for i in range(3):
        # host path
        random.seed(100 + i)
        np.random.seed(200 + i)
        item = ds[i]
        batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                 for k, v in item.items()}
        batch["x"] = np.asarray(item["x"])[None]
        batch["c_text"] = [item["c_text"]]
        x_ref, cond_ref = host_prepare_cond(batch, te)

        # store path with the same RNG streams
        random.seed(100 + i)
        np.random.seed(200 + i)
        meta = store.draw_batch(ds, [i])
        texts = meta.pop("c_text")
        meta["text_emb"] = te.encode(texts)[:, None, :].astype(np.float16)
        item_row = meta.pop("item_row")
        x, cond = assemble({"item_row": jnp.asarray(item_row),
                            **{k: jnp.asarray(v) for k, v in meta.items()}})

        np.testing.assert_array_equal(np.asarray(x), x_ref)
        np.testing.assert_array_equal(np.asarray(cond["x_mask"]), cond_ref["x_mask"])
        np.testing.assert_array_equal(np.asarray(cond["c_pc_xyz"]), cond_ref["c_pc_xyz"])
        np.testing.assert_array_equal(
            np.asarray(cond["c_pc_contact"]), cond_ref["c_pc_contact"]
        )
        np.testing.assert_allclose(
            np.asarray(cond["text_emb"], np.float32),
            cond_ref["text_emb"].astype(np.float32), atol=1e-3,
        )
        for k in cond_ref:
            if "_fps_idx" in k:
                np.testing.assert_array_equal(np.asarray(cond[k]), cond_ref[k])


def test_try_build_rejects_unsupported(store_env):
    ds, _ = store_env
    # eval phase / missing x16 wire -> no store
    old_phase = ds.phase
    try:
        ds.phase = "test"
        assert DeviceStore.try_build(ds) is None
    finally:
        ds.phase = old_phase
    old = ds._x16
    try:
        ds._x16 = False
        assert DeviceStore.try_build(ds) is None
    finally:
        ds._x16 = old


def test_train_step_with_device_store(store_env):
    ds, store = store_env
    from tests.test_train import tiny_cmdm, tiny_diffusion, init_state
    from afford_motion_tpu.train import make_train_step
    import jax

    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    assemble = make_assemble_fn(store)
    te = _HashText()

    random.seed(5); np.random.seed(5)
    ids = [0, 1, 2, 3]
    meta = store.draw_batch(ds, ids)
    texts = meta.pop("c_text")
    meta["text_emb"] = te.encode(texts)[:, None, :].astype(np.float16)
    item_row = jnp.asarray(meta.pop("item_row"))
    cond_small = {k: jnp.asarray(v) for k, v in meta.items()}

    # init with an assembled example
    x0, cond0 = assemble({"item_row": item_row, **cond_small})
    # tiny model expects motion_dim=66 but the synthetic tree is 263-d;
    # build a matching model instead
    from afford_motion_tpu.models.cmdm import CMDM
    model = CMDM(
        motion_dim=x0.shape[-1], latent_dim=32, time_emb_dim=32, text_feat_dim=16,
        contact_dim=cond0["c_pc_contact"].shape[-1], planes=(8, 16, 32, 64),
        blocks=(2, 2, 2, 2), arch="trans_enc", num_layers=(1, 1), num_heads=4,
        dim_feedforward=32,
    )
    state = init_state(model, x0.astype(jnp.float32), cond0)
    step = make_train_step(model, diffusion, assemble=assemble)
    new_state, m = step(state, item_row, cond_small, np.uint32(3))
    assert int(new_state.step) == 1
    assert np.isfinite(float(m["loss"]))


@pytest.fixture(scope="module")
def mx_store_env(tmp_path_factory):
    from afford_motion_tpu.data.packed import pack_motionx
    root = tmp_path_factory.mktemp("dstore_mx")
    data_dir = make_synthetic_data_dir(str(root), n_items=6, num_points=N_POINTS)
    import prepare as prepare_cli

    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="HUMANISE", kind="sm", batch_size=8))
    pack_motionx(data_dir, "HUMANISE")
    from tests.test_packed import _motionx_cfg

    cfg = _motionx_cfg(data_dir, geometry_wire="fps", half_wire_x=True)
    ds = create_dataset(cfg, "train")
    assert ds._packed.get("HUMANISE") is not None
    store = DeviceStore.try_build(ds)
    assert store is not None and store.meta["kind"] == "motionx"
    assert store.meta["rotate"] is True
    return ds, store


def test_motionx_assembled_matches_host_wire(mx_store_env):
    ds, store = mx_store_env
    te = _HashText()
    assemble = make_assemble_fn(store)
    for i in range(2):
        random.seed(50 + i)
        np.random.seed(60 + i)
        item = ds[i]
        batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                 for k, v in item.items()}
        batch["c_text"] = [item["c_text"]]
        x_ref, cond_ref = host_prepare_cond(batch, te)

        random.seed(50 + i)
        np.random.seed(60 + i)
        meta = store.draw_batch(ds, [i])
        texts = meta.pop("c_text")
        meta["text_emb"] = te.encode(texts)[:, None, :].astype(np.float16)
        item_row = meta.pop("item_row")
        x, cond = assemble({"item_row": jnp.asarray(item_row),
                            **{k: jnp.asarray(v) for k, v in meta.items()}})

        # rotation runs in f32 on device vs f64 on host; motion store is
        # f16-quantized raw -> tolerances instead of equality
        np.testing.assert_allclose(
            np.asarray(x, np.float32), x_ref.astype(np.float32), atol=6e-3
        )
        np.testing.assert_array_equal(np.asarray(cond["x_mask"]), cond_ref["x_mask"])
        np.testing.assert_allclose(
            np.asarray(cond["c_pc_xyz"], np.float32),
            cond_ref["c_pc_xyz"].astype(np.float32), atol=6e-3,
        )
        np.testing.assert_allclose(
            np.asarray(cond["c_pc_contact"], np.float32),
            cond_ref["c_pc_contact"].astype(np.float32), atol=2e-2,
        )
        for k in cond_ref:
            if "_fps_idx" in k:
                np.testing.assert_array_equal(np.asarray(cond[k]), cond_ref[k])


@pytest.mark.slow
def test_train_cli_engages_device_store(tmp_path):
    """train.py end to end on a packed tiny tree: the loop must build the
    device store, train, and checkpoint."""
    import train as train_entry
    from afford_motion_tpu.data.packed import pack_motionx
    import prepare as prepare_cli

    data_dir = make_synthetic_data_dir(str(tmp_path / "data"), n_items=8,
                                       num_points=N_POINTS)
    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="HUMANISE", kind="sm", batch_size=8))
    pack_motionx(data_dir, "HUMANISE")
    out = str(tmp_path / "out")
    train_entry.main([
        "task=contact_motion_gen", "model=cmdm",
        "exp_name=dstore_e2e", f"output_dir={out}", f"exp_dir={out}/dstore_e2e",
        f"task.dataset.data_dir={data_dir}",
        "task.dataset.sets=['HUMANISE']",
        "task.dataset.num_points=%d" % N_POINTS,
        "diffusion.steps=8", "task.train.max_steps=2",
        "task.train.batch_size=2", "task.train.save_every_step=2",
        "model.latent_dim=64", "model.time_emb_dim=64", "model.num_heads=4",
        "model.dim_feedforward=128", "model.num_layers=[1,1]",
        "model.contact_model.planes=[16,32,64,128]",
        "seed=2023",
    ])
    from pathlib import Path
    ckpts = list((Path(out) / "dstore_e2e" / "ckpt").iterdir())
    assert ckpts, "no checkpoint written"
    log = (Path(out) / "dstore_e2e" / "log" / "runtime.log").read_text()
    assert "device store: staging" in log


def test_flag_transforms_supported_and_rng_parity(store_env):
    """The FLAGSHIP t2m stage-2 chain (RandomEraseLang/RandomEraseContact)
    must be accepted by the store, and the replayed flag draws must match
    the dataset's transform chain bit-for-bit (same np.random stream)."""
    data_dir = store_env[0].data_dir
    cfg = _h3d_cfg(
        data_dir, geometry_wire="fps", half_wire_x=True,
        train_transforms=["RandomEraseLang", "RandomEraseContact",
                          "NumpyToTensor"],
        transform_cfg={"gravity_dim": 2, "random_mask_prob": 0.5,
                       "random_mask_prob_pc": 0.5},
    )
    ds = create_dataset(cfg, "train")
    store = DeviceStore.try_build(ds)
    assert store is not None
    assert store.meta["flag_chain"] == [("c_text_erase", 0.5),
                                        ("c_pc_erase", 0.5)]
    te = _HashText()
    assemble = make_assemble_fn(store)
    hit = {"c_text_erase": 0, "c_pc_erase": 0}
    for i in range(4):
        random.seed(300 + i); np.random.seed(400 + i)
        item = ds[i]
        batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                 for k, v in item.items()}
        batch["c_text"] = [item["c_text"]]
        _, cond_ref = host_prepare_cond(batch, te)

        random.seed(300 + i); np.random.seed(400 + i)
        meta = store.draw_batch(ds, [i])
        meta["text_emb"] = te.encode(meta.pop("c_text"))[:, None, :].astype(np.float16)
        item_row = meta.pop("item_row")
        x, cond = assemble({"item_row": jnp.asarray(item_row),
                            **{k: jnp.asarray(v) for k, v in meta.items()}})
        for k in ("c_text_erase", "c_pc_erase"):
            assert k in cond and k in cond_ref
            np.testing.assert_array_equal(np.asarray(cond[k]), cond_ref[k])
            hit[k] += int(np.asarray(cond[k]).any())
        np.testing.assert_array_equal(np.asarray(cond["c_pc_xyz"]),
                                      cond_ref["c_pc_xyz"])
    # p=0.5 over 4 draws: overwhelmingly likely both outcomes appear;
    # guards against all-False trivially "matching"
    assert any(v > 0 for v in hit.values())

    # a chain the store cannot replay -> host-pipeline fallback
    cfg_bad = _h3d_cfg(
        data_dir, geometry_wire="fps", half_wire_x=True,
        train_transforms=["RandomSetContactNull", "NumpyToTensor"],
        transform_cfg={"gravity_dim": 2, "random_mask_prob_pc": 0.5},
    )
    assert DeviceStore.try_build(create_dataset(cfg_bad, "train")) is None


def test_device_geometry_cache_matches_in_step_rebuild(store_env):
    """add_geometry_cache precomputes the hierarchy ONCE with the same
    kernels the in-step rebuild would use — the assembled cached cond must
    reproduce the fps-wire rebuild exactly (indices) / to fp tolerance
    (regathered xyz, up weights)."""
    ds, store = store_env
    import jax.numpy as jnp
    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.models.conditioning import add_hierarchies

    # private copy: the module-scoped store is shared across tests
    st = DeviceStore(dict(store.arrays), dict(store.meta))
    C = int(st.arrays["dist16"].shape[-1])
    model = CMDM(
        motion_dim=int(st.arrays["motion16"].shape[-1]), latent_dim=32,
        time_emb_dim=32, text_feat_dim=16, contact_dim=C,
        planes=(8, 16, 32, 64), blocks=(2, 2, 2, 2), arch="trans_enc",
        num_layers=(1, 1), num_heads=4, dim_feedforward=32,
    )
    assert st.add_geometry_cache(model)
    assert "geo_sm0_knn_idx" in st.arrays
    assemble = make_assemble_fn(st)
    te = _HashText()

    random.seed(7); np.random.seed(7)
    meta = st.draw_batch(ds, [0, 1, 2])
    meta["text_emb"] = te.encode(meta.pop("c_text"))[:, None, :].astype(np.float16)
    item_row = jnp.asarray(meta.pop("item_row"))
    _, cond = assemble({"item_row": item_row,
                        **{k: jnp.asarray(v) for k, v in meta.items()}})
    assert "geo_sm0_knn_idx" in cond

    # fps-wire leg: strip the cached fields, keep the fps indices
    cond_wire = {k: v for k, v in cond.items()
                 if not k.startswith("geo_") or k.endswith("_fps_idx")}
    h_cached = add_hierarchies(model, cond)["levels_sm"]
    h_wire = add_hierarchies(model, cond_wire)["levels_sm"]
    assert len(h_cached) == len(h_wire)
    for lc, lw in zip(h_cached, h_wire):
        np.testing.assert_array_equal(np.asarray(lc.knn_idx), np.asarray(lw.knn_idx))
        np.testing.assert_allclose(
            np.asarray(lc.xyz), np.asarray(lw.xyz), atol=1e-6
        )
        for f in ("fps_idx", "down_knn_idx", "up_idx"):
            a, b = getattr(lc, f), getattr(lw, f)
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if lc.up_weight is not None:
            np.testing.assert_allclose(
                np.asarray(lc.up_weight), np.asarray(lw.up_weight), atol=1e-5
            )


def test_device_geometry_cache_partial_budget(store_env):
    """When the full cache exceeds the HBM budget, whole levels are kept
    from the deepest up (level 0's kNN — the biggest field — rebuilds
    in-step) and the hybrid path must still reproduce the full rebuild."""
    ds, store = store_env
    import jax.numpy as jnp
    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.models.conditioning import add_hierarchies

    st = DeviceStore(dict(store.arrays), dict(store.meta))
    C = int(st.arrays["dist16"].shape[-1])
    model = CMDM(
        motion_dim=int(st.arrays["motion16"].shape[-1]), latent_dim=32,
        time_emb_dim=32, text_feat_dim=16, contact_dim=C,
        planes=(8, 16, 32, 64), blocks=(2, 2, 2, 2), arch="trans_enc",
        num_layers=(1, 1), num_heads=4, dim_feedforward=32,
    )
    existing = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize for v in st.arrays.values()
    )
    # room for a bit more than half the full cache -> deep levels only
    full = DeviceStore(dict(store.arrays), dict(store.meta))
    assert full.add_geometry_cache(model)
    cache_bytes = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for k, v in full.arrays.items()
        if k.startswith("geo_") and "_fps_idx" not in k
    )
    assert st.add_geometry_cache(model, max_bytes=existing + cache_bytes // 2)
    assert "geo_sm0_knn_idx" not in st.arrays          # biggest field dropped
    deep = [k for k in st.arrays
            if k.startswith("geo_sm") and "_fps_idx" not in k]
    assert deep, "no deep-level fields kept"

    assemble = make_assemble_fn(st)
    te = _HashText()
    random.seed(9); np.random.seed(9)
    meta = st.draw_batch(ds, [0, 1])
    meta["text_emb"] = te.encode(meta.pop("c_text"))[:, None, :].astype(np.float16)
    item_row = jnp.asarray(meta.pop("item_row"))
    _, cond = assemble({"item_row": item_row,
                        **{k: jnp.asarray(v) for k, v in meta.items()}})
    assert "geo_sm0_knn_idx" not in cond
    cond_wire = {k: v for k, v in cond.items()
                 if not k.startswith("geo_") or k.endswith("_fps_idx")}
    h_mixed = add_hierarchies(model, cond)["levels_sm"]
    h_full = add_hierarchies(model, cond_wire)["levels_sm"]
    for lm, lf in zip(h_mixed, h_full):
        np.testing.assert_array_equal(np.asarray(lm.knn_idx), np.asarray(lf.knn_idx))
        if lm.down_knn_idx is not None:
            np.testing.assert_array_equal(
                np.asarray(lm.down_knn_idx), np.asarray(lf.down_knn_idx)
            )


def test_index_stream_resume_continuity():
    """Crash-resume must re-enter the exact epoch/chunk position of the
    uninterrupted run (no corpus replay), with the loader seed folded in
    and no index repeats within a pass."""
    from afford_motion_tpu.train.device_store import index_stream

    n_items, G, B = 100, 4, 3          # chunk=12, 8 chunks/pass, 32 steps/pass
    fresh = index_stream(n_items, G, B, 0, base_seed=2023, loader_seed=7)
    taken = [np.asarray(next(fresh)) for _ in range(20)]

    # resume within the first pass (5 chunks = 5*G steps consumed)
    resumed = index_stream(n_items, G, B, 5 * G, 2023, 7)
    for i in range(5, 20):
        np.testing.assert_array_equal(np.asarray(next(resumed)), taken[i])

    # resume inside the SECOND pass (step 40 -> ep 1, chunk 2)
    resumed2 = index_stream(n_items, G, B, 10 * G, 2023, 7)
    for i in range(10, 20):
        np.testing.assert_array_equal(np.asarray(next(resumed2)), taken[i])

    # the dataloader's shuffle seed changes the permutation
    other = index_stream(n_items, G, B, 0, 2023, 8)
    assert not np.array_equal(np.asarray(next(other)), taken[0])

    # chunks within one pass partition the corpus (no repeats)
    seen = np.concatenate(taken[:8])
    assert len(set(seen.tolist())) == len(seen)


def test_h3d_stage1_store_matches_host(store_env):
    ds2_cfg_dir = store_env[0].data_dir
    cfg = _h3d_cfg(
        ds2_cfg_dir, name="ContactHumanML3DDataset",
        data_repr="contact_cont_joints",
        data_repr_joints=[0, 10, 11, 12, 20, 21],
        geometry_wire="fps", half_wire_x=True,
    )
    ds = create_dataset(cfg, "train")
    store = DeviceStore.try_build(ds)
    assert store is not None and store.meta["kind"] == "h3d_contact"
    te = _HashText()
    assemble = make_assemble_fn(store)
    for i in range(2):
        random.seed(30 + i); np.random.seed(40 + i)
        item = ds[i]
        batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                 for k, v in item.items()}
        batch["c_text"] = [item["c_text"]]
        x_ref, cond_ref = host_prepare_cond(batch, te)

        random.seed(30 + i); np.random.seed(40 + i)
        meta = store.draw_batch(ds, [i])
        meta["text_emb"] = te.encode(meta.pop("c_text"))[:, None, :].astype(np.float16)
        item_row = meta.pop("item_row")
        x, cond = assemble({"item_row": jnp.asarray(item_row),
                            **{k: jnp.asarray(v) for k, v in meta.items()}})
        # f32 target through the same formula: near-exact
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(cond["c_pc_xyz"]), cond_ref["c_pc_xyz"])
        for k in cond_ref:
            if "_fps_idx" in k:
                np.testing.assert_array_equal(np.asarray(cond[k]), cond_ref[k])


def test_motionx_stage1_store_matches_host(mx_store_env):
    from tests.test_packed import _motionx_cfg

    data_dir = mx_store_env[0].data_dir
    cfg = _motionx_cfg(
        data_dir, name="ContactMapDataset",
        data_repr="contact_cont_joints",
        data_repr_joints=[0, 10, 11, 12, 20, 21],
        use_color=True, use_openscene=False, point_feat_dim=32,
        train_transforms=["RandomRotation", "ApplyTransformCDM", "NumpyToTensor"],
        geometry_wire="fps", half_wire_x=True,
    )
    ds = create_dataset(cfg, "train")
    store = DeviceStore.try_build(ds)
    assert store is not None and store.meta["kind"] == "motionx_contact"
    assert store.meta["rotate"] and store.meta["use_color"]
    te = _HashText()
    assemble = make_assemble_fn(store)
    for i in range(2):
        random.seed(70 + i); np.random.seed(80 + i)
        item = ds[i]
        batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                 for k, v in item.items()}
        batch["c_text"] = [item["c_text"]]
        x_ref, cond_ref = host_prepare_cond(batch, te)

        random.seed(70 + i); np.random.seed(80 + i)
        meta = store.draw_batch(ds, [i])
        meta["text_emb"] = te.encode(meta.pop("c_text"))[:, None, :].astype(np.float16)
        item_row = meta.pop("item_row")
        x, cond = assemble({"item_row": jnp.asarray(item_row),
                            **{k: jnp.asarray(v) for k, v in meta.items()}})
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(cond["c_pc_xyz"], np.float32),
            cond_ref["c_pc_xyz"].astype(np.float32), atol=6e-3,
        )
        np.testing.assert_allclose(
            np.asarray(cond["c_pc_feat"], np.float32),
            cond_ref["c_pc_feat"].astype(np.float32), atol=2e-3,
        )


def test_sharded_store_bitmatches_replicated(store_env):
    """Corpus rows sharded over the 8-device mesh (shard_over_mesh +
    the psum_scatter fetch) must assemble bit-identical batches to the
    replicated store — the storage-level replacement for the reference's
    per-rank DistributedSampler split (reference: train_ddp.py:50)."""
    import jax

    from afford_motion_tpu.parallel.mesh import create_mesh, shard_batch

    ds, store = store_env
    te = _HashText()
    assert jax.device_count() >= 8

    random.seed(31); np.random.seed(31)
    ids = [0, 1, 2, 3, 0, 1, 2, 3]          # B=8 over the 8-device mesh
    meta = store.draw_batch(ds, ids)
    texts = meta.pop("c_text")
    meta["text_emb"] = te.encode(texts)[:, None, :].astype(np.float16)
    batch = {"item_row": jnp.asarray(meta.pop("item_row")),
             **{k: jnp.asarray(v) for k, v in meta.items()}}

    assemble = make_assemble_fn(store)
    x_ref, cond_ref = jax.jit(assemble)(batch)

    # fresh store view sharded over the mesh (min_bytes=0: the synthetic
    # arrays are tiny; production keeps small index arrays replicated)
    sharded = DeviceStore(dict(store.arrays), dict(store.meta))
    mesh = create_mesh(jax.devices())
    sharded.shard_over_mesh(mesh, min_bytes=0)
    assert sharded._sharded_keys, "nothing sharded"
    assemble_s = make_assemble_fn(sharded)
    batch_s = shard_batch(batch, mesh)
    x_s, cond_s = jax.jit(assemble_s)(batch_s)

    np.testing.assert_array_equal(np.asarray(x_s), np.asarray(x_ref))
    assert set(cond_s) == set(cond_ref)
    for k in cond_ref:
        np.testing.assert_array_equal(
            np.asarray(cond_s[k]), np.asarray(cond_ref[k]), err_msg=k
        )


def test_sharded_store_train_step(store_env):
    """One jitted train step from the sharded store over the mesh."""
    import jax

    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from afford_motion_tpu.train import make_train_step
    from tests.test_train import init_state, tiny_diffusion

    ds, store = store_env
    te = _HashText()
    sharded = DeviceStore(dict(store.arrays), dict(store.meta))
    mesh = create_mesh(jax.devices())
    sharded.shard_over_mesh(mesh, min_bytes=0)
    assemble = make_assemble_fn(sharded)

    random.seed(7); np.random.seed(7)
    ids = [0, 1, 2, 3, 0, 1, 2, 3]
    meta = sharded.draw_batch(ds, ids)
    texts = meta.pop("c_text")
    meta["text_emb"] = te.encode(texts)[:, None, :].astype(np.float16)
    batch = {"item_row": jnp.asarray(meta.pop("item_row")),
             **{k: jnp.asarray(v) for k, v in meta.items()}}
    batch = shard_batch(batch, mesh)

    x0, cond0 = jax.jit(assemble)(batch)
    model = CMDM(
        motion_dim=x0.shape[-1], latent_dim=32, time_emb_dim=32, text_feat_dim=16,
        contact_dim=cond0["c_pc_contact"].shape[-1], planes=(8, 16, 32, 64),
        blocks=(2, 2, 2, 2), arch="trans_enc", num_layers=(1, 1), num_heads=4,
        dim_feedforward=32,
    )
    state = replicate(init_state(model, x0.astype(jnp.float32), cond0), mesh)
    step = make_train_step(model, tiny_diffusion(), assemble=assemble)
    item_row = batch["item_row"]
    cond_small = {k: v for k, v in batch.items() if k != "item_row"}
    new_state, m = step(state, item_row, cond_small, np.uint32(3))
    assert int(jax.device_get(new_state.step)) == 1
    assert np.isfinite(float(jax.device_get(m["loss"])))
