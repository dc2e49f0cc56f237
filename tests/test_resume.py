"""Crash-resume correctness (VERDICT r4 item 2a; reference resume semantics:
utils/training.py:55-82 parse the step from the ckpt name and reload opt.pt
— the reference replays data from epoch 0 with fresh RNG, i.e. is NOT
bit-exact across a crash).

This tier proves the rebuild's resume is stronger: on the production
device-store path a run killed at step N and relaunched with
``task.train.resume_ckpt`` continues BIT-IDENTICALLY to the uninterrupted
run — params, opt_state, batch_stats, the index stream (device_store.
index_stream) and the per-megabatch host randomness (caption choice, crop
start, flag-transform draws) are all pure functions of (seed, step).
"""
import argparse
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afford_motion_tpu.data.synthetic import make_synthetic_data_dir

N_POINTS = 128


def _train(out, exp, data_dir, max_steps, resume=""):
    import train as train_entry

    ov = [
        "task=contact_motion_gen", "model=cmdm",
        f"exp_name={exp}", f"output_dir={out}", f"exp_dir={out}/{exp}",
        f"task.dataset.data_dir={data_dir}",
        "task.dataset.sets=['HUMANISE']",
        "task.dataset.num_points=%d" % N_POINTS,
        "diffusion.steps=8", f"task.train.max_steps={max_steps}",
        "task.train.batch_size=2", "task.train.save_every_step=4",
        "task.train.lr_anneal_steps=0",
        "model.latent_dim=64", "model.time_emb_dim=64", "model.num_heads=4",
        "model.dim_feedforward=128", "model.num_layers=[1,1]",
        "model.contact_model.planes=[16,32,64,128]",
        "seed=2023",
    ]
    if resume:
        ov.append(f"task.train.resume_ckpt={resume}")
    train_entry.main(ov)


def _load_tree(path):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def _assert_trees_bitwise_equal(a, b, where):
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for k, va in la:
        key = jax.tree_util.keystr(k)
        vb = lb[key]
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=f"{where}: leaf {key} differs after resume",
        )


@pytest.mark.slow
def test_cli_resume_bit_identical_device_store(tmp_path):
    """Kill-at-N + resume == uninterrupted 2N, bit for bit, through the
    real CLI on the device-store (production) input path."""
    import prepare as prepare_cli
    from afford_motion_tpu.data.packed import pack_motionx

    data_dir = make_synthetic_data_dir(str(tmp_path / "data"), n_items=8,
                                       num_points=N_POINTS)
    prepare_cli.cmd_geometry(argparse.Namespace(
        out_dir=data_dir, dataset="HUMANISE", kind="sm", batch_size=8))
    pack_motionx(data_dir, "HUMANISE")
    out = str(tmp_path / "out")

    # uninterrupted 8-step run
    _train(out, "full", data_dir, max_steps=8)
    # "crashed" 4-step run + resume to 8
    _train(out, "half", data_dir, max_steps=4)
    half_ckpt = os.path.join(out, "half", "ckpt", "model000004")
    assert os.path.isdir(half_ckpt)
    _train(out, "resumed", data_dir, max_steps=8, resume=half_ckpt)

    # the loop engaged the device store in all three runs (the path under test)
    for exp in ("full", "half", "resumed"):
        log = open(os.path.join(out, exp, "log", "runtime.log")).read()
        assert "device store: staging" in log, f"{exp} ran without device store"

    full = _load_tree(os.path.join(out, "full", "ckpt", "model000008"))
    resumed = _load_tree(os.path.join(out, "resumed", "ckpt", "model000008"))
    assert int(np.asarray(full["step"])) == 8
    assert int(np.asarray(resumed["step"])) == 8
    for part in ("params", "opt_state", "batch_stats"):
        _assert_trees_bitwise_equal(full[part], resumed[part], part)


@pytest.mark.quick
def test_loader_epoch_shuffle_is_pure():
    """The per-epoch permutation must be a pure function of (seed, epoch)
    so a resumed process that jumps straight to epoch e reproduces it."""
    from afford_motion_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 17

        def __getitem__(self, i):
            return {"v": np.asarray([i])}

    a = DataLoader(_DS(), batch_size=4, shuffle=True, seed=7, prefetch=0)
    b = DataLoader(_DS(), batch_size=4, shuffle=True, seed=7, prefetch=0)
    # iterate `a` through epochs 0..2, then ask a FRESH loader for epoch 2
    plans_a = []
    for ep in range(3):
        a.set_epoch(ep)
        plans_a.append([x.copy() for x in a._batch_indices()])
    b.set_epoch(2)
    plan_b = b._batch_indices()
    for x, y in zip(plans_a[2], plan_b):
        np.testing.assert_array_equal(x, y)
    # distinct epochs shuffle differently; distinct seeds too
    assert not all(
        np.array_equal(x, y) for x, y in zip(plans_a[0], plans_a[1])
    )
    c = DataLoader(_DS(), batch_size=4, shuffle=True, seed=8, prefetch=0)
    c.set_epoch(2)
    assert not all(
        np.array_equal(x, y) for x, y in zip(plan_b, c._batch_indices())
    )


@pytest.mark.quick
def test_loader_iter_batches_skip():
    """iter_batches(skip=k) yields exactly the epoch's batches[k:] without
    materializing the skipped ones."""
    from afford_motion_tpu.data.loader import DataLoader

    loads = []

    class _DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            loads.append(i)
            return {"v": np.asarray([i])}

    dl = DataLoader(_DS(), batch_size=3, shuffle=True, seed=3, prefetch=0,
                    drop_last=True)
    dl.set_epoch(1)
    want = dl._batch_indices()[2:]
    got = list(dl.iter_batches(skip=2))
    assert len(got) == len(want) == 2
    for batch, idxs in zip(got, want):
        np.testing.assert_array_equal(batch["v"].ravel(), idxs)
    assert len(loads) == 6  # only the un-skipped items were loaded
