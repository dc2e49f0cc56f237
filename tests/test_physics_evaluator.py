"""Text2MotionInSceneEvaluator physics path end-to-end with synthetic
SMPL-X assets (the full reference metric set: apd, non_collision, contact,
dist — reference: utils/evaluate.py:237-427)."""
import os
import pickle

import numpy as np
import pytest

from afford_motion_tpu.utils.config import DictConfig


@pytest.fixture()
def regressor_npz(tmp_path, monkeypatch):
    monkeypatch.setenv("SMPLX_USE_SYNTHETIC", "1")
    import jax

    from afford_motion_tpu.eval.joints_to_smplx import (
        JointsToSMPLXRegressor,
        save_regressor_npz,
    )

    reg = JointsToSMPLXRegressor()
    import jax.numpy as jnp

    variables = reg.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 8, 66)), jnp.zeros((1, 8), bool), train=False)
    path = tmp_path / "regressor.npz"
    save_regressor_npz(str(path), variables["params"])
    return str(path)


class _FakeDataset:
    def denormalize(self, x, clip=False):
        return x


class _FakeLoader:
    dataset = _FakeDataset()


def test_physics_metrics_end_to_end(tmp_path, regressor_npz, monkeypatch):
    monkeypatch.setenv("SMPLX_USE_SYNTHETIC", "1")
    from afford_motion_tpu.eval.evaluate import Text2MotionInSceneEvaluator

    cfg = DictConfig({"evaluator": {
        "name": "Text2MotionInSceneEvaluator", "njoints": 22,
        "k_samples": 2, "num_k_samples": 2, "eval_nbatch": 1,
        "eval_metrics": ["apd", "non_collision", "contact", "dist"],
        "save_results": True,
        "opt_rate": 0.02, "opt_steps": 3,
        "joints_to_smplx_model_weights": regressor_npz,
    }})
    ev = Text2MotionInSceneEvaluator(cfg)
    assert ev._fitter is not None, "fitter should construct with synthetic assets"

    rng = np.random.default_rng(0)
    L, N = 8, 64
    x_mask = np.zeros(L, dtype=bool)
    x_mask[6:] = True
    sample = {
        "sample": rng.normal(size=(L, 66)).astype(np.float32) * 0.3,
        "x_mask": x_mask,
        "c_pc_xyz": rng.normal(size=(N, 3)).astype(np.float32),
        "c_text": "sit on the chair",
        "info_set": "HUMANISE",
        "info_index": 0,
        "info_obj_mask": rng.random(N) < 0.2,
        "info_scene_trans": np.eye(4, dtype=np.float32),
        "info_scene_mesh": "",
    }
    k_sample = dict(sample)
    k_sample["k_samples"] = rng.normal(size=(2, L, 66)).astype(np.float32)

    ev.evaluate([sample], [k_sample], str(tmp_path), _FakeLoader())
    ev.report(str(tmp_path))

    for key in ("apd", "non_collision", "contact", "dist"):
        assert key in ev.metrics and len(ev.metrics[key]) == 1, key
        assert np.isfinite(ev.metrics[key][0])
    assert 0.0 <= ev.metrics["non_collision"][0] <= 1.0
    # saved per-sequence pkl includes fitted SMPL-X params
    with open(tmp_path / "joints" / "00000.pkl", "rb") as f:
        saved = pickle.load(f)
    assert "params" in saved and saved["params"].shape[-1] == 69
    assert (tmp_path / "metrics.txt").exists()


def test_physics_loop_compiles_once_across_ragged_lengths(
    tmp_path, regressor_npz, monkeypatch
):
    """Round-5 rehearsal finding: at protocol scale the physics loop must
    NOT recompile per sequence. Ragged valid-lengths and ragged object
    masks run through ONE compiled physics program (padded horizon,
    128-bucketed obj points) — at 1000+ sequences over a remote backend a
    per-item compile is minutes each."""
    monkeypatch.setenv("SMPLX_USE_SYNTHETIC", "1")
    from afford_motion_tpu.eval import physics as phys
    from afford_motion_tpu.eval.evaluate import Text2MotionInSceneEvaluator

    cfg = DictConfig({"evaluator": {
        "name": "Text2MotionInSceneEvaluator", "njoints": 22,
        "k_samples": 0, "num_k_samples": 0, "eval_nbatch": 1,
        "eval_metrics": ["non_collision", "contact", "dist"],
        "save_results": False, "opt_rate": 0.02, "opt_steps": 2,
        "joints_to_smplx_model_weights": regressor_npz,
    }})
    ev = Text2MotionInSceneEvaluator(cfg)
    rng = np.random.default_rng(1)
    L, N = 12, 256
    samples = []
    for i, m_len in enumerate((5, 9, 12)):   # ragged valid lengths
        x_mask = np.arange(L) >= m_len
        samples.append({
            "sample": rng.normal(size=(L, 66)).astype(np.float32) * 0.3,
            "x_mask": x_mask,
            "c_pc_xyz": rng.normal(size=(N, 3)).astype(np.float32),
            "c_text": "walk", "info_set": "HUMANISE", "info_index": i,
            # ragged obj-point counts, same 128-bucket
            "info_obj_mask": np.arange(N) < (40 + 17 * i),
            "info_scene_trans": np.eye(4, dtype=np.float32),
            "info_scene_mesh": "",
        })
    phys._physics_over_sequence_jit.clear_cache()
    phys.dist_to_obj.clear_cache()
    ev.evaluate(samples, [], str(tmp_path), _FakeLoader())
    assert len(ev.metrics["non_collision"]) == 3
    assert phys._physics_over_sequence_jit._cache_size() == 1
    assert phys.dist_to_obj._cache_size() == 1


def test_fit_mesh_sharding_equivalent(regressor_npz, monkeypatch):
    """Round-4 eval scale-out: JointsToSMPLXFitter.fit shards its batch
    over the data mesh (GSPMD; conftest provides 8 CPU devices). Rows are
    independent and params replicated, so per-row results match the
    unsharded compute to fp reduction-order level (per-device batch
    extents change vectorized summation order; observed ~2e-4 after a
    3-step refine)."""
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("SMPLX_USE_SYNTHETIC", "1")
    from afford_motion_tpu.eval.joints_to_smplx import JointsToSMPLXFitter
    from afford_motion_tpu.parallel.mesh import create_mesh_for_batch

    fitter = JointsToSMPLXFitter(regressor_npz, opt_rate=0.02, opt_steps=3)
    rng = np.random.default_rng(5)
    B, L = 8, 12
    joints = rng.normal(size=(B, L, 66)).astype(np.float32) * 0.3
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[:, 10:] = True

    mesh = create_mesh_for_batch(B)
    assert len(mesh.devices.ravel()) > 1, "conftest should expose 8 devices"
    sharded = fitter.fit(joints, x_mask)                 # mesh path

    # unsharded reference on one device
    pred = fitter._predict(fitter.params, jnp.asarray(joints),
                           jnp.asarray(x_mask))
    ref = np.asarray(fitter._refine(pred, jnp.asarray(joints),
                                    jnp.asarray(x_mask)))
    np.testing.assert_allclose(sharded, ref, rtol=2e-3, atol=1e-3)
