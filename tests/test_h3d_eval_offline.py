"""End-to-end offline MDM-protocol eval on synthetic assets: a torch
finest.tar with the real T2M evaluator layout, eval meta, and generated
motion dumps -> metrics JSON (closes the h3d_eval path without the real
checkpoint)."""
import json
import os
import pickle

import numpy as np
import pytest


from afford_motion_tpu.data.synthetic import make_synthetic_t2m_ckpt as _make_t2m_checkpoint


@pytest.mark.slow
def test_offline_eval_end_to_end(tmp_path):
    from afford_motion_tpu.data.synthetic import make_synthetic_motionx_set
    from h3d_eval.eval_h3d_offline import run_evaluation

    data_dir = tmp_path / "data"
    # GT corpus: H3D new_joint_vecs-style via the synthetic H3D tree
    from afford_motion_tpu.data.synthetic import make_synthetic_h3d
    make_synthetic_h3d(str(data_dir), n_items=16, num_points=64)

    # eval meta: T2M mean/std (+ glove absent -> hash fallback)
    meta = tmp_path / "eval" / "meta"
    meta.mkdir(parents=True)
    np.savez(meta / "t2m_mean_std.npz",
             mean=np.zeros(263, np.float32), std=np.ones(263, np.float32))

    ckpt = tmp_path / "finest.tar"
    _make_t2m_checkpoint(str(ckpt))

    # generated dumps in the evaluator's humanml pkl format
    results = tmp_path / "humanml"
    results.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        L = int(rng.integers(28, 80))
        with open(results / f"{i:06d}-0.pkl", "wb") as f:
            pickle.dump({
                "name": f"{i:06d}", "text": "a person walks",
                "tokens": ["a/DET", "person/NOUN", "walk/VERB"],
                "motion": rng.normal(size=(L, 263)).astype(np.float32),
                "m_len": L,
            }, f)
    # k-sample dumps for MM
    for i in range(2):
        L = 40
        with open(results / f"mm{i:06d}-0.pkl", "wb") as f:
            pickle.dump({
                "name": f"mm{i:06d}", "text": "t", "tokens": ["a/DET"],
                "motion": rng.normal(size=(12, L, 263)).astype(np.float32),
                "m_len": L,
            }, f)

    metrics = run_evaluation(
        str(results), data_dir=str(data_dir), eval_meta_dir=str(tmp_path / "eval"),
        ckpt=str(ckpt), eval_mode="mm_short", batch_size=4,
    )
    for key in ("Matching Score", "R_precision", "FID", "Diversity", "MultiModality"):
        assert key in metrics, key
    assert "vald" in metrics["FID"] and np.isfinite(metrics["FID"]["vald"][0])
    r = np.asarray(metrics["R_precision"]["vald"][0])
    assert r.shape == (3,) and (r >= 0).all() and (r <= 1).all()
    assert np.isfinite(metrics["MultiModality"]["vald"][0])


@pytest.mark.slow
def test_inrepo_humanml_metrics_through_evaluator(tmp_path):
    """Text2MotionInSceneEvaluator's Rprecison/fid path (66-d evaluator,
    reference: evaluate.py:388-407 + eval_humanml.py:164-183) on synthetic
    assets."""
    from afford_motion_tpu.data.synthetic import make_synthetic_motionx_set
    from afford_motion_tpu.eval.evaluate import Text2MotionInSceneEvaluator
    from afford_motion_tpu.utils.config import DictConfig

    data_dir = tmp_path / "data"
    make_synthetic_motionx_set(str(data_dir), "HumanML3D", n_items=16, num_points=64)
    meta = tmp_path / "eval" / "meta"
    meta.mkdir(parents=True)
    np.savez(meta / "mean_std.npz",
             mean=np.zeros(66, np.float32), std=np.ones(66, np.float32))
    with open(meta / "test.txt", "w") as f:
        f.write("\n".join(str(i) for i in range(16)))

    ckpt = tmp_path / "finest.tar"
    # 'ours' variant consumes the full 66-d motion (no strip-last-4)
    _make_t2m_checkpoint(str(ckpt), dim_pose=66, strip=False)

    cfg = DictConfig({"evaluator": {
        "name": "Text2MotionInSceneEvaluator", "njoints": 22,
        "k_samples": 0, "num_k_samples": 0, "eval_nbatch": 1,
        "eval_metrics": ["fid", "Rprecison"], "save_results": False,
        "opt_rate": 0.02, "opt_steps": 2,
        "joints_to_smplx_model_weights": "",
        "eval_meta_dir": str(tmp_path / "eval"),
        "t2m_ckpt_path": str(ckpt),
        "eval_batch_size": 8,
    }})
    ev = Text2MotionInSceneEvaluator(cfg)

    dd = str(data_dir)

    class _DS:
        data_dir = dd

        def denormalize(self, x, clip=False):
            return x

    class _DL:
        dataset = _DS()

    rng = np.random.default_rng(0)
    samples = []
    for i in range(16):
        L = 40
        x_mask = np.arange(196) >= L
        samples.append({
            "sample": rng.normal(size=(196, 66)).astype(np.float32),
            "x_mask": x_mask,
            "c_pc_xyz": rng.normal(size=(64, 3)).astype(np.float32),
            "c_text": "walk", "info_tokens": ["walk/VERB"],
            "info_set": "HumanML3D", "info_index": i,
            "info_scene_trans": np.eye(4, dtype=np.float32),
            "info_scene_mesh": "", "info_obj_mask": None,
        })
    ev.evaluate(samples, [], str(tmp_path), _DL())
    keys = [k for k in ev.metrics if k.startswith("H3D+")]
    assert any("FID" in k for k in keys), ev.metrics.keys()
    assert any("R_precision" in k for k in keys)
