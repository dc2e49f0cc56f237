"""End-to-end CLI test: train a tiny CDM + CMDM on synthetic data through
the real train.py / test.py entry points (the two-stage pipeline including
the pred_contact handoff), mirroring the reference's launch-script flow."""
import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afford_motion_tpu.data.synthetic import make_synthetic_data_dir

N_POINTS = 128


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = make_synthetic_data_dir(str(root / "data"), n_items=8, num_points=N_POINTS)
    out_dir = str(root / "outputs")
    return data_dir, out_dir


def _common_overrides(data_dir, out_dir, exp_name):
    return [
        f"exp_name={exp_name}",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/{exp_name}",   # fixed dir (no timestamp) for the test
        f"task.dataset.data_dir={data_dir}",
        "task.dataset.num_points=%d" % N_POINTS,
        "diffusion.steps=8",
        "task.train.max_steps=4",
        "task.train.batch_size=2",
        "task.train.log_every_step=2",
        "task.train.save_every_step=4",
        "task.test.batch_size=2",
        "seed=2023",
    ]


@pytest.mark.slow
def test_two_stage_pipeline_through_cli(env):
    data_dir, out_dir = env
    import test as test_entry
    import train as train_entry

    # -------- stage 1: CDM train + test (writes pred_contact handoff)
    cdm_overrides = _common_overrides(data_dir, out_dir, "cdm_exp") + [
        "task=contact_gen",
        "model=cdm",
        "model.arch=Perceiver",
        "model.scene_model.use_scene_model=False",
        # small perceiver for CPU speed
        "model.arch_perceiver.encoder_q_input_channels=64",
        "model.arch_perceiver.encoder_kv_input_channels=32",
        "model.arch_perceiver.decoder_q_input_channels=32",
        "model.arch_perceiver.decoder_kv_input_channels=64",
        "model.arch_perceiver.encoder_num_heads=4",
        "model.arch_perceiver.decoder_num_heads=4",
        "model.arch_perceiver.encoder_self_attn_num_layers=1",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
    ]
    train_entry.main(cdm_overrides)
    ckpt_dir = Path(out_dir) / "cdm_exp" / "ckpt"
    assert any(p.name.startswith("model") for p in ckpt_dir.iterdir())

    test_entry.main(cdm_overrides)
    eval_dir = Path(out_dir) / "cdm_exp" / "eval"
    test_dirs = sorted(eval_dir.glob("test-*"))
    assert test_dirs, "no test dir created"
    metrics = test_dirs[-1] / "metrics.txt"
    assert metrics.exists()
    pred = list(test_dirs[-1].glob("*/pred_contact/*.npy"))
    assert pred, "stage-1 pred_contact handoff files missing"
    arr = np.load(pred[0])
    assert arr.ndim == 3  # (k, n, j) raw distances

    # -------- stage 2: CMDM train + test consuming the stage-1 handoff
    cmdm_overrides = _common_overrides(data_dir, out_dir, "cmdm_exp") + [
        "task=contact_motion_gen",
        "model=cmdm",
        "model.latent_dim=64",
        "model.time_emb_dim=64",
        "model.num_heads=4",
        "model.dim_feedforward=128",
        "model.num_layers=[1,1]",
        "model.contact_model.planes=[16,32,64,128]",
        "task.dataset.mix_train_ratio=0.0",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "task.evaluator.eval_metrics=['apd']",
        f"task.test.contact_folder={test_dirs[-1]}",
    ]
    train_entry.main(cmdm_overrides)
    test_entry.main(cmdm_overrides)
    eval_dir2 = Path(out_dir) / "cmdm_exp" / "eval"
    test_dirs2 = sorted(eval_dir2.glob("test-*"))
    assert test_dirs2
    metrics2 = json.loads((test_dirs2[-1] / "metrics.json").read_text())
    assert "apd" in metrics2 and len(metrics2["apd"]) > 0
    joints = list(test_dirs2[-1].glob("joints/*.pkl"))
    assert joints, "per-sequence joints results missing"
