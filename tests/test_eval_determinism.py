"""Eval-order determinism (VERDICT r2 item #8; SURVEY §7 hard-part 6).

The reference's metrics silently depend on deterministic eval order:
seeded test-set shuffles (reference datasets/motionx.py:117-119), fixed
caption choice under the entry-point seed, batch-grouped metrics. This
test pins that two runs of the full test.py CLI over the same checkpoint
produce BYTE-IDENTICAL metrics.json — any future RNG-threading change
that perturbs eval order fails loudly here.
"""
import json
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afford_motion_tpu.data.synthetic import make_synthetic_data_dir

N_POINTS = 128


@pytest.mark.quick
def test_metrics_json_byte_stable(tmp_path):
    import test as test_entry
    import train as train_entry

    data_dir = make_synthetic_data_dir(str(tmp_path / "data"), n_items=8,
                                       num_points=N_POINTS)
    out_dir = str(tmp_path / "out")
    overrides = [
        "exp_name=det_cdm",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/det_cdm",
        "task=contact_gen",
        "model=cdm",
        "model.arch=Perceiver",
        "model.scene_model.use_scene_model=False",
        "model.arch_perceiver.encoder_q_input_channels=32",
        "model.arch_perceiver.encoder_kv_input_channels=16",
        "model.arch_perceiver.decoder_q_input_channels=16",
        "model.arch_perceiver.decoder_kv_input_channels=32",
        "model.arch_perceiver.encoder_num_heads=4",
        "model.arch_perceiver.decoder_num_heads=4",
        "model.arch_perceiver.encoder_self_attn_num_layers=1",
        "model.arch_perceiver.last_dim=16",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={N_POINTS}",
        "diffusion.steps=4",
        "task.train.max_steps=1",
        "task.train.batch_size=2",
        "task.train.save_every_step=1",
        "task.test.batch_size=2",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "seed=2023",
    ]
    train_entry.main(overrides)

    def run_once():
        test_entry.main(overrides)
        test_dirs = sorted(Path(out_dir, "det_cdm", "eval").glob("test-*"),
                           key=lambda p: p.stat().st_mtime)
        d = test_dirs[-1]
        return ((d / "metrics.txt").read_bytes(),
                (d / "metrics.json").read_bytes()
                if (d / "metrics.json").exists() else b"")

    txt1, json1 = run_once()
    txt2, json2 = run_once()
    assert txt1 == txt2, "metrics.txt not byte-stable across eval runs"
    assert json1 == json2, "metrics.json not byte-stable across eval runs"
    # sanity: the metrics actually carry content
    assert b"dist_to_target" in txt1
