"""Sample-mode (demo) CLI e2e: the two-stage prompt-file chain through
sample.py — stage-1 ContactVisualizer writes ``<case>/contact.npy`` which
stage-2's ContactMotionExampleDataset consumes via
``task.sample.contact_folder`` (reference: datasets/motionx.py:984-992;
utils/visualize.py:22-76). Mirrors the verify-skill recipe; previously
only driven manually."""
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afford_motion_tpu.data.synthetic import make_synthetic_data_dir

N_POINTS = 128


def _common(data_dir, out_dir, exp):
    return [
        f"exp_name={exp}",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/{exp}",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={N_POINTS}",
        "diffusion.steps=4",
        "task.train.max_steps=2",
        "task.train.batch_size=2",
        "task.train.save_every_step=2",
        "seed=2023",
    ]


@pytest.mark.slow
def test_two_stage_sample_mode(tmp_path):
    import sample as sample_entry
    import train as train_entry

    data_dir = make_synthetic_data_dir(str(tmp_path / "data"), n_items=8,
                                       num_points=N_POINTS)
    out_dir = str(tmp_path / "out")
    ex_dir = Path(data_dir, "examples")
    ex_dir.mkdir(exist_ok=True)

    # ---- stage 1: CDM train + sample (prompt file: text#set#index)
    (ex_dir / "contact_examples.txt").write_text(
        "walk to the chair#HUMANISE#6\nsit down#PROX#7\n"
    )
    cdm = _common(data_dir, out_dir, "s_cdm") + [
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
        "task.sample.batch_size=2",
        f"task.sample.data_path={ex_dir}/contact_examples.txt",
    ]
    train_entry.main(cdm)
    sample_entry.main(cdm)
    s1_dirs = sorted(Path(out_dir, "s_cdm").glob("sample-*"))
    assert s1_dirs, "stage-1 sample dir missing"
    contact_npys = list(s1_dirs[-1].glob("*/contact.npy"))
    assert contact_npys, "stage-1 contact.npy stage-link files missing"
    arr = np.load(contact_npys[0])
    assert arr.ndim >= 2 and np.isfinite(arr).all()

    # ---- stage 2: CMDM train + sample consuming the stage-1 contact.npy
    (ex_dir / "contact_motion_examples.txt").write_text(
        "walk to the chair#HUMANISE#6#28\nsit down#PROX#7#28\n"
    )
    cmdm = _common(data_dir, out_dir, "s_cmdm") + [
        "task=contact_motion_gen",
        "model=cmdm",
        "model.latent_dim=32",
        "model.time_emb_dim=32",
        "model.num_heads=4",
        "model.dim_feedforward=64",
        "model.num_layers=[1,1]",
        "model.contact_model.planes=[8,16,32,64]",
        "task.dataset.mix_train_ratio=0.0",
        "task.sample.batch_size=2",
        f"task.sample.data_path={ex_dir}/contact_motion_examples.txt",
        f"task.sample.contact_folder={s1_dirs[-1]}",
    ]
    train_entry.main(cmdm)
    sample_entry.main(cmdm)
    s2_dirs = sorted(Path(out_dir, "s_cmdm").glob("sample-*"))
    assert s2_dirs, "stage-2 sample dir missing"
    frames = list(s2_dirs[-1].glob("*/frame_*.ply"))
    assert frames, "stage-2 skeleton frame meshes missing"
