"""End-to-end offline MDM-protocol eval on synthetic assets: a torch
finest.tar with the real T2M evaluator layout, eval meta, and generated
motion dumps -> metrics JSON (closes the h3d_eval path without the real
checkpoint)."""
import json
import os
import pickle

import numpy as np
import pytest


def _make_t2m_checkpoint(path, dim_pose=263, dim_move=512, dim_word=300,
                         dim_pos=15, hid_text=512, hid_motion=1024, coemb=512):
    """Random-weight torch checkpoint with the reference layout
    (reference: evaluator_wrapper.py:200-216 keys movement/text/motion_encoder)."""
    import torch
    import torch.nn as nn
    from torch.nn.utils.rnn import pack_padded_sequence  # noqa: F401

    torch.manual_seed(0)

    class Movement(nn.Module):
        def __init__(self):
            super().__init__()
            self.main = nn.Sequential(
                nn.Conv1d(dim_pose - 4, dim_move, 4, 2, 1), nn.Dropout(0.2),
                nn.LeakyReLU(0.2),
                nn.Conv1d(dim_move, dim_move, 4, 2, 1), nn.Dropout(0.2),
                nn.LeakyReLU(0.2),
            )
            self.out_net = nn.Linear(dim_move, dim_move)

    class Text(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_emb = nn.Linear(dim_pos, dim_word)
            self.input_emb = nn.Linear(dim_word, hid_text)
            self.gru = nn.GRU(hid_text, hid_text, batch_first=True, bidirectional=True)
            self.output_net = nn.Sequential(
                nn.Linear(hid_text * 2, hid_text), nn.LayerNorm(hid_text),
                nn.LeakyReLU(0.2), nn.Linear(hid_text, coemb))
            self.hidden = nn.Parameter(torch.randn(2, 1, hid_text))

    class Motion(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_emb = nn.Linear(dim_move, hid_motion)
            self.gru = nn.GRU(hid_motion, hid_motion, batch_first=True, bidirectional=True)
            self.output_net = nn.Sequential(
                nn.Linear(hid_motion * 2, hid_motion), nn.LayerNorm(hid_motion),
                nn.LeakyReLU(0.2), nn.Linear(hid_motion, coemb))
            self.hidden = nn.Parameter(torch.randn(2, 1, hid_motion))

    # scale weights down so deep GRUs stay finite
    def shrink(m):
        with torch.no_grad():
            for p in m.parameters():
                p.mul_(0.2)

    move, text, motion = Movement(), Text(), Motion()
    for m in (move, text, motion):
        shrink(m)
    torch.save({
        "movement_encoder": move.state_dict(),
        "text_encoder": text.state_dict(),
        "motion_encoder": motion.state_dict(),
        "epoch": 1,
    }, path)


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
