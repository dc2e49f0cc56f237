"""End-to-end test for the JointsToSMPLX trainer CLI + fitter loading the
natively trained weights (synthetic body model via SMPLX_USE_SYNTHETIC)."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_train_and_load_regressor(tmp_path, monkeypatch):
    monkeypatch.setenv("SMPLX_USE_SYNTHETIC", "1")

    # synthetic motion pkls in the prepare-pipeline layout
    rng = np.random.default_rng(0)
    mdir = tmp_path / "HUMANISE" / "motions"
    mdir.mkdir(parents=True)
    for i in range(4):
        L = int(rng.integers(30, 60))
        pose_seq = (rng.normal(size=(L, 159)) * 0.2).astype(np.float32)
        betas = np.zeros(10, dtype=np.float32)
        with open(mdir / f"{i:06d}.pkl", "wb") as f:
            pickle.dump((pose_seq, betas), f)

    out = tmp_path / "regressor.npz"
    env = dict(os.environ, SMPLX_USE_SYNTHETIC="1", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "tools/train_joints_to_smplx.py",
         "--data_dir", str(tmp_path), "--sets", "HUMANISE",
         "--steps", "3", "--batch_size", "2", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()

    # the fitter must load the natively trained npz and run end to end
    from afford_motion_tpu.eval.joints_to_smplx import JointsToSMPLXFitter

    fitter = JointsToSMPLXFitter(str(out), opt_rate=0.02, opt_steps=5)
    joints = rng.normal(size=(1, 8, 66)).astype(np.float32) * 0.3
    x_mask = np.zeros((1, 8), dtype=bool)
    params = fitter.fit(joints, x_mask)
    assert params.shape == (1, 8, 69)
    verts_list = fitter.to_vertices(joints, x_mask)
    assert verts_list[0].shape[0] == 8 and verts_list[0].shape[2] == 3
