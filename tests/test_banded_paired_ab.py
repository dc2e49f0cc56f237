"""CI guard for the paired banded A/B instrument (VERDICT r3 #2).

Runs the harness end-to-end on CPU with two legs and two paired seeds:
the full-kNN leg and the shipped banded recipe (interpret-mode Pallas on
CPU). This is NOT the accuracy evidence — that comes from the real-TPU
run recorded in docs/PARITY.md — it pins the instrument itself: the
stage-1 handoff stays covered under per-seed reruns (shuffle_seed must be
pinned while the sampling seed varies), the paired statistics come out
finite, and the fixed-seed train-loss parity check produces a curve.
"""
import numpy as np
import pytest

from tools.banded_paired_ab import LEGS, run_paired_ab


@pytest.mark.slow
def test_paired_ab_instrument(tmp_path):
    report = run_paired_ab(
        str(tmp_path),
        num_points=256,
        train_steps=8,
        diffusion_steps=8,
        repeats=2,
        legs={"full": LEGS["full"], "w128_adapt": LEGS["w128_adapt"]},
    )

    # every leg ran every seed and produced a real APD
    for leg in ("full", "w128_adapt"):
        apd = report["legs"][leg]["apd"]
        assert apd["n"] == 2
        assert np.isfinite(apd["mean"]) and apd["mean"] > 0

    paired = report["paired_vs_full"]["w128_adapt"]
    # the paired per-seed deltas exist and are finite — the instrument's
    # whole point is that these are comparable across seeds
    assert paired["apd_rel_delta"]["n"] == 2
    assert np.isfinite(paired["apd_rel_delta"]["mean"])
    rms = paired["motion_rms_rel_delta"]
    assert rms["n"] == 2 and np.isfinite(rms["mean"])
    # same checkpoint, same noise stream; only neighbor sets differ — the
    # propagated deviation must be a perturbation, not a different motion
    assert 0.0 <= rms["mean"] < 0.5

    # fixed-seed train-side check produced comparable curves
    tlp = report["train_loss_parity"]
    assert tlp["steps"] > 0
    assert np.isfinite(tlp["max_rel_divergence"])
