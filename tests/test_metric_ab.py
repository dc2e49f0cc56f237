"""Metric-level A/B of the shipped approximations (VERDICT r1 #4).

Holds the checkpoint and sampling seed fixed and re-runs test.py + the
evaluator per compute path; asserts the evaluator metric deltas stay under
a stated tolerance. The reference's acceptance criterion is eval metrics
(reference: utils/eval/eval_humanml.py:164-183), not loss curves.

On CPU, approx_min_k is exact and the Pallas kernels don't run, so the
'shipped' leg isolates the bf16 deviation (it must equal the bf16 leg's
numerics class); the full TPU stack (Pallas packed-bits kNN + banded
windows) is measured by ``python tools/metric_ab.py`` on the real chip and
recorded in docs/PARITY.md.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.metric_ab import LEG_BF16, LEG_EXACT, LEG_SHIPPED, relative_deltas, run_ab

# Stated tolerance: relative APD delta vs the exact/f32 leg. bf16 keeps
# ~3 decimal digits per op; through an 8-step sampling chain + the APD
# pairwise-distance statistic the measured delta is ~1e-3 (CPU) — 5% is
# the acceptance band, far above noise yet tight enough to catch a broken
# compute path (a wrong neighborhood or dtype bug shifts APD by >>10%).
TOL = 0.05


@pytest.mark.slow
def test_eval_metric_ab_under_tolerance(tmp_path):
    results = run_ab(
        str(tmp_path),
        {"exact": LEG_EXACT, "bf16": LEG_BF16, "shipped": LEG_SHIPPED},
        num_points=256,
        train_steps=8,
        diffusion_steps=8,
    )
    deltas = relative_deltas(results)
    assert "apd" in results["exact"] and results["exact"]["apd"] > 0
    for leg, dd in deltas.items():
        for metric, rel in dd.items():
            assert rel < TOL, f"{leg}/{metric}: relative delta {rel:.4f} >= {TOL}"
