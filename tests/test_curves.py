"""Space-filling-curve ordering tests (ops/curves.py).

Hilbert correctness is checked exhaustively at small grids: bijectivity
and the defining unit-step adjacency property (consecutive indices are
Manhattan-distance-1 cells — the property Morton lacks and the reason
Hilbert windows keep more true kNN, docs/PERF.md).
"""
import numpy as np
import pytest

from afford_motion_tpu.ops.curves import (
    curve_codes,
    curve_order,
    detect_curve,
    hilbert_codes,
    hilbert_from_ints,
)
from afford_motion_tpu.ops.morton import morton_codes


@pytest.mark.parametrize("bits", [1, 2, 3])
def test_hilbert_bijective_and_adjacent(bits):
    side = 1 << bits
    g = np.stack(
        np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    code = hilbert_from_ints(g, bits)
    assert sorted(code.tolist()) == list(range(side ** 3)), "not a bijection"
    seq = g[np.argsort(code)].astype(int)
    steps = np.abs(np.diff(seq, axis=0)).sum(axis=1)
    assert (steps == 1).all(), "consecutive Hilbert cells must be adjacent"


def test_hilbert_codes_ordering_stable_and_idempotent():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(512, 3)).astype(np.float32)
    order = curve_order(p, "hilbert")
    assert sorted(order.tolist()) == list(range(512))
    ps = p[order]
    # sorting sorted data is the identity permutation
    np.testing.assert_array_equal(curve_order(ps, "hilbert"), np.arange(512))
    codes = hilbert_codes(ps)
    assert bool(np.all(codes[:-1] <= codes[1:]))


def test_detect_curve():
    rng = np.random.default_rng(5)
    p = rng.normal(size=(1024, 3)).astype(np.float32)
    assert detect_curve(p) is None  # random order matches neither
    assert detect_curve(p[curve_order(p, "morton")]) == "morton"
    assert detect_curve(p[curve_order(p, "hilbert")]) == "hilbert"


def test_curve_codes_dispatch_and_unknown():
    rng = np.random.default_rng(7)
    p = rng.normal(size=(64, 3))
    np.testing.assert_array_equal(curve_codes(p, "morton"), morton_codes(p))
    np.testing.assert_array_equal(curve_codes(p, "hilbert"), hilbert_codes(p))
    with pytest.raises(ValueError, match="unknown curve"):
        curve_codes(p, "peano")


def test_hilbert_window_locality_not_worse_than_morton():
    """On a room-scan-like cloud, the fraction of exact 8-NN inside a
    +-W index window must be at least Morton's (measured margin is
    +0.5-4pt; assert non-regression with a small tolerance)."""
    rng = np.random.default_rng(11)
    n = 2048
    # floor plane + a few box objects, surface-sampled
    parts = [np.c_[rng.uniform(0, 4, n // 2), rng.uniform(0, 4, n // 2),
                   np.abs(rng.normal(0, 0.02, n // 2))]]
    per = n // 8
    for _ in range(4):
        c = np.r_[rng.uniform(0.5, 3.5), rng.uniform(0.5, 3.5), 0.0]
        size = rng.uniform(0.3, 1.0, 3)
        face = rng.integers(0, 3, per)
        u = rng.uniform(0, 1, (per, 3))
        u[np.arange(per), face] = rng.integers(0, 2, per).astype(float)
        parts.append(c + u * size)
    p = np.concatenate(parts)[:n]
    p = p[rng.permutation(len(p))]

    def in_window_recall(order, w=128, k=8):
        ps = p[order]
        d = ((ps[:, None, :] - ps[None, :, :]) ** 2).sum(-1)
        nn = np.argsort(d, axis=1, kind="stable")[:, :k]
        rows = np.arange(n)[:, None]
        return float(np.mean(np.abs(nn - rows) <= w))

    r_m = in_window_recall(curve_order(p, "morton"))
    r_h = in_window_recall(curve_order(p, "hilbert"))
    assert r_h >= r_m - 0.005, (r_h, r_m)
