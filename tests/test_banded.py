"""Banded windowed-neighborhood kernels (ops/pallas/banded.py) — interpret
mode on CPU: window containment, window-restricted-exactness, gather/VJP
parity, and the enable gating."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from afford_motion_tpu.ops.morton import morton_codes, morton_order
from afford_motion_tpu.ops.pallas import banded


@pytest.fixture()
def sorted_cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 512, 3)).astype(np.float32)
    return np.stack([p[morton_order(p)] for p in pts])


def test_morton_order_is_monotone(sorted_cloud):
    for p in sorted_cloud:
        c = morton_codes(p)
        assert np.all(c[:-1] <= c[1:])


def test_knn_banded_window_and_exactness(sorted_cloud):
    q = jnp.asarray(sorted_cloud)
    M = N = 512
    k = 8
    idx, dist = banded.knn_banded(q, q, k)
    idx, dist = np.asarray(idx), np.asarray(dist)
    starts, s = banded.window_starts(M, N, banded.window_width(N))
    d2 = ((sorted_cloud[:, :, None] - sorted_cloud[:, None]) ** 2).sum(-1)
    for b in range(2):
        for t, st in enumerate(starts):
            seg = idx[b, t * 128:(t + 1) * 128]
            assert ((seg >= st) & (seg < st + s)).all()
            for i in range(t * 128, (t + 1) * 128):
                best = np.sort(d2[b, i, st:st + s])[:k]
                np.testing.assert_allclose(
                    np.sort(dist[b, i] ** 2), best, atol=2e-2, rtol=1e-2
                )


def test_gather_banded_matches_take_and_vjp(sorted_cloud):
    q = jnp.asarray(sorted_cloud)
    idx, _ = banded.knn_banded(q, q, 8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 512, 12)).astype(np.float32))
    got = banded.gather_banded(x, idx)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    gb = jax.grad(lambda xx: (banded.gather_banded(xx, idx) ** 2).sum())(x)
    gr = jax.grad(
        lambda xx: (jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(xx, idx) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr), atol=1e-3, rtol=1e-4)


def test_full_window_covers_any_indices():
    """When S == N the banded gather is exact for arbitrary indices."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 256, 5)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 256, size=(1, 128, 4)).astype(np.int32))
    _, s = banded.window_starts(128, 256, banded.window_width(256))
    assert s == 256
    got = banded.gather_banded(x, idx)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_no_global_state():
    """Bandedness is threaded explicitly (model.use_banded ->
    LevelGeometry.banded -> bgather banded=): the module must NOT expose
    mutable process-global on/off state."""
    assert not hasattr(banded, "set_enabled")
    assert not hasattr(banded, "_ENABLED")
    # CPU backend: compiled banded kernels unavailable (interpret-only)
    assert banded.available() is False or jax.default_backend() == "tpu"


def test_hierarchy_uses_windowed_knn_when_requested(sorted_cloud, monkeypatch):
    """_knn_auto routes through knn_banded when banded=True is passed
    (force available() truthy on CPU via monkeypatch), and stays exact
    when banded=False."""
    from afford_motion_tpu.ops import hierarchy as H

    calls = {}
    real = banded.knn_banded

    def spy(q, s, k):
        calls["hit"] = True
        return real(q, s, k)

    monkeypatch.setattr(banded, "available", lambda: True)
    monkeypatch.setattr(banded, "knn_banded", spy)
    q = jnp.asarray(sorted_cloud)
    H._knn_auto(q, q, 8, banded_on=True)
    assert calls.get("hit")
    calls.clear()
    H._knn_auto(q, q, 8, banded_on=False)
    assert not calls.get("hit")


def test_levelgeometry_banded_is_static_aux(sorted_cloud):
    """The banded flag is pytree aux data: toggling it changes the jit
    cache key (different treedefs), so numerics can't leak across
    train/eval in one process."""
    from afford_motion_tpu.ops.hierarchy import build_point_hierarchy

    q = jnp.asarray(sorted_cloud)
    lv_off = build_point_hierarchy(q, [1, 4], [8, 8], banded=False)
    lv_on = build_point_hierarchy(q, [1, 4], [8, 8], banded=True)
    t_off = jax.tree_util.tree_structure(lv_off)
    t_on = jax.tree_util.tree_structure(lv_on)
    assert t_off != t_on
    assert lv_on[0].banded and not lv_off[0].banded


def test_gather_banded_debug_assert(sorted_cloud, monkeypatch):
    """AM_BANDED_DEBUG=1 catches out-of-window indices on concrete calls
    (geometry-mismatch guard for future bgather call sites)."""
    monkeypatch.setenv("AM_BANDED_DEBUG", "1")
    rng = np.random.default_rng(3)
    # N=2048: window S < N, so a far-away index is out-of-window
    pts = rng.normal(size=(1, 2048, 3)).astype(np.float32)
    pts = np.stack([p[morton_order(p)] for p in pts])
    q = jnp.asarray(pts)
    idx, _ = banded.knn_banded(q, q, 8)
    _, s = banded.window_starts(2048, 2048, banded.window_width(2048))
    assert s < 2048
    x = jnp.asarray(rng.normal(size=(1, 2048, 4)).astype(np.float32))
    banded.gather_banded(x, idx)  # in-window: fine
    bad = np.asarray(idx).copy()
    bad[0, 0, 0] = 2047  # row block 0's window cannot reach the last row
    with pytest.raises(AssertionError):
        banded.gather_banded(x, jnp.asarray(bad))
