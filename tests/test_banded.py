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

    def spy(q, s, k, starts=None, w0=0):
        calls["hit"] = True
        return real(q, s, k, starts, w0)

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


# ---------------------------------------------------- adaptive window starts
@pytest.fixture()
def skewed_cloud():
    """Curve-sorted cloud with strong density skew (dense cluster + sparse
    halo) so FPS positions are nonuniform over the curve — the case the
    adaptive window centering exists for."""
    rng = np.random.default_rng(3)
    dense = rng.normal(size=(1600, 3)).astype(np.float32) * 0.2
    sparse = rng.normal(size=(448, 3)).astype(np.float32) * 4.0 + 2.0
    p = np.concatenate([dense, sparse])
    p = p[morton_order(p)]
    return np.stack([p, p[::-1][morton_order(p[::-1])]])


def _fps_sorted(p, m):
    """Greedy FPS (start 0) then ascending sort — the hierarchy's rule."""
    n = len(p)
    idx = np.zeros(m, dtype=np.int32)
    d = np.full(n, np.inf, dtype=np.float32)
    last = 0
    for i in range(1, m):
        d = np.minimum(d, ((p - p[last]) ** 2).sum(1))
        last = idx[i] = int(np.argmax(d))
    return np.sort(idx)


def test_adaptive_down_starts_alignment_and_range(skewed_cloud):
    p = jnp.asarray(skewed_cloud)
    B, N = p.shape[:2]
    M = 512
    fps = jnp.asarray(np.stack([_fps_sorted(q, M) for q in skewed_cloud]))
    starts = banded.adaptive_down_starts(fps, N)
    _, s = banded.window_starts(M, N, banded.window_width(N))
    assert starts.shape == (B, M // banded.TQ)
    st = np.asarray(starts)
    assert (st % 128 == 0).all()
    assert (st >= 0).all() and (st <= N - s).all()


def test_knn_banded_adaptive_contained_and_not_worse(skewed_cloud):
    """Adaptive-start windows: produced indices lie inside the per-item
    windows, and window-restricted exactness holds (each query's k results
    are the true k nearest within ITS window). Adaptive in-window recall
    of exact neighbors must be >= proportional on the skewed cloud."""
    p = jnp.asarray(skewed_cloud)
    B, N = p.shape[:2]
    M, k = 512, 8
    fps = jnp.asarray(np.stack([_fps_sorted(q, M) for q in skewed_cloud]))
    q = jnp.take_along_axis(p, fps[..., None], axis=1)
    starts = banded.adaptive_down_starts(fps, N)
    _, s = banded.window_starts(M, N, banded.window_width(N))

    idx_a, dist_a = banded.knn_banded(q, p, k, starts)
    ia, st = np.asarray(idx_a), np.asarray(starts)
    rel = ia - np.repeat(st, banded.TQ, axis=1)[:, :, None]
    assert ((rel >= 0) & (rel < s)).all(), "index outside adaptive window"

    # window-restricted exactness on a few tiles
    qs, ps = np.asarray(q), np.asarray(p)
    for b in range(B):
        for t in (0, M // banded.TQ - 1):
            w0 = st[b, t]
            for i in (t * banded.TQ, t * banded.TQ + 63):
                d = ((ps[b, w0:w0 + s] - qs[b, i]) ** 2).sum(1)
                best = np.sort(d)[:k]
                np.testing.assert_allclose(
                    np.sort(np.asarray(dist_a)[b, i]) ** 2, best,
                    atol=2e-2, rtol=1e-2,
                )

    # recall of TRUE neighbors: adaptive >= proportional
    idx_p, _ = banded.knn_banded(q, p, k)
    ip = np.asarray(idx_p)
    hits_a = hits_p = 0
    for b in range(B):
        d = ((ps[b][None, :, :] - qs[b][:, None, :]) ** 2).sum(-1)
        true = np.argsort(d, axis=1)[:, :k]
        for i in range(M):
            hits_a += len(set(true[i]) & set(ia[b, i]))
            hits_p += len(set(true[i]) & set(ip[b, i]))
    assert hits_a >= hits_p, (hits_a, hits_p)


def test_gather_banded_adaptive_matches_take_and_vjp(skewed_cloud):
    p = jnp.asarray(skewed_cloud)
    B, N = p.shape[:2]
    M, k = 512, 8
    fps = jnp.asarray(np.stack([_fps_sorted(q, M) for q in skewed_cloud]))
    q = jnp.take_along_axis(p, fps[..., None], axis=1)
    starts = banded.adaptive_down_starts(fps, N)
    idx, _ = banded.knn_banded(q, p, k, starts)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    got = banded.gather_banded(x, idx, starts)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    gb = jax.grad(lambda xx: (banded.gather_banded(xx, idx, starts) ** 2).sum())(x)
    gr = jax.grad(
        lambda xx: (jax.vmap(lambda v, ii: jnp.take(v, ii, axis=0))(xx, idx) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr), atol=1e-3, rtol=1e-4)


def test_hierarchy_attaches_adaptive_starts(skewed_cloud, monkeypatch):
    """build_point_hierarchy(banded=True) must attach down/up starts that
    its own kNN indices are contained in (the gather invariant), and the
    fps-wire rebuild must reproduce them identically."""
    from afford_motion_tpu.ops import hierarchy as H

    monkeypatch.setattr(banded, "available", lambda: True)
    monkeypatch.delenv("AM_BANDED_ADAPTIVE", raising=False)  # default ON
    p = jnp.asarray(skewed_cloud)
    levels = H.build_point_hierarchy(p, (1, 4), (8, 16), banded=True)
    l1 = levels[1]
    assert l1.down_starts is not None and l1.up_starts is not None
    _, s = banded.window_starts(512, 2048, banded.window_width(2048))
    st = np.asarray(l1.down_starts)
    rel = np.asarray(l1.down_knn_idx) - np.repeat(st, banded.TQ, axis=1)[:, :, None]
    assert ((rel >= 0) & (rel < s)).all()

    arrays = {"geo1_fps_idx": l1.fps_idx}
    rebuilt = H.build_point_hierarchy_from_fps(
        p, arrays, (1, 4), (8, 16), prefix="geo", banded=True
    )
    np.testing.assert_array_equal(
        np.asarray(rebuilt[1].down_starts), np.asarray(l1.down_starts)
    )
    np.testing.assert_array_equal(
        np.asarray(rebuilt[1].down_knn_idx), np.asarray(l1.down_knn_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(rebuilt[1].up_starts), np.asarray(l1.up_starts)
    )


@pytest.mark.quick
def test_window_knob_resolution_and_threading(monkeypatch):
    """Round-4 config promotion (VERDICT r3 #5): the W0 width and adaptive
    toggles are model-config values threaded to the kernels; AM_BANDED_*
    env vars are DEBUG overrides that win when set."""
    monkeypatch.delenv("AM_BANDED_WINDOW", raising=False)
    monkeypatch.delenv("AM_BANDED_ADAPTIVE", raising=False)
    assert banded.resolve_window(0) == 128          # shipped default
    assert banded.resolve_window(256) == 256        # config value
    assert banded.resolve_window(300) == 256        # rounded to 128-multiple
    assert banded.resolve_adaptive(None) is True
    assert banded.resolve_adaptive(False) is False
    monkeypatch.setenv("AM_BANDED_WINDOW", "512")
    monkeypatch.setenv("AM_BANDED_ADAPTIVE", "0")
    assert banded.resolve_window(256) == 512        # env override wins
    assert banded.resolve_adaptive(True) is False
    monkeypatch.delenv("AM_BANDED_WINDOW")
    monkeypatch.delenv("AM_BANDED_ADAPTIVE")
    # width policy scales with support size, clamped to W0
    assert banded.window_width(8192, 256) == 256
    assert banded.window_width(8192, 512) == 512
    assert banded.window_width(2048, 512) == 128    # (2048/16)//128*128


@pytest.mark.quick
def test_window_knob_reaches_level_geometry(monkeypatch):
    """model.banded_window flows through build_point_hierarchy into the
    LevelGeometry static field (gathers must reuse the build-time width)."""
    monkeypatch.delenv("AM_BANDED_WINDOW", raising=False)
    from afford_motion_tpu.ops.hierarchy import build_point_hierarchy

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(1, 512, 3)).astype(np.float32)
    pts = np.stack([p[morton_order(p)] for p in pts])
    levels = build_point_hierarchy(
        jnp.asarray(pts), (1, 4), (8, 8), with_up=False, banded=True,
        window=256,
    )
    assert all(lvl.window == 256 for lvl in levels)
    # different window => different static key => retrace (no cache mixups)
    levels2 = build_point_hierarchy(
        jnp.asarray(pts), (1, 4), (8, 8), with_up=False, banded=True,
        window=512,
    )
    assert all(lvl.window == 512 for lvl in levels2)
