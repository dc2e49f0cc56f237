"""Point-op parity tests against brute-force numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from afford_motion_tpu.ops import (
    batched_fps,
    batched_knn,
    build_point_hierarchy,
    farthest_point_sampling,
    interpolate_three_nn,
    knn,
    query_and_group,
)


def np_fps(points: np.ndarray, m: int) -> np.ndarray:
    """Greedy FPS oracle, start at index 0 (matches pointops CUDA kernel)."""
    n = points.shape[0]
    sel = np.zeros(m, dtype=np.int64)
    min_d = np.full(n, np.inf)
    last = 0
    for i in range(1, m):
        d = ((points - points[last]) ** 2).sum(-1)
        min_d = np.minimum(min_d, d)
        last = int(np.argmax(min_d))
        sel[i] = last
    return sel


def np_knn(query, support, k):
    d = ((query[:, None, :] - support[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return idx, np.sqrt(np.take_along_axis(d, idx, axis=-1))


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    s = rng.normal(size=(256, 3)).astype(np.float32)
    idx, dist = knn(jnp.asarray(q), jnp.asarray(s), 8)
    widx, wdist = np_knn(q, s, 8)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-3, atol=1e-4)
    # indices may differ on exact ties; distances fully determine correctness
    d_from_idx = np.sqrt(((q[:, None] - s[np.asarray(idx)]) ** 2).sum(-1))
    np.testing.assert_allclose(d_from_idx, wdist, rtol=1e-3, atol=1e-4)


def test_knn_chunked_equals_unchunked():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    i1, d1 = knn(q, s, 16, chunk=256)
    i2, d2 = knn(q, s, 16, chunk=2048)
    # indices may flip on float near-ties between differently-shaped
    # matmuls; the distances must agree
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-5)
    assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.99


def test_fps_matches_greedy_oracle():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 32))
    want = np_fps(pts, 32)
    np.testing.assert_array_equal(got, want)
    assert got[0] == 0


def test_batched_ops_shapes():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(4, 256, 3)).astype(np.float32))
    idx = batched_fps(pts, 64)
    assert idx.shape == (4, 64) and idx.dtype == jnp.int32
    kidx, kdist = batched_knn(pts, pts, 8)
    assert kidx.shape == (4, 256, 8)
    # self is always the nearest neighbour of itself
    np.testing.assert_array_equal(np.asarray(kidx[..., 0]), np.arange(256)[None].repeat(4, 0))


def test_query_and_group():
    rng = np.random.default_rng(4)
    s_xyz = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
    out = query_and_group(4, s_xyz, None, feats, use_xyz=True)
    assert out.shape == (64, 4, 8)
    # first neighbour of each point is itself -> relative xyz 0, feats equal
    np.testing.assert_allclose(np.asarray(out[:, 0, :3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 0, 3:]), np.asarray(feats), rtol=1e-6)


def test_interpolation_weights_and_values():
    rng = np.random.default_rng(5)
    coarse = rng.normal(size=(16, 3)).astype(np.float32)
    fine = rng.normal(size=(64, 3)).astype(np.float32)
    feats = rng.normal(size=(16, 7)).astype(np.float32)
    got = np.asarray(interpolate_three_nn(jnp.asarray(coarse), jnp.asarray(fine), jnp.asarray(feats)))
    idx, dist = np_knn(fine, coarse, 3)
    recip = 1.0 / (dist + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    want = (feats[idx] * w[..., None]).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_interpolation_exact_at_coarse_points():
    """A fine point coinciding with a coarse point gets ~that feature."""
    coarse = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [5, 5, 5]], dtype=np.float32)
    feats = np.array([[1.0], [2.0], [3.0], [4.0]], dtype=np.float32)
    fine = np.array([[0, 0, 0], [10, 0, 0]], dtype=np.float32)
    got = np.asarray(interpolate_three_nn(jnp.asarray(coarse), jnp.asarray(fine), jnp.asarray(feats)))
    np.testing.assert_allclose(got[:, 0], [1.0, 2.0], atol=1e-4)


def test_hierarchy_structure():
    rng = np.random.default_rng(6)
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    levels = build_point_hierarchy(xyz, [1, 4, 4], [8, 16, 16])
    assert len(levels) == 3
    assert levels[0].xyz.shape == (2, 256, 3)
    assert levels[0].fps_idx is None and levels[0].up_idx is None
    assert levels[0].knn_idx.shape == (2, 256, 8)
    assert levels[1].xyz.shape == (2, 64, 3)
    assert levels[1].fps_idx.shape == (2, 64)
    assert levels[1].down_knn_idx.shape == (2, 64, 16)
    assert levels[1].up_idx.shape == (2, 256, 3)
    assert levels[1].up_weight.shape == (2, 256, 3)
    np.testing.assert_allclose(np.asarray(levels[1].up_weight).sum(-1), 1.0, rtol=1e-5)
    assert levels[2].xyz.shape == (2, 16, 3)
    # default: CUDA-parity greedy selection ORDER (order-sensitive token
    # consumers — see tests/test_golden_parity.py); sort_fps/banded relabel
    # each level ascending to preserve Morton locality for banded kernels
    want = np_fps(np.asarray(xyz[0]), 64)
    got = np.asarray(levels[1].fps_idx[0])
    np.testing.assert_array_equal(got, want)
    sorted_levels = build_point_hierarchy(xyz, [1, 4, 4], [8, 16, 16],
                                          sort_fps=True)
    got_sorted = np.asarray(sorted_levels[1].fps_idx[0])
    np.testing.assert_array_equal(got_sorted, np.sort(got_sorted))
    np.testing.assert_array_equal(got_sorted, np.sort(want))


def test_gradients_flow_through_grouping():
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))

    def loss(f):
        return jnp.sum(query_and_group(4, xyz, None, f, use_xyz=False) ** 2)

    g = jax.grad(loss)(feats)
    assert g.shape == feats.shape
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_fps_pallas_batched_kernel_matches_xla():
    """The batched VMEM-resident FPS kernel (interpret mode on CPU) selects
    exactly the same indices as the XLA reference path — including the
    batch-chunked wrapper (chunk boundary forced via a tiny VMEM budget)."""
    from afford_motion_tpu.ops.pallas import fps as pfps
    from afford_motion_tpu.ops.pointops import _batched_fps_xla

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(5, 260, 3)).astype(np.float32))
    want = np.asarray(_batched_fps_xla(pts, 64))

    got = np.asarray(pfps.fps_pallas(pts, 64))
    np.testing.assert_array_equal(got, want)

    # force the chunked path (2-row chunks incl. a ragged tail)
    old = pfps._VMEM_BUDGET_BYTES
    pfps._VMEM_BUDGET_BYTES = pfps._PLANES * 260 * 4 * 2
    try:
        pfps.fps_pallas.clear_cache()
        got_chunked = np.asarray(pfps.fps_pallas(pts, 64))
    finally:
        pfps._VMEM_BUDGET_BYTES = old
        pfps.fps_pallas.clear_cache()
    np.testing.assert_array_equal(got_chunked, want)
