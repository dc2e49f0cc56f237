"""Compiled-Mosaic equality tests for every Pallas kernel (TPU required).

The CPU suite proves kernel SEMANTICS in interpret mode; this tier proves
the COMPILED kernels on the real chip produce the same results — the gap
that rounds 1-3 covered with one-off scratch scripts (docs/PERF.md
on-chip validation sections). Shapes are kept small enough that each
compile is tens of seconds; the whole file runs in ~3-5 min.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from afford_motion_tpu.ops.morton import morton_order
from afford_motion_tpu.ops.pallas import banded
from afford_motion_tpu.ops.pallas.fps import fps_pallas
from afford_motion_tpu.ops.pallas.gather import gather_rows
from afford_motion_tpu.ops.pointops import _batched_fps_xla


@pytest.fixture(scope="module")
def sorted_cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 2048, 3)).astype(np.float32)
    return np.stack([p[morton_order(p)] for p in pts])


def test_fps_compiled_matches_xla_selection():
    """The batched VMEM-resident FPS kernel selects bit-identical indices
    to the XLA reference path when COMPILED (fps.py round-3 kernel)."""
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(4, 1024, 3)).astype(np.float32))
    want = np.asarray(_batched_fps_xla(pts, 256))
    got = np.asarray(fps_pallas(pts, 256))
    np.testing.assert_array_equal(got, want)


def test_fps_compiled_flagship_shape():
    """Flagship L0->L1 shape (8192 -> 2048): compiled selection equality
    on a batch slice (the full-batch timing lives in bench.py)."""
    rng = np.random.default_rng(12)
    pts = jnp.asarray(rng.normal(size=(2, 8192, 3)).astype(np.float32))
    want = np.asarray(_batched_fps_xla(pts, 2048))
    got = np.asarray(fps_pallas(pts, 2048))
    np.testing.assert_array_equal(got, want)


def test_knn_banded_compiled_window_exactness(sorted_cloud):
    """Compiled banded kNN: indices in-window, distances equal the true
    k-smallest within each window (the packed-bits top-k compiled path)."""
    q = jnp.asarray(sorted_cloud)
    M = N = sorted_cloud.shape[1]
    k = 8
    idx, dist = banded.knn_banded(q, q, k)
    idx, dist = np.asarray(idx), np.asarray(dist)
    starts, s = banded.window_starts(M, N, banded.window_width(N))
    d2 = ((sorted_cloud[:, :, None] - sorted_cloud[:, None]) ** 2).sum(-1)
    for b in range(2):
        for t in (0, len(starts) // 2, len(starts) - 1):
            st = starts[t]
            seg = idx[b, t * 128:(t + 1) * 128]
            assert ((seg >= st) & (seg < st + s)).all()
            for i in (t * 128, t * 128 + 127):
                best = np.sort(d2[b, i, st:st + s])[:k]
                np.testing.assert_allclose(
                    np.sort(dist[b, i] ** 2), best, atol=2e-2, rtol=1e-2
                )


def test_gather_banded_compiled_and_vjp(sorted_cloud):
    """Compiled one-hot-matmul gather == XLA take; compiled transposed
    scatter (VJP) == XLA grad."""
    q = jnp.asarray(sorted_cloud)
    idx, _ = banded.knn_banded(q, q, 8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 2048, 12)).astype(np.float32))
    got = banded.gather_banded(x, idx)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    gb = jax.jit(jax.grad(lambda xx: (banded.gather_banded(xx, idx) ** 2).sum()))(x)
    gr = jax.grad(
        lambda xx: (jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(xx, idx) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr), atol=1e-3, rtol=1e-4)


def test_gather_banded_compiled_adaptive_starts(sorted_cloud):
    """The (B, G)-starts adaptive variant — SMEM rank-2 operand — compiled:
    gather equality + VJP vs XLA (the round-2 refactor that had only run
    in interpret mode before round 3)."""
    p = jnp.asarray(sorted_cloud)
    B, N = p.shape[:2]
    M, k = 512, 8
    fps = np.sort(np.asarray(fps_pallas(p, M)), axis=1)
    fpsj = jnp.asarray(fps)
    q = jnp.take_along_axis(p, fpsj[..., None], axis=1)
    starts = banded.adaptive_down_starts(fpsj, N)
    idx, _ = banded.knn_banded(q, p, k, starts)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    got = banded.gather_banded(x, idx, starts)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    gb = jax.jit(jax.grad(
        lambda xx: (banded.gather_banded(xx, idx, starts) ** 2).sum()
    ))(x)
    gr = jax.grad(
        lambda xx: (jax.vmap(lambda v, ii: jnp.take(v, ii, axis=0))(xx, idx) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr), atol=1e-3, rtol=1e-4)


def test_gather_banded_compiled_f32_bitexact(sorted_cloud):
    """The round-3 ``_dot_precision`` fix, pinned: an f32 one-hot SELECTION
    matmul must return the gathered rows BIT-exactly (MXU default precision
    silently rounded f32 operands to bf16 — the bug this tier caught). The
    f32+use_banded combination is PARITY.md's documented 'exact restore'
    flag set, so equality here is assert_array_equal, not allclose."""
    q = jnp.asarray(sorted_cloud)
    idx, _ = banded.knn_banded(q, q, 8)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 2048, 12)).astype(np.float32))
    got = np.asarray(banded.gather_banded(x, idx))
    ref = np.asarray(jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx))
    np.testing.assert_array_equal(got, ref)


def test_gather_rows_compiled():
    """The row-copy-loop gather kernel (non-banded fallback) compiled."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 1024, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, size=(2, 512, 8)).astype(np.int32))
    got = gather_rows(x, idx)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
