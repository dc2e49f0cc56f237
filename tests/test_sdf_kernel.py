"""Fused 1-NN SDF kernel (ops/pallas/sdf.py) vs the XLA matmul-form path
(reference math: utils/evaluate.py:473-520 smplx_signed_distance).

Interpret-mode on CPU; the compiled equality at protocol shapes
(O=8192, H=10475) is the tests_tpu/ tier."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afford_motion_tpu.eval.physics import (  # noqa: E402
    physics_over_sequence, signed_distance_seq,
)
from afford_motion_tpu.ops.pallas.sdf import nn1_pallas, supports  # noqa: E402


def _cloud(rng, o, l, h):
    pts = jnp.asarray(rng.normal(size=(o, 3)).astype(np.float32))
    vs = jnp.asarray(rng.normal(size=(l, h, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, h, size=(2 * h, 3)).astype(np.int32))
    return pts, vs, faces


def test_nn1_matches_bruteforce_with_padding():
    rng = np.random.default_rng(0)
    # H=331 is not a multiple of 128 -> exercises the sentinel padding
    pts, vs, _ = _cloud(rng, 256, 3, 331)
    d2, idx = nn1_pallas(pts, vs)
    for f in range(3):
        D = np.sum(
            (np.asarray(pts)[:, None] - np.asarray(vs[f])[None]) ** 2, axis=-1
        )
        np.testing.assert_array_equal(np.asarray(idx[f]), D.argmin(1))
        np.testing.assert_allclose(np.asarray(d2[f]), D.min(1),
                                   rtol=1e-4, atol=1e-6)


def test_nn1_tie_break_first_index():
    # two identical support vertices: the smaller index must win
    pts = jnp.zeros((128, 3), dtype=jnp.float32)
    v = np.ones((1, 130, 3), dtype=np.float32)
    v[0, 40] = 0.25        # duplicate nearest at indices 40 and 97
    v[0, 97] = 0.25
    _, idx = nn1_pallas(pts, jnp.asarray(v))
    assert int(idx[0, 0]) == 40


def test_signed_distance_seq_pallas_vs_xla():
    rng = np.random.default_rng(1)
    pts, vs, faces = _cloud(rng, 256, 4, 300)
    sdf_p = np.asarray(signed_distance_seq(pts, vs, faces, kernel="pallas"))
    sdf_x = np.asarray(signed_distance_seq(pts, vs, faces, kernel="xla"))
    # same selections (ties aside), fp-level distance agreement
    np.testing.assert_allclose(sdf_p, sdf_x, rtol=1e-3, atol=1e-4)


def test_physics_metrics_agree_across_kernels():
    rng = np.random.default_rng(2)
    pts, vs, faces = _cloud(rng, 256, 4, 300)
    nc_p, ct_p = physics_over_sequence(pts, vs, faces, kernel="pallas")
    nc_x, ct_x = physics_over_sequence(pts, vs, faces, kernel="xla")
    np.testing.assert_allclose(np.asarray(nc_p), np.asarray(nc_x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ct_p), np.asarray(ct_x))


def test_supports_protocol_shapes():
    assert supports(8192, 10475)          # the eval protocol shape
    assert not supports(8191, 10475)      # queries must tile by 128


def test_env_override_restores_xla(monkeypatch):
    # AM_SDF_KERNEL wins over the config/argument value and is resolved
    # OUTSIDE the jit boundary (it participates in the trace-cache key)
    rng = np.random.default_rng(3)
    pts, vs, faces = _cloud(rng, 128, 2, 200)
    monkeypatch.setenv("AM_SDF_KERNEL", "xla")
    a = physics_over_sequence(pts, vs, faces, kernel="pallas")
    monkeypatch.delenv("AM_SDF_KERNEL")
    b = physics_over_sequence(pts, vs, faces, kernel="xla")
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_nn1_multi_chunk_path(monkeypatch):
    # shrink the VMEM budget so the running min/argmin carry across
    # support chunks is exercised at CPU-test scale (incl. a cross-chunk
    # exact tie, which must keep the EARLIER chunk's index)
    import afford_motion_tpu.ops.pallas.sdf as sdf_mod

    monkeypatch.setattr(sdf_mod, "_VMEM_BUDGET", 128 * 128 * 12 + 128 * 16)
    rng = np.random.default_rng(4)
    v = rng.normal(size=(2, 300, 3)).astype(np.float32)
    v[0, 250] = v[0, 10]          # exact duplicate across chunks
    pts = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    n_chunks, hc, _ = sdf_mod._chunking(300)
    assert n_chunks >= 2
    d2, idx = sdf_mod.nn1_pallas.__wrapped__(pts, jnp.asarray(v))
    for f in range(2):
        D = np.sum((np.asarray(pts)[:, None] - v[f][None]) ** 2, axis=-1)
        np.testing.assert_array_equal(np.asarray(idx[f]), D.argmin(1))
        np.testing.assert_allclose(np.asarray(d2[f]), D.min(1),
                                   rtol=1e-4, atol=1e-6)
