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


def test_sdf_nn1_compiled_protocol_shape():
    """Compiled fused 1-NN SDF kernel at the eval protocol shape
    (O=8192 scene points x H=10475 SMPL-X verts): selection equality vs
    the XLA matmul-form path and fp-level sdf agreement (the two paths
    round d2 differently — coordinate-difference vs matmul form — so idx
    may differ only at exact f32 ties)."""
    from afford_motion_tpu.eval.physics import (
        physics_over_sequence, signed_distance_seq,
    )
    from afford_motion_tpu.ops.pallas.sdf import nn1_pallas

    rng = np.random.default_rng(13)
    L = 4
    pts = jnp.asarray(rng.normal(size=(8192, 3)).astype(np.float32))
    vs = jnp.asarray(rng.normal(size=(L, 10475, 3)).astype(np.float32) * 0.5)
    faces = jnp.asarray(rng.integers(0, 10475, size=(20908, 3)).astype(np.int32))

    d2, idx = nn1_pallas(pts, vs)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for f in range(L):
        # brute force in f64 on host: the kernel's f32 coordinate-diff d2
        # must match the f64 selection everywhere except f32-level ties
        D = np.sum((np.asarray(pts, np.float64)[:, None]
                    - np.asarray(vs[f], np.float64)[None]) ** 2, axis=-1)
        ref_idx = D.argmin(1)
        agree = (idx[f] == ref_idx).mean()
        assert agree > 0.999, f"frame {f}: idx agreement {agree}"
        np.testing.assert_allclose(d2[f], D.min(1), rtol=1e-4, atol=1e-6)

    sdf_p = np.asarray(signed_distance_seq(pts, vs, faces, kernel="pallas"))
    sdf_x = np.asarray(signed_distance_seq(pts, vs, faces, kernel="xla"))
    # sign flips only possible at ties; distances agree to fp
    mismatch = np.mean(np.abs(sdf_p - sdf_x) > 1e-3)
    assert mismatch < 1e-3, f"sdf mismatch rate {mismatch}"

    nc_p, ct_p = physics_over_sequence(pts, vs, faces, kernel="pallas")
    nc_x, ct_x = physics_over_sequence(pts, vs, faces, kernel="xla")
    np.testing.assert_allclose(np.asarray(nc_p), np.asarray(nc_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ct_p), np.asarray(ct_x))


def test_eval_stack_f32_matmuls_exact_vs_cpu():
    """The metric-stack GRU embeddings and the SMPL-X LBS must compute in
    TRUE f32 on the TPU (explicit Precision.HIGHEST — the MXU default
    silently rounds f32 operands to bf16, the bug class the round-3
    banded `_dot_precision` fix caught; round 4 found the same in
    eval/physics.py, eval/t2m_models.py and eval/smplx_lbs.py). Pins the
    TPU results to the CPU f32 reference at ~1e-5 — the default MXU
    precision fails this at ~1e-2."""
    from afford_motion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
    from afford_motion_tpu.eval.smplx_lbs import SMPLXModel, smplx_forward
    from afford_motion_tpu.eval.t2m_models import synthetic_t2m_params

    rng = np.random.default_rng(14)
    cpu = jax.devices("cpu")[0]

    wrapper = EvaluatorWrapper(None, variant="mdm",
                               params=synthetic_t2m_params())
    motions = rng.normal(size=(8, 196, 263)).astype(np.float32)
    m_lens = (rng.integers(10, 49, size=(8,)) * 4).astype(np.int32)
    emb_tpu = np.asarray(wrapper.get_motion_embeddings(motions, m_lens))
    with jax.default_device(cpu):
        emb_cpu = np.asarray(wrapper.get_motion_embeddings(motions, m_lens))
    np.testing.assert_allclose(emb_tpu, emb_cpu, rtol=2e-4, atol=2e-5)

    body = SMPLXModel.synthetic(num_verts=10475, num_faces=20908)
    transl = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    orient = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32) * 0.2)
    pose = jnp.asarray(rng.normal(size=(2, 63)).astype(np.float32) * 0.2)
    verts_tpu, joints_tpu = smplx_forward(body, transl, orient, pose)
    with jax.default_device(cpu):
        verts_cpu, joints_cpu = smplx_forward(body, transl, orient, pose)
    # 1e-3 separates the bug (bf16 rounding ~1e-2) from legitimate f32
    # reduction-order differences between backends (~3e-4 on the chain)
    np.testing.assert_allclose(np.asarray(joints_tpu), np.asarray(joints_cpu),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(verts_tpu), np.asarray(verts_cpu),
                               rtol=1e-3, atol=1e-3)


def test_device_pool_extraction_bit_identical_on_tpu():
    """Round-5 HBM-staged eval pools (eval_humanml.DeviceResidentPool):
    on the COMPILED TPU path, staged extraction must be BIT-identical to
    the host path. This holds only because the length-sort gather runs as
    a standalone eager device op and the SAME jitted encoder executable
    serves both paths — fusing the gather into the jit compiles a
    different XLA program whose tiling drifts at the ULP level (observed
    at protocol scale: one R-precision near-tie flip, ~1e-5 relative FID
    movement). Interpret-mode CPU tests cannot catch this class."""
    from afford_motion_tpu.eval.eval_humanml import (
        DeviceResidentPool, evaluate_fid, evaluate_matching_score,
    )
    from afford_motion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
    from afford_motion_tpu.eval.t2m_models import synthetic_t2m_params

    rng = np.random.default_rng(23)
    wrapper = EvaluatorWrapper(None, variant="mdm",
                               params=synthetic_t2m_params())

    def pools(n, b=32):
        out = []
        for _ in range(n):
            out.append({
                "word_embs": rng.normal(size=(b, 22, 300)).astype(np.float32),
                "pos_ohot": rng.normal(size=(b, 22, 15)).astype(np.float32),
                "sent_len": rng.integers(5, 22, size=(b,)).astype(np.int32),
                "motion": rng.normal(size=(b, 196, 263)).astype(np.float32),
                "m_len": (rng.integers(10, 49, size=(b,)) * 4).astype(np.int32),
            })
        return out

    batches = pools(5)             # one merged group of 4 + 1 tail
    staged = DeviceResidentPool(batches)
    m1, r1, a1 = evaluate_matching_score(
        wrapper, {"x": list(batches)}, extract_pools=4)
    m2, r2, a2 = evaluate_matching_score(
        wrapper, {"x": staged}, extract_pools=4)
    assert m1["x"] == m2["x"]
    np.testing.assert_array_equal(r1["x"], r2["x"])
    np.testing.assert_array_equal(a1["x"], a2["x"])

    f1 = evaluate_fid(wrapper, list(batches), a1, extract_pools=4)
    f2 = evaluate_fid(wrapper, staged, a2, extract_pools=4)
    assert f1["x"] == f2["x"]
