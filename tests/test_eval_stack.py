"""Eval-stack tests: T2M encoder parity vs torch (the checkpoint-layout
oracle), metric formula sanity, motion-representation invariants, physics
SDF sign behavior."""
import numpy as np
import pytest

import jax.numpy as jnp

from afford_motion_tpu.eval.metrics import (
    calculate_activation_statistics,
    calculate_frechet_distance,
    calculate_R_precision,
    calculate_top_k,
    euclidean_distance_matrix,
)
from afford_motion_tpu.eval.motion_repr import qinv, qrot, recover_from_ric
from afford_motion_tpu.eval.physics import (
    dist_to_obj,
    physics_over_sequence,
    signed_distance_to_body,
)
from afford_motion_tpu.eval.t2m_models import (
    motion_encoder,
    movement_encoder,
    text_encoder,
)


# ------------------------------------------------------------- T2M parity
def _torch_state(module):
    return {k: v.detach().numpy().astype(np.float32) for k, v in module.state_dict().items()}


def test_movement_encoder_matches_torch():
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class TorchMove(nn.Module):
        def __init__(self, inp, hid, out):
            super().__init__()
            self.main = nn.Sequential(
                nn.Conv1d(inp, hid, 4, 2, 1), nn.Dropout(0.2), nn.LeakyReLU(0.2),
                nn.Conv1d(hid, out, 4, 2, 1), nn.Dropout(0.2), nn.LeakyReLU(0.2),
            )
            self.out_net = nn.Linear(out, out)

        def forward(self, x):
            return self.out_net(self.main(x.permute(0, 2, 1)).permute(0, 2, 1))

    m = TorchMove(62, 32, 16).eval()
    x = np.random.default_rng(0).normal(size=(3, 32, 62)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(movement_encoder(_torch_state(m), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_bigru_motion_encoder_matches_torch():
    import torch
    import torch.nn as nn
    from torch.nn.utils.rnn import pack_padded_sequence

    torch.manual_seed(1)
    H, D, OUT = 24, 16, 12

    class TorchMotion(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_emb = nn.Linear(D, H)
            self.gru = nn.GRU(H, H, batch_first=True, bidirectional=True)
            self.output_net = nn.Sequential(
                nn.Linear(H * 2, H), nn.LayerNorm(H), nn.LeakyReLU(0.2), nn.Linear(H, OUT)
            )
            self.hidden = nn.Parameter(torch.randn(2, 1, H))

        def forward(self, x, lens):
            h = self.input_emb(x)
            hidden = self.hidden.repeat(1, x.shape[0], 1)
            emb = pack_padded_sequence(h, lens.tolist(), batch_first=True)
            _, last = self.gru(emb, hidden)
            last = torch.cat([last[0], last[1]], dim=-1)
            return self.output_net(last)

    m = TorchMotion().eval()
    rng = np.random.default_rng(1)
    B, L = 4, 20
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    lens = np.array([20, 15, 9, 4])  # must be sorted desc for pack_padded
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(lens)).numpy()
    got = np.asarray(motion_encoder(_torch_state(m), jnp.asarray(x), jnp.asarray(lens)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_bigru_text_encoder_matches_torch():
    import torch
    import torch.nn as nn
    from torch.nn.utils.rnn import pack_padded_sequence

    torch.manual_seed(2)
    W, P, H, OUT = 30, 15, 20, 10

    class TorchText(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_emb = nn.Linear(P, W)
            self.input_emb = nn.Linear(W, H)
            self.gru = nn.GRU(H, H, batch_first=True, bidirectional=True)
            self.output_net = nn.Sequential(
                nn.Linear(H * 2, H), nn.LayerNorm(H), nn.LeakyReLU(0.2), nn.Linear(H, OUT)
            )
            self.hidden = nn.Parameter(torch.randn(2, 1, H))

        def forward(self, w, p, lens):
            h = self.input_emb(w + self.pos_emb(p))
            hidden = self.hidden.repeat(1, w.shape[0], 1)
            emb = pack_padded_sequence(h, lens.tolist(), batch_first=True)
            _, last = self.gru(emb, hidden)
            last = torch.cat([last[0], last[1]], dim=-1)
            return self.output_net(last)

    m = TorchText().eval()
    rng = np.random.default_rng(2)
    B, T = 3, 12
    w = rng.normal(size=(B, T, W)).astype(np.float32)
    p = rng.normal(size=(B, T, P)).astype(np.float32)
    lens = np.array([12, 8, 5])
    with torch.no_grad():
        want = m(torch.from_numpy(w), torch.from_numpy(p), torch.from_numpy(lens)).numpy()
    got = np.asarray(text_encoder(_torch_state(m), jnp.asarray(w), jnp.asarray(p), jnp.asarray(lens)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------- metrics
def test_fid_zero_for_identical_and_positive_for_shifted():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(256, 8))
    mu, cov = calculate_activation_statistics(a)
    assert abs(calculate_frechet_distance(mu, cov, mu, cov)) < 1e-8
    mu2, cov2 = calculate_activation_statistics(a + 3.0)
    assert calculate_frechet_distance(mu, cov, mu2, cov2) > 1.0


def test_r_precision_perfect_match():
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(32, 16))
    top_k = calculate_R_precision(emb, emb, top_k=3, sum_all=True)
    assert top_k[0] == 32 and top_k[2] == 32


def test_top_k_cumulative():
    sorted_idx = np.array([[0, 5, 2], [3, 1, 0], [9, 8, 2]])
    out = calculate_top_k(sorted_idx, 3)
    np.testing.assert_array_equal(out[0], [True, True, True])
    np.testing.assert_array_equal(out[1], [False, True, True])
    np.testing.assert_array_equal(out[2], [False, False, True])


# ------------------------------------------------------------ motion repr
def test_qrot_identity_and_inverse():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(10, 3))
    qid = np.zeros((10, 4)); qid[:, 0] = 1.0
    np.testing.assert_allclose(qrot(qid, v), v, atol=1e-12)
    ang = rng.uniform(0, np.pi, 10)
    q = np.zeros((10, 4)); q[:, 0] = np.cos(ang); q[:, 2] = np.sin(ang)
    np.testing.assert_allclose(qrot(qinv(q), qrot(q, v)), v, atol=1e-10)


def test_recover_from_ric_straight_walk():
    """Zero rotation velocity, constant +x velocity: the root must advance
    linearly in x at constant height."""
    L, J = 8, 22
    data = np.zeros((L, 263), dtype=np.float32)
    data[:, 1] = 0.1  # x velocity
    data[:, 3] = 0.9  # root height
    joints = recover_from_ric(data, J)
    assert joints.shape == (L, J, 3)
    np.testing.assert_allclose(joints[:, 0, 1], 0.9, atol=1e-6)
    np.testing.assert_allclose(joints[1:, 0, 0] - joints[:-1, 0, 0], 0.1, atol=1e-6)


# ---------------------------------------------------------------- physics
def test_signed_distance_sign_convention():
    """Points inside a closed cube get positive sdf, outside negative
    (the vertex-normal sign trick needs a reasonably dense closed mesh;
    the real use is the 10475-vertex SMPL-X body)."""
    # unit cube, 8 verts, 12 outward-wound triangles
    verts = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=jnp.float32
    )
    faces = jnp.asarray([
        [0, 1, 3], [0, 3, 2],   # x=0 face
        [4, 6, 7], [4, 7, 5],   # x=1
        [0, 4, 5], [0, 5, 1],   # y=0
        [2, 3, 7], [2, 7, 6],   # y=1
        [0, 2, 6], [0, 6, 4],   # z=0
        [1, 5, 7], [1, 7, 3],   # z=1
    ], dtype=jnp.int32)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 3.0]], dtype=jnp.float32)
    sdf = np.asarray(signed_distance_to_body(pts, verts, faces))
    assert sdf[0] > 0 and sdf[1] < 0

    ncs, cts = physics_over_sequence(pts, verts[None], faces)
    assert ncs.shape == (1,) and cts.shape == (1,)
    assert 0.0 <= float(ncs[0]) <= 1.0

    d = float(dist_to_obj(pts[1:2], verts, faces))
    assert d <= 0.0


def test_pooled_extraction_bit_identical():
    """Round-4 pooled extraction (evaluate_matching_score/evaluate_fid
    merge 8 protocol pools per device call): the per-pool statistics and
    activations must be BIT-identical to the per-pool path — embedding
    values are per-item and unsort=True restores input row order."""
    import numpy as np

    from afford_motion_tpu.eval.eval_humanml import (
        evaluate_fid, evaluate_matching_score,
    )
    from afford_motion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
    from afford_motion_tpu.eval.t2m_models import synthetic_t2m_params

    rng = np.random.default_rng(7)
    wrapper = EvaluatorWrapper(None, variant="mdm",
                               params=synthetic_t2m_params())

    def pools(n, b=8):
        out = []
        for a in range(0, n, b):
            out.append({
                "word_embs": rng.normal(size=(b, 22, 300)).astype(np.float32),
                "pos_ohot": rng.normal(size=(b, 22, 15)).astype(np.float32),
                "sent_len": rng.integers(5, 22, size=(b,)).astype(np.int32),
                "motion": rng.normal(size=(b, 196, 263)).astype(np.float32),
                "m_len": (rng.integers(10, 49, size=(b,)) * 4).astype(np.int32),
            })
        return out

    batches = pools(40)            # 5 pools: one merged group of 3 + 2 tail
    m1, r1, a1 = evaluate_matching_score(
        wrapper, {"x": list(batches)}, extract_pools=3)
    m2, r2, a2 = evaluate_matching_score(
        wrapper, {"x": list(batches)}, extract_pools=1)
    assert m1["x"] == m2["x"]
    np.testing.assert_array_equal(r1["x"], r2["x"])
    np.testing.assert_array_equal(a1["x"], a2["x"])

    f1 = evaluate_fid(wrapper, list(batches), a1, extract_pools=3)
    f2 = evaluate_fid(wrapper, list(batches), a2, extract_pools=1)
    assert f1["x"] == f2["x"]


def test_device_resident_pool_bit_identical():
    """Round-5 HBM-staged pools (DeviceResidentPool): staging a pool on
    device once and slicing per extraction chunk must reproduce the host
    path's statistics, activations, and FID BIT-identically — the only
    change is where the concat/length-sort-gather runs, and a gather
    reorders f32 rows exactly. Also covers the device-born motions
    override (sampler output that never left HBM)."""
    import jax.numpy as jnp
    import numpy as np

    from afford_motion_tpu.eval.eval_humanml import (
        DeviceResidentPool, evaluate_fid, evaluate_matching_score,
    )
    from afford_motion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
    from afford_motion_tpu.eval.t2m_models import synthetic_t2m_params

    rng = np.random.default_rng(11)
    wrapper = EvaluatorWrapper(None, variant="mdm",
                               params=synthetic_t2m_params())

    def pools(n, b=8):
        out = []
        for a in range(0, n, b):
            out.append({
                "word_embs": rng.normal(size=(b, 22, 300)).astype(np.float32),
                "pos_ohot": rng.normal(size=(b, 22, 15)).astype(np.float32),
                "sent_len": rng.integers(5, 22, size=(b,)).astype(np.int32),
                "motion": rng.normal(size=(b, 196, 263)).astype(np.float32),
                "m_len": (rng.integers(10, 49, size=(b,)) * 4).astype(np.int32),
            })
        return out

    batches = pools(40)            # 5 pools: one merged group of 3 + 2 tail
    staged = DeviceResidentPool(batches)
    m1, r1, a1 = evaluate_matching_score(
        wrapper, {"x": list(batches)}, extract_pools=3)
    m2, r2, a2 = evaluate_matching_score(
        wrapper, {"x": staged}, extract_pools=3)
    assert m1["x"] == m2["x"]
    np.testing.assert_array_equal(r1["x"], r2["x"])
    np.testing.assert_array_equal(a1["x"], a2["x"])

    f1 = evaluate_fid(wrapper, list(batches), a1, extract_pools=3)
    f2 = evaluate_fid(wrapper, staged, a2, extract_pools=3)
    assert f1["x"] == f2["x"]

    # device-born motions: pass the motion column as a jax array directly
    dev_motions = jnp.asarray(
        np.concatenate([b["motion"] for b in batches], axis=0))
    staged_dev = DeviceResidentPool(batches, motions=dev_motions)
    m3, r3, a3 = evaluate_matching_score(
        wrapper, {"x": staged_dev}, extract_pools=3)
    assert m1["x"] == m3["x"]
    np.testing.assert_array_equal(a1["x"], a3["x"])


def test_staged_params_packing_bit_identical():
    """Round-5 packed params staging (_staged_params concatenates leaves
    per dtype into one transfer and slices device-side): the staged tree
    must equal the host tree bitwise, leaf for leaf."""
    import jax
    import numpy as np

    from afford_motion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
    from afford_motion_tpu.eval.t2m_models import synthetic_t2m_params

    wrapper = EvaluatorWrapper(None, variant="mdm",
                               params=synthetic_t2m_params())
    staged = wrapper._staged_params()
    host_leaves, host_def = jax.tree_util.tree_flatten(wrapper.params)
    dev_leaves, dev_def = jax.tree_util.tree_flatten(staged)
    assert host_def == dev_def
    assert len(host_leaves) == len(dev_leaves)
    for h, d in zip(host_leaves, dev_leaves):
        h = np.asarray(h)
        d = np.asarray(d)
        assert h.shape == d.shape and h.dtype == d.dtype
        np.testing.assert_array_equal(h, d)
