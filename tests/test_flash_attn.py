"""Flash-attention wiring (models/layers.py _flash_attention).

The Pallas kernel itself is TPU-only; on CPU we validate the padding +
segment-id construction against the einsum path by substituting the
kernel with the library's own pure-jnp ``mha_reference`` (identical
masking semantics to the compiled kernel)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from afford_motion_tpu.models import layers as L


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(0)
    B, Lq, Lk, D = 2, 70, 70, 32
    q = jnp.asarray(rng.normal(size=(B, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, D)).astype(np.float32))
    pad = np.zeros((B, Lk), dtype=bool)
    pad[0, 50:] = True       # torch convention: True = ignore this key
    pad[1, 64:] = True
    return q, k, v, jnp.asarray(pad)


def _reference_kernel(q, k, v, ab=None, segment_ids=None, *, sm_scale=1.0,
                      **kw):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa.mha_reference(q, k, v, ab, segment_ids, sm_scale=sm_scale)


def test_flash_wiring_matches_einsum(qkv, monkeypatch):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    monkeypatch.setattr(fa, "flash_attention", _reference_kernel)
    q, k, v, pad = qkv
    H = 4
    ref = L._attention(q, k, v, H, pad, lambda x: x)
    got = L._flash_attention(q, k, v, H, pad)
    assert got.shape == ref.shape
    # mha_reference runs matmuls at bf16 precision — tolerance accordingly
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_flash_wiring_no_mask(qkv, monkeypatch):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    monkeypatch.setattr(fa, "flash_attention", _reference_kernel)
    q, k, v, _ = qkv
    H = 4
    ref = L._attention(q, k, v, H, None, lambda x: x)
    got = L._flash_attention(q, k, v, H, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_flash_gated_off_by_default(qkv):
    """The module applies cleanly on the default path; off-TPU the einsum
    path is always taken (flash is TPU-gated) — bit-identical to round-1
    numerics. (No assertion on _FLASH itself: the on-chip checklist runs
    this suite WITH AM_FLASH_ATTN=1 deliberately.)"""
    q, k, v, pad = qkv
    m = L.TorchMultiHeadAttention(32, 4, 0.1)
    variables = m.init({"params": jax.random.PRNGKey(0)}, q, k, v, pad)
    out = m.apply(variables, q, k, v, pad)
    assert out.shape == q.shape


def test_flash_cmdm_integration(monkeypatch):
    """CMDM denoiser forward with the flash path forced (kernel substituted
    by mha_reference on CPU) must match the einsum path within bf16-matmul
    tolerance — validates mask plumbing (x_mask + CFG flags) through the
    segment-id construction at the model level."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.models.scene_map import (
        SCENEMAP_NSAMPLES, SCENEMAP_STRIDES,
    )
    from afford_motion_tpu.ops import build_point_hierarchy

    rng = np.random.default_rng(5)
    B, N, Lm = 2, 256, 12
    model = CMDM(
        motion_dim=66, latent_dim=64, time_emb_dim=64, text_feat_dim=32,
        contact_dim=6, planes=(8, 16, 32, 64), blocks=(2, 2, 2, 2),
        arch="trans_enc", num_layers=(1, 1), num_heads=4, dim_feedforward=64,
    )
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, Lm, 66)).astype(np.float32))
    x_mask = np.zeros((B, Lm), dtype=bool)
    x_mask[0, 9:] = True
    cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 32)).astype(np.float32)),
        "c_pc_xyz": xyz,
        "c_pc_contact": jnp.asarray(rng.random(size=(B, N, 6)).astype(np.float32)),
        "levels_sm": build_point_hierarchy(xyz, SCENEMAP_STRIDES, SCENEMAP_NSAMPLES),
        "x_mask": jnp.asarray(x_mask),
        "c_text_mask": jnp.asarray(np.array([[True], [False]])),  # CFG drop
    }
    t = jnp.asarray(np.array([3, 7], dtype=np.int32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                           train=False)
    ref = np.asarray(model.apply(variables, x, t, cond, train=False))

    monkeypatch.setattr(fa, "flash_attention", _reference_kernel)
    monkeypatch.setattr(L, "_flash_enabled", lambda: True)
    got = np.asarray(model.apply(variables, x, t, cond, train=False))
    valid = ~x_mask
    err = float(np.linalg.norm(got[valid] - ref[valid])
                / (np.linalg.norm(ref[valid]) + 1e-12))
    assert err < 5e-2, f"flash-path CMDM rel err {err}"
