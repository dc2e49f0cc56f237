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
