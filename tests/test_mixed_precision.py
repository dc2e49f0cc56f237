"""Mixed-precision (dtype=bfloat16) paths: same f32 params drive both
dtypes, outputs stay f32 and close to the f32 reference, grads are f32,
and the config knob reaches build_cdm/build_cmdm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

B, N, L, D = 2, 256, 24, 66


def _cond(rng, n=N):
    return {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 512)).astype(np.float32)),
        "c_pc_xyz": jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32)),
        "c_pc_contact": jnp.asarray(rng.random(size=(B, n, 6)).astype(np.float32)),
        "c_pc_feat": jnp.asarray(rng.random(size=(B, n, 3)).astype(np.float32)),
        "x_mask": jnp.zeros((B, L), dtype=bool),
    }


def _cmdm(dtype, arch="trans_enc", nl=(1, 1)):
    from afford_motion_tpu.models.cmdm import CMDM

    return CMDM(motion_dim=D, latent_dim=64, time_emb_dim=64, text_feat_dim=512,
                contact_dim=6, planes=(16, 32, 64, 128), blocks=(2, 2, 2, 2),
                arch=arch, num_layers=nl, num_heads=4, dim_feedforward=128,
                dtype=dtype)


@pytest.mark.parametrize("arch,nl", [("trans_enc", (1, 1)), ("trans_dec", (1, 1, 1))])
def test_cmdm_bf16_matches_f32(arch, nl):
    from afford_motion_tpu.models.conditioning import add_hierarchies

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    m32 = _cmdm(jnp.float32, arch, nl)
    ch = add_hierarchies(m32, _cond(rng))
    t = jnp.zeros((B,), dtype=jnp.int32)
    v = m32.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                 x, t, ch, train=False)
    o32 = m32.apply(v, x, t, ch, train=False)
    obf = _cmdm(jnp.bfloat16, arch, nl).apply(v, x, t, ch, train=False)
    assert obf.dtype == jnp.float32  # head stays full precision
    rel = float(jnp.abs(o32 - obf).max() / (jnp.abs(o32).max() + 1e-8))
    assert rel < 0.1, rel


def test_cmdm_bf16_grads_are_f32():
    from afford_motion_tpu.models.conditioning import add_hierarchies

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    m32 = _cmdm(jnp.float32)
    ch = add_hierarchies(m32, _cond(rng))
    t = jnp.zeros((B,), dtype=jnp.int32)
    v = m32.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                 x, t, ch, train=False)
    mbf = _cmdm(jnp.bfloat16)
    g = jax.grad(lambda p: mbf.apply({**v, "params": p}, x, t, ch, train=False).sum())(
        v["params"])
    assert all(l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("arch,arch_cfg", [
    ("MLP", (("point_mlp_dims", (64, 64)),)),
    ("Perceiver", (("encoder_q_input_channels", 64), ("encoder_kv_input_channels", 32),
                   ("decoder_q_input_channels", 32), ("decoder_kv_input_channels", 64),
                   ("encoder_num_heads", 4), ("decoder_num_heads", 4),
                   ("encoder_self_attn_num_layers", 1))),
    ("PointTrans", (("blocks", (2, 2, 2, 2)),)),
    ("PointTransV2", (("blocks", (2, 2, 2, 2)),)),
])
def test_cdm_bf16_matches_f32(arch, arch_cfg):
    from afford_motion_tpu.models.cdm import CDM
    from afford_motion_tpu.models.conditioning import add_hierarchies

    n = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, n, 1)).astype(np.float32))
    cond = _cond(rng, n)
    m32 = CDM(contact_dim=1, time_emb_dim=64, arch=arch, arch_cfg=arch_cfg,
              use_scene_model=False)
    ch = add_hierarchies(m32, cond)
    t = jnp.zeros((B,), dtype=jnp.int32)
    v = m32.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                 x, t, ch, train=False)
    o32 = m32.apply(v, x, t, ch, train=False)
    obf = m32.clone(dtype=jnp.bfloat16).apply(v, x, t, ch, train=False)
    assert obf.dtype == jnp.float32
    rel = float(jnp.abs(o32 - obf).max() / (jnp.abs(o32).max() + 1e-8))
    assert rel < 0.12, rel


def test_dtype_knob_reaches_builders():
    from afford_motion_tpu.models.cdm import build_cdm
    from afford_motion_tpu.models.cmdm import build_cmdm
    from afford_motion_tpu.utils.config import load_config

    cfg = load_config(overrides=[
        "task=text_to_motion_contact_motion_gen", "model=cmdm",
        "model.dtype=bfloat16"])
    assert build_cmdm(cfg.model).dtype == jnp.bfloat16
    cfg = load_config(overrides=[
        "task=text_to_motion_contact_gen", "model=cdm", "model.dtype=float32"])
    assert build_cdm(cfg.model).dtype == jnp.float32
    # shipped default is the TPU recipe
    cfg = load_config(overrides=["task=text_to_motion_contact_gen", "model=cdm"])
    assert build_cdm(cfg.model).dtype == jnp.bfloat16


def test_gather_rows_bf16_fwd_exact_bwd_correct():
    from afford_motion_tpu.ops.pallas.gather import gather_rows

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 6)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 64, size=(2, 32, 8)).astype(np.int32))
    out = gather_rows(x, idx)
    ref = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    assert out.dtype == jnp.bfloat16
    assert jnp.array_equal(out, ref)
    # bwd: scatter-add with index collisions must match the XLA transpose
    g = jax.grad(lambda xx: (gather_rows(xx, idx).astype(jnp.float32) ** 2).sum())(x)
    gref = jax.grad(lambda xx: (jax.vmap(lambda a, b: jnp.take(a, b, axis=0))(
        xx, idx).astype(jnp.float32) ** 2).sum())(x)
    assert jnp.allclose(g.astype(jnp.float32), gref.astype(jnp.float32),
                        atol=1e-2, rtol=1e-2)
