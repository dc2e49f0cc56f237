"""Golden shape tests for the denoisers, mirroring the reference's smoke
blocks (reference: pointtransformer.py:293-317) at CPU-friendly sizes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afford_motion_tpu.models.cdm import CDM
from afford_motion_tpu.models.cmdm import CMDM
from afford_motion_tpu.models.layers import sinusoidal_table
from afford_motion_tpu.models.pointtransformer import (
    SEG_NSAMPLES,
    SEG_STRIDES,
    PointTransformerSeg,
    PointTransformerEnc,
)
from afford_motion_tpu.models.scene_map import (
    SCENEMAP_NSAMPLES,
    SCENEMAP_STRIDES,
    SceneMapEncoder,
    SceneMapEncoderDecoder,
)
from afford_motion_tpu.ops import build_point_hierarchy

B, N = 2, 1024


@pytest.fixture(scope="module")
def sm_levels():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    return xyz, build_point_hierarchy(xyz, SCENEMAP_STRIDES, SCENEMAP_NSAMPLES)


@pytest.fixture(scope="module")
def seg_levels():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    return xyz, build_point_hierarchy(xyz, SEG_STRIDES, SEG_NSAMPLES)


def test_sinusoidal_table_matches_reference_formula():
    pe = sinusoidal_table(16, 8)
    pos, i = 5, 2
    import math
    want_sin = math.sin(5 * math.exp(-(2 * i) * math.log(10000.0) / 8))
    np.testing.assert_allclose(pe[pos, 2 * i], want_sin, rtol=1e-5)
    assert pe.shape == (16, 8)


def test_scene_map_encoder_shapes(sm_levels):
    xyz, levels = sm_levels
    feats = jnp.ones((B, N, 6))
    model = SceneMapEncoder(planes=(32, 64, 128, 256), blocks=(2, 2, 2, 2))
    params = model.init(jax.random.PRNGKey(0), levels, feats)
    out = model.apply(params, levels, feats)
    assert out.shape == (B, N // 64, 256)


def test_scene_map_encoder_decoder_shapes(sm_levels):
    xyz, levels = sm_levels
    feats = jnp.ones((B, N, 6))
    model = SceneMapEncoderDecoder(planes=(32, 64, 128, 256), blocks=(2, 2, 2, 2))
    params = model.init(jax.random.PRNGKey(0), levels, feats)
    outs = model.apply(params, levels, feats)
    # coarsest-first multi-scale list (reference: modules.py:117-122)
    assert [o.shape for o in outs] == [
        (B, N // 64, 256), (B, N // 16, 128), (B, N // 4, 64), (B, N, 32),
    ]


def test_pointtransformer_seg_and_enc_shapes(seg_levels):
    xyz, levels = seg_levels
    feats = jnp.ones((B, N, 3))  # rgb
    seg = PointTransformerSeg(c=6)
    params = seg.init(jax.random.PRNGKey(0), levels, feats)
    out = seg.apply(params, levels, feats)
    assert out.shape == (B, N, 32)

    enc = PointTransformerEnc(c=6)
    params = enc.init(jax.random.PRNGKey(0), levels, feats)
    p5, x5 = enc.apply(params, levels, feats)
    assert p5.shape == (B, N // 256, 3) and x5.shape == (B, N // 256, 512)


def _perceiver_arch_cfg():
    return (
        ("point_pos_emb", True),
        ("encoder_q_input_channels", 128),
        ("encoder_kv_input_channels", 64),
        ("encoder_num_heads", 4),
        ("encoder_widening_factor", 1),
        ("encoder_dropout", 0.1),
        ("encoder_residual_dropout", 0.0),
        ("encoder_self_attn_num_layers", 2),
        ("decoder_q_input_channels", 64),
        ("decoder_kv_input_channels", 128),
        ("decoder_num_heads", 4),
        ("decoder_widening_factor", 1),
        ("decoder_dropout", 0.1),
        ("decoder_residual_dropout", 0.0),
    )


def _cdm_cond(rng, with_seg=False, with_pt=False, feat_dim=3):
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 64)).astype(np.float32)),
        "c_pc_xyz": xyz,
        "c_pc_feat": jnp.asarray(rng.normal(size=(B, N, feat_dim)).astype(np.float32)),
    }
    if with_seg:
        cond["levels_seg"] = build_point_hierarchy(xyz, SEG_STRIDES, SEG_NSAMPLES)
    if with_pt:
        cond["levels_pt"] = build_point_hierarchy(xyz, SCENEMAP_STRIDES, SCENEMAP_NSAMPLES)
    return cond


def test_cdm_perceiver_no_scene_model():
    rng = np.random.default_rng(2)
    model = CDM(
        contact_dim=6, time_emb_dim=32, text_feat_dim=64, point_feat_dim=0,
        use_scene_model=False, arch="Perceiver", arch_cfg=_perceiver_arch_cfg(),
        last_dim=64,
    )
    cond = _cdm_cond(rng)
    x = jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32))
    t = jnp.array([3, 7])
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(variables, x, t, cond)
    assert out.shape == (B, N, 6)


def test_cdm_perceiver_with_frozen_scene_model():
    rng = np.random.default_rng(3)
    model = CDM(
        contact_dim=6, time_emb_dim=32, text_feat_dim=64, point_feat_dim=32,
        use_scene_model=True, use_openscene=False, scene_in_dim=6,
        arch="Perceiver", arch_cfg=_perceiver_arch_cfg(), last_dim=64,
    )
    cond = _cdm_cond(rng, with_seg=True)
    x = jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32))
    t = jnp.array([3, 7])
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(variables, x, t, cond)
    assert out.shape == (B, N, 6)
    # scene model params exist but receive no gradient (stop_gradient)
    assert "scene_model" in variables["params"]

    def loss(params):
        return jnp.sum(
            model.apply({**variables, "params": params}, x, t, cond) ** 2
        )

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g["scene_model"])
    assert all(float(jnp.abs(l).sum()) == 0.0 for l in leaves)
    other = jax.tree_util.tree_leaves(
        {k: v for k, v in g.items() if k != "scene_model"}
    )
    assert any(float(jnp.abs(l).sum()) > 0 for l in other)


def test_cdm_mlp_backbone():
    rng = np.random.default_rng(4)
    model = CDM(
        contact_dim=6, time_emb_dim=32, text_feat_dim=64, point_feat_dim=0,
        use_scene_model=False, arch="MLP",
        arch_cfg=(("point_mlp_dims", (64, 64)), ("point_mlp_widening_factor", 1),
                  ("point_mlp_bias", True)),
        last_dim=64,
    )
    cond = _cdm_cond(rng)
    x = jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1, 2]), cond)
    out = model.apply(variables, x, jnp.array([1, 2]), cond)
    assert out.shape == (B, N, 6)


@pytest.mark.parametrize("arch", ["PointTrans", "PointTransV2"])
def test_cdm_pointtrans_backbones(arch):
    rng = np.random.default_rng(5)
    model = CDM(
        contact_dim=6, time_emb_dim=32, text_feat_dim=64, point_feat_dim=0,
        use_scene_model=False, arch=arch, arch_cfg=(("blocks", (2, 2, 2, 2)),),
        last_dim=64,
    )
    cond = _cdm_cond(rng, with_pt=True)
    x = jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1, 2]), cond)
    out = model.apply(variables, x, jnp.array([1, 2]), cond)
    assert out.shape == (B, N, 6)


def _cmdm_cond(rng, L=32):
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[0, L // 2:] = True
    return {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 64)).astype(np.float32)),
        "c_pc_xyz": xyz,
        "c_pc_contact": jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32)),
        "levels_sm": build_point_hierarchy(xyz, SCENEMAP_STRIDES, SCENEMAP_NSAMPLES),
        "x_mask": jnp.asarray(x_mask),
        "c_text_mask": jnp.zeros((B, 1), dtype=bool),
        "c_text_erase": jnp.zeros((B, 1), dtype=bool),
        "c_pc_mask": jnp.zeros((B, 1), dtype=bool),
        "c_pc_erase": jnp.zeros((B, 1), dtype=bool),
    }


@pytest.mark.parametrize("arch,num_layers", [("trans_enc", (1, 1)), ("trans_dec", (1, 1, 1))])
def test_cmdm_forward(arch, num_layers):
    rng = np.random.default_rng(6)
    L, D = 32, 66
    model = CMDM(
        motion_dim=D, latent_dim=64, time_emb_dim=64, text_feat_dim=64,
        contact_dim=6, planes=(16, 32, 64, 128), blocks=(2, 2, 2, 2),
        arch=arch, num_layers=num_layers, num_heads=4, dim_feedforward=128,
    )
    cond = _cmdm_cond(rng, L)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([10, 20])
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(variables, x, t, cond)
    assert out.shape == (B, L, D)

    # split path: encode once, denoise with the cached contact embedding
    cont = model.apply(variables, cond, method=CMDM.encode_contact)
    out2 = model.apply(variables, x, t, cond, cont, method=CMDM.denoise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_cmdm_cfg_erase_zeroes_condition():
    """c_text_erase=1 must blank the text embedding's influence."""
    rng = np.random.default_rng(7)
    L, D = 16, 66
    model = CMDM(
        motion_dim=D, latent_dim=64, time_emb_dim=64, text_feat_dim=64,
        contact_dim=6, planes=(16, 32, 64, 128), blocks=(2, 2, 2, 2),
        arch="trans_enc", num_layers=(1,), num_heads=4, dim_feedforward=128,
    )
    cond = _cmdm_cond(rng, L)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([5, 5])
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)

    cond_erased = dict(cond)
    cond_erased["c_text_erase"] = jnp.ones((B, 1), dtype=bool)
    cond_zero_text = dict(cond)
    cond_zero_text["text_emb"] = jnp.zeros_like(cond["text_emb"])

    out_erased = model.apply(variables, x, t, cond_erased)
    out_zeroed = model.apply(variables, x, t, cond_zero_text)
    np.testing.assert_allclose(
        np.asarray(out_erased), np.asarray(out_zeroed), rtol=1e-5, atol=1e-5
    )
