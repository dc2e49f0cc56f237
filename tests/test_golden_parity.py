"""Golden torch->flax forward-parity tests (VERDICT r1 item #3).

Instantiate the ACTUAL reference module classes (read-only import from
/root/reference via tests/ref_harness.py) with randomized weights AND
randomized BatchNorm running statistics, convert the real state_dict
through utils/torch_convert.py, and assert the flax forward output
matches the torch eval-mode forward. This proves checkpoint-level
conversion + frozen-BN eval semantics (reference: utils/training.py:111-116)
end to end — the closest stand-in for trained-weight parity in a box
without the released checkpoints.

Geometry note: both sides compute FPS/kNN with the same deterministic
rules (greedy start-at-0 FPS, exact kNN — see tests/ref_harness.py and
tests/test_pointops.py oracles), so neighbor sets agree and the remaining
delta is float accumulation order only.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_harness import Cfg, load_reference, randomize_module, state_dict_numpy
from afford_motion_tpu.utils.torch_convert import (
    convert_cdm_checkpoint,
    convert_cmdm_checkpoint,
    convert_pointtransformer_seg,
)

rng = np.random.default_rng(7)


def _rel_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_pointtransformer_seg_golden():
    """Full 5-level PT-Seg (enc+dec), the frozen scene backbone
    (reference: scene_models/pointtransformer.py:126-201)."""
    from afford_motion_tpu.models.pointtransformer import (
        SEG_NSAMPLES, SEG_STRIDES, PointTransformerSeg,
    )
    from afford_motion_tpu.ops import build_point_hierarchy

    ref = load_reference()
    model_t = ref.pointtransformer.pointtransformer_seg_repro(c=6)
    randomize_module(model_t, seed=11)
    model_t.eval()

    N = 4096  # every level >= nsample, matching the 8192-pt training regime
    p = rng.normal(size=(1, N, 3)).astype(np.float32)
    x = rng.normal(size=(1, N, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = model_t([torch.from_numpy(p), torch.from_numpy(x)]).numpy()

    converted = convert_pointtransformer_seg(state_dict_numpy(model_t))
    levels = build_point_hierarchy(jnp.asarray(p), SEG_STRIDES, SEG_NSAMPLES)
    out_j = np.asarray(
        PointTransformerSeg(c=6).apply(converted, levels, jnp.asarray(x))
    )

    assert out_j.shape == out_t.shape
    err = _rel_err(out_j, out_t)
    assert err < 2e-3, f"PT-Seg forward rel err {err}"


def _cmdm_cfg(arch: str) -> Cfg:
    return Cfg(
        data_repr="pos", input_feats=66, latent_dim=64, mask_motion=True,
        arch=arch, time_emb_dim=64, num_heads=4, dim_feedforward=128,
        dropout=0.1, num_layers=[1, 1] if arch == "trans_enc" else [1, 1, 1],
        contact_model=Cfg(contact_type="contact_cont_joints",
                          planes=[16, 32, 64, 128], blocks=[2, 2, 2, 2],
                          num_points=1024),
        text_model=Cfg(version="ViT-B/32", max_length=32),
    )


@pytest.mark.parametrize("arch", ["trans_enc", "trans_dec"])
def test_cmdm_golden(arch):
    """CMDM with the real SceneMapEncoder(Decoder) contact branch
    (reference: cmdm.py:14-200, modules.py:55-167). Text encoding is an
    external frozen model in both frameworks — patched to a shared
    embedding so the parity target is the network itself."""
    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.models.scene_map import SCENEMAP_NSAMPLES, SCENEMAP_STRIDES
    from afford_motion_tpu.ops import build_point_hierarchy

    ref = load_reference()
    nl = (1, 1) if arch == "trans_enc" else (1, 1, 1)
    model_t = ref.cmdm.CMDM(_cmdm_cfg(arch))
    randomize_module(model_t, seed=23)
    model_t.eval()

    B, N, L = 2, 1024, 8
    text_emb = rng.normal(size=(B, 512)).astype(np.float32)
    ref.cmdm.encode_text_clip = (
        lambda model, texts, max_length=32, device="cpu":
        torch.from_numpy(text_emb)
    )

    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    contact = rng.normal(size=(B, N, 6)).astype(np.float32)
    x = rng.normal(size=(B, L, 66)).astype(np.float32)
    t = np.array([3, 250], dtype=np.int64)
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[1, 6:] = True  # exercise key-padding masking

    with torch.no_grad():
        out_t = model_t(
            torch.from_numpy(x), torch.from_numpy(t),
            c_text=["a", "b"],
            c_pc_xyz=torch.from_numpy(xyz),
            c_pc_contact=torch.from_numpy(contact),
            x_mask=torch.from_numpy(x_mask),
        ).numpy()

    converted = convert_cmdm_checkpoint(
        state_dict_numpy(model_t), num_layers=nl, blocks=(2, 2, 2, 2), arch=arch
    )
    model_j = CMDM(
        motion_dim=66, latent_dim=64, time_emb_dim=64, text_feat_dim=512,
        contact_dim=6, planes=(16, 32, 64, 128), blocks=(2, 2, 2, 2),
        arch=arch, num_layers=nl, num_heads=4, dim_feedforward=128,
    )
    jxyz = jnp.asarray(xyz)
    cond = {
        "text_emb": jnp.asarray(text_emb[:, None, :]),
        "c_pc_xyz": jxyz,
        "c_pc_contact": jnp.asarray(contact),
        "levels_sm": build_point_hierarchy(jxyz, SCENEMAP_STRIDES, SCENEMAP_NSAMPLES),
        "x_mask": jnp.asarray(x_mask),
    }
    out_j = np.asarray(
        model_j.apply(converted, jnp.asarray(x), jnp.asarray(t), cond)
    )

    assert out_j.shape == out_t.shape
    # padded rows are garbage on both sides (attention NaN-free but
    # undefined content) — compare valid positions
    valid = ~x_mask
    err = _rel_err(out_j[valid], out_t[valid])
    assert err < 2e-3, f"CMDM {arch} forward rel err {err}"

    if arch == "trans_enc":
        # bf16 mixed-precision (the shipped train recipe): same converted
        # weights, activations in bf16 — must stay within precision noise
        # of the torch f32 reference
        out_bf16 = np.asarray(
            model_j.clone(dtype=jnp.bfloat16).apply(
                converted, jnp.asarray(x), jnp.asarray(t), cond
            )
        ).astype(np.float32)
        err16 = _rel_err(out_bf16[valid], out_t[valid])
        assert err16 < 0.05, f"CMDM bf16 forward rel err {err16}"

    # fused-qkv layout (one packed in_proj matmul — torch's native packing):
    # convert with fused_qkv=True, run the fused model, same outputs
    converted_f = convert_cmdm_checkpoint(
        state_dict_numpy(model_t), num_layers=nl, blocks=(2, 2, 2, 2),
        arch=arch, fused_qkv=True,
    )
    out_f = np.asarray(
        model_j.clone(fused_qkv=True).apply(
            converted_f, jnp.asarray(x), jnp.asarray(t), cond
        )
    )
    err_f = _rel_err(out_f[valid], out_t[valid])
    assert err_f < 2e-3, f"CMDM {arch} fused-qkv forward rel err {err_f}"


def _cdm_cfg(arch: str) -> Cfg:
    # MLP uses the openscene path (point_feat_dim=1): the reference's
    # ContactMLP.forward crashes with point_feat=None (cdm.py:79-85 reads
    # num_points before assignment — an upstream bug), so no-scene MLP
    # configs are unusable there and unreproducible here.
    scene = (Cfg(use_scene_model=False, use_openscene=False)
             if arch == "Perceiver"
             else Cfg(use_scene_model=True, use_openscene=True, point_feat_dim=1))
    cfg = Cfg(
        data_repr="contact_cont_joints", input_feats=6, time_emb_dim=64,
        arch=arch,
        text_model=Cfg(version="ViT-B/32", max_length=32),
        scene_model=scene,
    )
    if arch == "Perceiver":
        cfg["arch_perceiver"] = Cfg(
            point_pos_emb=True, last_dim=32,
            encoder_q_input_channels=64, encoder_kv_input_channels=32,
            encoder_num_heads=4, encoder_widening_factor=1,
            encoder_dropout=0.1, encoder_residual_dropout=0.0,
            encoder_self_attn_num_layers=2,
            decoder_q_input_channels=32, decoder_kv_input_channels=64,
            decoder_num_heads=4, decoder_widening_factor=1,
            decoder_dropout=0.1, decoder_residual_dropout=0.0,
        )
    else:
        cfg["arch_mlp"] = Cfg(
            point_mlp_dims=[64, 64], point_mlp_widening_factor=1,
            point_mlp_bias=True, last_dim=64,
        )
    return cfg


@pytest.mark.parametrize("arch", ["Perceiver", "MLP"])
def test_cdm_golden(arch):
    """CDM stage-1 denoiser, Perceiver + MLP archs
    (reference: cdm.py:92-289, 411-560)."""
    from afford_motion_tpu.models.cdm import CDM

    ref = load_reference()
    model_t = ref.cdm.CDM(_cdm_cfg(arch))
    randomize_module(model_t, seed=31)
    model_t.eval()

    B, N = 2, 128
    text_emb = rng.normal(size=(B, 512)).astype(np.float32)
    ref.cdm.encode_text_clip = (
        lambda model, texts, max_length=32, device="cpu":
        torch.from_numpy(text_emb)
    )

    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    x = rng.normal(size=(B, N, 6)).astype(np.float32)
    pc_feat = rng.normal(size=(B, N, 1)).astype(np.float32)
    t = np.array([0, 999], dtype=np.int64)

    with torch.no_grad():
        out_t = model_t(
            torch.from_numpy(x), torch.from_numpy(t),
            c_text=["a", "b"], c_pc_xyz=torch.from_numpy(xyz),
            c_pc_feat=torch.from_numpy(pc_feat),
        ).numpy()

    if arch == "Perceiver":
        converted = convert_cdm_checkpoint(state_dict_numpy(model_t),
                                           self_attn_layers=2)
        arch_cfg = (
            ("point_pos_emb", True),
            ("encoder_q_input_channels", 64), ("encoder_kv_input_channels", 32),
            ("encoder_num_heads", 4), ("encoder_widening_factor", 1),
            ("encoder_dropout", 0.1), ("encoder_residual_dropout", 0.0),
            ("encoder_self_attn_num_layers", 2),
            ("decoder_q_input_channels", 32), ("decoder_kv_input_channels", 64),
            ("decoder_num_heads", 4), ("decoder_widening_factor", 1),
            ("decoder_dropout", 0.1), ("decoder_residual_dropout", 0.0),
        )
        last_dim = 32
    else:
        converted = convert_cdm_checkpoint(state_dict_numpy(model_t),
                                           arch="MLP", mlp_layers=2)
        arch_cfg = (("point_mlp_dims", (64, 64)),
                    ("point_mlp_widening_factor", 1), ("point_mlp_bias", True))
        last_dim = 64

    if arch == "Perceiver":
        model_j = CDM(contact_dim=6, time_emb_dim=64, text_feat_dim=512,
                      point_feat_dim=0, use_scene_model=False, arch=arch,
                      arch_cfg=arch_cfg, last_dim=last_dim)
    else:
        model_j = CDM(contact_dim=6, time_emb_dim=64, text_feat_dim=512,
                      point_feat_dim=1, use_scene_model=True,
                      use_openscene=True, arch=arch,
                      arch_cfg=arch_cfg, last_dim=last_dim)
    cond = {
        "text_emb": jnp.asarray(text_emb[:, None, :]),
        "c_pc_xyz": jnp.asarray(xyz),
        "c_pc_feat": jnp.asarray(pc_feat) if arch == "MLP"
        else jnp.zeros((B, N, 3)),
    }
    out_j = np.asarray(
        model_j.apply(converted, jnp.asarray(x), jnp.asarray(t), cond)
    )

    assert out_j.shape == out_t.shape
    err = _rel_err(out_j, out_t)
    assert err < 1e-3, f"CDM {arch} forward rel err {err}"


@pytest.mark.parametrize("arch", ["PointTrans", "PointTransV2"])
def test_cdm_pointtrans_golden(arch):
    """CDM stage-1 denoiser, ContactPointTrans(V2) U-Net archs
    (reference: cdm.py:190-410) — completes golden conversion coverage of
    all four CDM backbones."""
    from afford_motion_tpu.models.cdm import (
        CDM, CDM_PT_NSAMPLES, CDM_PT_STRIDES,
    )
    from afford_motion_tpu.ops import build_point_hierarchy

    ref = load_reference()
    cfg = Cfg(
        data_repr="contact_cont_joints", input_feats=6, time_emb_dim=64,
        arch=arch,
        text_model=Cfg(version="ViT-B/32", max_length=32),
        scene_model=Cfg(use_scene_model=True, use_openscene=True,
                        point_feat_dim=1),
        arch_pointtrans=Cfg(num_points=1024, blocks=[2, 2, 2, 2],
                            last_dim=64),
    )
    model_t = ref.cdm.CDM(cfg)
    randomize_module(model_t, seed=41)
    model_t.eval()

    B, N = 2, 1024
    text_emb = rng.normal(size=(B, 512)).astype(np.float32)
    ref.cdm.encode_text_clip = (
        lambda model, texts, max_length=32, device="cpu":
        torch.from_numpy(text_emb)
    )

    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    x = rng.normal(size=(B, N, 6)).astype(np.float32)
    pc_feat = rng.normal(size=(B, N, 1)).astype(np.float32)
    t = np.array([7, 450], dtype=np.int64)

    with torch.no_grad():
        out_t = model_t(
            torch.from_numpy(x), torch.from_numpy(t),
            c_text=["a", "b"], c_pc_xyz=torch.from_numpy(xyz),
            c_pc_feat=torch.from_numpy(pc_feat),
        ).numpy()

    converted = convert_cdm_checkpoint(state_dict_numpy(model_t), arch=arch)
    model_j = CDM(
        contact_dim=6, time_emb_dim=64, text_feat_dim=512, point_feat_dim=1,
        use_scene_model=True, use_openscene=True, arch=arch,
        arch_cfg=(), last_dim=64,
    )
    jxyz = jnp.asarray(xyz)
    cond = {
        "text_emb": jnp.asarray(text_emb[:, None, :]),
        "c_pc_xyz": jxyz,
        "c_pc_feat": jnp.asarray(pc_feat),
        "levels_pt": build_point_hierarchy(jxyz, CDM_PT_STRIDES, CDM_PT_NSAMPLES),
    }
    out_j = np.asarray(
        model_j.apply(converted, jnp.asarray(x), jnp.asarray(t), cond)
    )

    assert out_j.shape == out_t.shape
    err = _rel_err(out_j, out_t)
    assert err < 2e-3, f"CDM {arch} forward rel err {err}"
