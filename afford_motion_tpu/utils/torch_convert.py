"""Torch checkpoint -> flax parameter converters.

Lets the reference's trained artifacts carry over without retraining
(SURVEY.md §5 checkpoint/resume parity):
- the frozen PointTransformer scene weights (POINTTRANS_C_N8192_E300/
  model.pth, reference: pointtransformer.py:203-213),
- CMDM / CDM training checkpoints (model{step:06d}.pt),
- (T2M evaluator + JointsToSMPLX converters live in eval/.)

All converters are pure key-mapping over numpy arrays; structural
compatibility is asserted against a freshly initialized flax tree.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np


# ------------------------------------------------------------ leaf helpers
def _dense(sd: Dict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd: Dict, prefix: str) -> Dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bn_params(sd: Dict, prefix: str) -> Dict:
    return {"BatchNorm_0": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def _bn_stats(sd: Dict, prefix: str) -> Dict:
    return {"BatchNorm_0": {
        "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]
    }}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k  # DDP prefix
        out[k] = v.detach().numpy().astype(np.float32) if hasattr(v, "detach") else np.asarray(v)
    return out


# --------------------------------------------------- point transformer mapping
def _pt_layer(sd: Dict, p: str) -> Tuple[Dict, Dict]:
    """PointTransformerLayer: torch linear_{q,k,v}, linear_p (Linear,BN,_,
    Linear), linear_w (BN,_,Linear,BN,_,Linear) -> flax Dense_0..6 +
    PointNorm_0..2 (reference: pointtransformer.py:16-23)."""
    params = {
        "Dense_0": _dense(sd, f"{p}.linear_q"),
        "Dense_1": _dense(sd, f"{p}.linear_k"),
        "Dense_2": _dense(sd, f"{p}.linear_v"),
        "Dense_3": _dense(sd, f"{p}.linear_p.0"),
        "PointNorm_0": _bn_params(sd, f"{p}.linear_p.1"),
        "Dense_4": _dense(sd, f"{p}.linear_p.3"),
        "PointNorm_1": _bn_params(sd, f"{p}.linear_w.0"),
        "Dense_5": _dense(sd, f"{p}.linear_w.2"),
        "PointNorm_2": _bn_params(sd, f"{p}.linear_w.3"),
        "Dense_6": _dense(sd, f"{p}.linear_w.5"),
    }
    stats = {
        "PointNorm_0": _bn_stats(sd, f"{p}.linear_p.1"),
        "PointNorm_1": _bn_stats(sd, f"{p}.linear_w.0"),
        "PointNorm_2": _bn_stats(sd, f"{p}.linear_w.3"),
    }
    return params, stats


def _pt_block(sd: Dict, p: str) -> Tuple[Dict, Dict]:
    """(reference: pointtransformer.py:102-123)."""
    lp, ls = _pt_layer(sd, f"{p}.transformer2")
    params = {
        "Dense_0": _dense(sd, f"{p}.linear1", bias=False),
        "PointNorm_0": _bn_params(sd, f"{p}.bn1"),
        "PointTransformerLayer_0": lp,
        "PointNorm_1": _bn_params(sd, f"{p}.bn2"),
        "Dense_1": _dense(sd, f"{p}.linear3", bias=False),
        "PointNorm_2": _bn_params(sd, f"{p}.bn3"),
    }
    stats = {
        "PointNorm_0": _bn_stats(sd, f"{p}.bn1"),
        "PointTransformerLayer_0": ls,
        "PointNorm_1": _bn_stats(sd, f"{p}.bn2"),
        "PointNorm_2": _bn_stats(sd, f"{p}.bn3"),
    }
    return params, stats


def _transition_down(sd: Dict, p: str) -> Tuple[Dict, Dict]:
    params = {"Dense_0": _dense(sd, f"{p}.linear", bias=False),
              "PointNorm_0": _bn_params(sd, f"{p}.bn")}
    stats = {"PointNorm_0": _bn_stats(sd, f"{p}.bn")}
    return params, stats


def _transition_up(sd: Dict, p: str, is_head: bool) -> Tuple[Dict, Dict]:
    """Head: Dense_0 = linear2.0, Dense_1 = linear1.0, PointNorm_0 =
    linear1.1; non-head: Dense_0 = linear1.0, PointNorm_0 = linear1.1,
    Dense_1 = linear2.0, PointNorm_1 = linear2.1
    (reference: pointtransformer.py:72-99)."""
    if is_head:
        params = {
            "Dense_0": _dense(sd, f"{p}.linear2.0"),
            "Dense_1": _dense(sd, f"{p}.linear1.0"),
            "PointNorm_0": _bn_params(sd, f"{p}.linear1.1"),
        }
        stats = {"PointNorm_0": _bn_stats(sd, f"{p}.linear1.1")}
    else:
        params = {
            "Dense_0": _dense(sd, f"{p}.linear1.0"),
            "PointNorm_0": _bn_params(sd, f"{p}.linear1.1"),
            "Dense_1": _dense(sd, f"{p}.linear2.0"),
            "PointNorm_1": _bn_params(sd, f"{p}.linear2.1"),
        }
        stats = {
            "PointNorm_0": _bn_stats(sd, f"{p}.linear1.1"),
            "PointNorm_1": _bn_stats(sd, f"{p}.linear2.1"),
        }
    return params, stats


def convert_point_encoder(sd: Dict, blocks: Sequence[int], torch_prefix: str = "") -> Tuple[Dict, Dict]:
    """torch enc{k}.{j} -> flax PointEncoderStage_{k-1} tree."""
    params, stats = {}, {}
    for k, nblocks in enumerate(blocks, start=1):
        sp, ss = {}, {}
        td_p, td_s = _transition_down(sd, f"{torch_prefix}enc{k}.0")
        sp["TransitionDown_0"], ss["TransitionDown_0"] = td_p, td_s
        for j in range(1, nblocks):
            bp, bs = _pt_block(sd, f"{torch_prefix}enc{k}.{j}")
            sp[f"PointTransformerBlock_{j-1}"] = bp
            ss[f"PointTransformerBlock_{j-1}"] = bs
        params[f"PointEncoderStage_{k-1}"] = sp
        stats[f"PointEncoderStage_{k-1}"] = ss
    return params, stats


def convert_point_decoder(sd: Dict, n_levels: int, torch_prefix: str = "") -> Tuple[Dict, Dict]:
    """torch dec{k}.{0,1} -> flax PointDecoderStage_{n_levels-k} (stage 0 is
    the head at the coarsest level)."""
    params, stats = {}, {}
    for k in range(n_levels, 0, -1):
        stage = n_levels - k
        is_head = stage == 0
        tu_p, tu_s = _transition_up(sd, f"{torch_prefix}dec{k}.0", is_head)
        bp, bs = _pt_block(sd, f"{torch_prefix}dec{k}.1")
        params[f"PointDecoderStage_{stage}"] = {
            "TransitionUp_0": tu_p, "PointTransformerBlock_0": bp,
        }
        stats[f"PointDecoderStage_{stage}"] = {
            "TransitionUp_0": tu_s, "PointTransformerBlock_0": bs,
        }
    return params, stats


def convert_pointtransformer_seg(path_or_sd, blocks: Sequence[int] = (2, 3, 4, 6, 3)):
    """POINTTRANS_C_N8192_E300/model.pth -> flax PointTransformerSeg
    variables {'params', 'batch_stats'} (reference loader filters enc/dec
    keys, pointtransformer.py:203-213)."""
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_torch_state_dict(path_or_sd)
    enc_p, enc_s = convert_point_encoder(sd, blocks)
    dec_p, dec_s = convert_point_decoder(sd, len(blocks))
    return {
        "params": {"enc": enc_p, "dec": dec_p},
        "batch_stats": {"enc": enc_s, "dec": dec_s},
    }


def convert_scenemap_encoder(sd: Dict, blocks: Sequence[int] = (2, 2, 2, 2),
                             torch_prefix: str = "", with_decoder: bool = False):
    """SceneMapEncoder(Decoder) inside CMDM checkpoints."""
    enc_p, enc_s = convert_point_encoder(sd, blocks, torch_prefix)
    params: Dict[str, Any] = {"enc": enc_p}
    stats: Dict[str, Any] = {"enc": enc_s}
    if with_decoder:
        dec_p, dec_s = convert_point_decoder(sd, len(blocks), torch_prefix)
        params["dec"], stats["dec"] = dec_p, dec_s
    return params, stats


# ------------------------------------------------------- transformer mapping
def _torch_mha(sd: Dict, p: str, fused: bool = False,
               fused_kv: bool = False) -> Dict:
    """torch nn.MultiheadAttention packed qkv -> TorchMultiHeadAttention.

    ``fused``: keep torch's packed in_proj as ONE Dense (the model's
    fused_qkv=True layout — a direct copy). ``fused_kv``: q separate,
    k+v packed (cross-attention where key is value)."""
    w = sd[f"{p}.in_proj_weight"]
    b = sd[f"{p}.in_proj_bias"]
    d = w.shape[1]
    if fused:
        return {
            "Dense_0": {"kernel": w.T, "bias": b},
            "Dense_1": _dense(sd, f"{p}.out_proj"),
        }
    if fused_kv:
        return {
            "Dense_0": {"kernel": w[:d].T, "bias": b[:d]},
            "Dense_1": {"kernel": w[d:].T, "bias": b[d:]},
            "Dense_2": _dense(sd, f"{p}.out_proj"),
        }
    return {
        "Dense_0": {"kernel": w[:d].T, "bias": b[:d]},
        "Dense_1": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "Dense_2": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "Dense_3": _dense(sd, f"{p}.out_proj"),
    }


def convert_torch_encoder_layer(sd: Dict, p: str, fused_qkv: bool = False) -> Dict:
    """torch nn.TransformerEncoderLayer -> flax TransformerEncoderLayer."""
    return {
        "TorchMultiHeadAttention_0": _torch_mha(sd, f"{p}.self_attn",
                                                fused=fused_qkv),
        "LayerNorm_0": _layernorm(sd, f"{p}.norm1"),
        "Dense_0": _dense(sd, f"{p}.linear1"),
        "Dense_1": _dense(sd, f"{p}.linear2"),
        "LayerNorm_1": _layernorm(sd, f"{p}.norm2"),
    }


def convert_torch_encoder(sd: Dict, p: str, num_layers: int,
                          fused_qkv: bool = False) -> Dict:
    return {
        f"TransformerEncoderLayer_{i}": convert_torch_encoder_layer(
            sd, f"{p}.layers.{i}", fused_qkv
        )
        for i in range(num_layers)
    }


def convert_torch_decoder_layer(sd: Dict, p: str,
                                fused_qkv: bool = False) -> Dict:
    """torch nn.TransformerDecoderLayer -> flax TransformerDecoderLayer."""
    return {
        "TorchMultiHeadAttention_0": _torch_mha(sd, f"{p}.self_attn",
                                                fused=fused_qkv),
        "LayerNorm_0": _layernorm(sd, f"{p}.norm1"),
        # cross-attn: key is value (memory) -> q separate, packed kv
        "TorchMultiHeadAttention_1": _torch_mha(sd, f"{p}.multihead_attn",
                                                fused_kv=fused_qkv),
        "LayerNorm_1": _layernorm(sd, f"{p}.norm2"),
        "Dense_0": _dense(sd, f"{p}.linear1"),
        "Dense_1": _dense(sd, f"{p}.linear2"),
        "LayerNorm_2": _layernorm(sd, f"{p}.norm3"),
    }


# ----------------------------------------------------------------- CMDM
def convert_cmdm_checkpoint(path_or_sd, *, num_layers: Sequence[int] = (1, 1, 1, 1, 1),
                            blocks: Sequence[int] = (2, 2, 2, 2), arch: str = "trans_enc",
                            fused_qkv: bool = False):
    """Reference CMDM model{step}.pt -> flax CMDM variables (trans_enc and
    trans_dec). Frozen CLIP/BERT weights are absent from the reference
    checkpoint (stripped at save, training.py:92-106) and not needed
    (text is pre-encoded here)."""
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_torch_state_dict(path_or_sd)
    params = {
        "timestep_embedder": {
            "Dense_0": _dense(sd, "timestep_embedder.time_embed.0"),
            "Dense_1": _dense(sd, "timestep_embedder.time_embed.2"),
        },
        "language_adapter": _dense(sd, "language_adapter"),
        "motion_adapter": _dense(sd, "motion_adapter"),
        "motion_layer": _dense(sd, "motion_layer"),
    }
    if arch == "trans_enc":
        sm_p, sm_s = convert_scenemap_encoder(sd, blocks, "contact_encoder.", with_decoder=False)
        params["contact_encoder"] = sm_p
        params["contact_adapter"] = _dense(sd, "contact_adapter")
        params["self_attn_layer"] = convert_torch_encoder(
            sd, "self_attn_layer", sum(num_layers), fused_qkv
        )
    elif arch == "trans_dec":
        sm_p, sm_s = convert_scenemap_encoder(sd, blocks, "contact_encoder.", with_decoder=True)
        params["contact_encoder"] = sm_p
        for i, n in enumerate(num_layers):
            params[f"self_attn_layers_{i}"] = convert_torch_encoder(
                sd, f"self_attn_layers.{i}", n, fused_qkv
            )
        for i in range(len(num_layers) - 1):
            params[f"kv_mapping_layers_{i}"] = {
                "Dense_0": _dense(sd, f"kv_mappling_layers.{i}.0"),
                "LayerNorm_0": _layernorm(sd, f"kv_mappling_layers.{i}.1"),
            }
            params[f"cross_attn_layers_{i}"] = convert_torch_decoder_layer(
                sd, f"cross_attn_layers.{i}", fused_qkv
            )
    else:
        raise NotImplementedError(arch)
    return {"params": params, "batch_stats": {"contact_encoder": sm_s}}


# ------------------------------------------------------------------ CDM
def _perceiver_cross_layer(sd: Dict, p: str) -> Dict:
    """krasserm CrossAttentionLayer: Sequential(Residual(CrossAttention),
    Residual(MLP)) -> flax CrossAttentionLayer (LayerNorm_0/1 + PerceiverMHA_0
    + PerceiverMLP_0)."""
    return {
        "LayerNorm_0": _layernorm(sd, f"{p}.0.module.q_norm"),
        "LayerNorm_1": _layernorm(sd, f"{p}.0.module.kv_norm"),
        "PerceiverMHA_0": {
            "Dense_0": _dense(sd, f"{p}.0.module.attention.q_proj"),
            "Dense_1": _dense(sd, f"{p}.0.module.attention.k_proj"),
            "Dense_2": _dense(sd, f"{p}.0.module.attention.v_proj"),
            "Dense_3": _dense(sd, f"{p}.0.module.attention.o_proj"),
        },
        "PerceiverMLP_0": {
            "LayerNorm_0": _layernorm(sd, f"{p}.1.module.0"),
            "Dense_0": _dense(sd, f"{p}.1.module.1"),
            "Dense_1": _dense(sd, f"{p}.1.module.3"),
        },
    }


def _perceiver_self_layer(sd: Dict, p: str) -> Dict:
    return {
        "LayerNorm_0": _layernorm(sd, f"{p}.0.module.norm"),
        "PerceiverMHA_0": {
            "Dense_0": _dense(sd, f"{p}.0.module.attention.q_proj"),
            "Dense_1": _dense(sd, f"{p}.0.module.attention.k_proj"),
            "Dense_2": _dense(sd, f"{p}.0.module.attention.v_proj"),
            "Dense_3": _dense(sd, f"{p}.0.module.attention.o_proj"),
        },
        "PerceiverMLP_0": {
            "LayerNorm_0": _layernorm(sd, f"{p}.1.module.0"),
            "Dense_0": _dense(sd, f"{p}.1.module.1"),
            "Dense_1": _dense(sd, f"{p}.1.module.3"),
        },
    }


def _contact_mlp(sd: Dict, n_layers: int) -> Dict:
    """ContactMLP: Sequential of PointSceneMLPs (reference: cdm.py:13-85)."""
    out = {}
    for i in range(n_layers):
        p = f"contact_model.point_mlp.{i}"
        out[f"PointSceneMLP_{i}"] = {
            "LayerNorm_0": _layernorm(sd, f"{p}.mlp_pre.0"),
            "Dense_0": _dense(sd, f"{p}.mlp_pre.1"),
            "Dense_1": _dense(sd, f"{p}.mlp_pre.3"),
            "LayerNorm_1": _layernorm(sd, f"{p}.mlp_post.0"),
            "Dense_2": _dense(sd, f"{p}.mlp_post.1"),
            "Dense_3": _dense(sd, f"{p}.mlp_post.3"),
        }
    return out


def _contact_pointtrans(sd: Dict, blocks: Sequence[int], v2: bool):
    """ContactPointTrans(V2) inside a CDM checkpoint -> the flax
    ContactPointTrans compact-module tree (reference: models/cdm.py:190-410).
    Reuses the shared PT stage converters; ctx MLPs map in creation order
    (v1: one bottleneck ctx; v2: ctx4/ctx3/ctx2 -> _CtxMLP_0..2) and the
    v2 bottleneck self-attention maps to TransformerEncoder_0."""
    p = "contact_model"
    params, stats = {}, {}
    enc_p, enc_s = convert_point_encoder(sd, blocks, f"{p}.")
    params.update(enc_p)
    stats.update(enc_s)
    dec_p, dec_s = convert_point_decoder(sd, len(blocks), f"{p}.")
    params.update(dec_p)
    stats.update(dec_s)

    def ctx(torch_name):
        return (
            {
                "Dense_0": _dense(sd, f"{p}.{torch_name}.0"),
                "PointNorm_0": _bn_params(sd, f"{p}.{torch_name}.1"),
                "Dense_1": _dense(sd, f"{p}.{torch_name}.3"),
            },
            {"PointNorm_0": _bn_stats(sd, f"{p}.{torch_name}.1")},
        )

    if v2:
        for i, name in enumerate(("ctx4", "ctx3", "ctx2")):
            params[f"_CtxMLP_{i}"], stats[f"_CtxMLP_{i}"] = ctx(name)
        params["TransformerEncoder_0"] = convert_torch_encoder(
            sd, f"{p}.self_attn_layers", 1
        )
    else:
        params["_CtxMLP_0"], stats["_CtxMLP_0"] = ctx("ctx")
    return params, stats


def convert_cdm_checkpoint(path_or_sd, *, self_attn_layers: int = 2,
                           arch: str = "Perceiver", mlp_layers: int = 2,
                           pt_blocks: Sequence[int] = (2, 2, 2, 2)):
    """Reference CDM model{step}.pt (any of the 4 archs) -> flax CDM
    variables. Frozen CLIP + scene-model weights are stripped from the
    reference checkpoint; the published t2m config uses
    use_scene_model=False."""
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_torch_state_dict(path_or_sd)
    if arch == "MLP":
        params = {
            "timestep_embedder": {
                "Dense_0": _dense(sd, "timestep_embedder.time_embed.0"),
                "Dense_1": _dense(sd, "timestep_embedder.time_embed.2"),
            },
            "contact_model": _contact_mlp(sd, mlp_layers),
            "contact_layer": _dense(sd, "contact_layer"),
        }
        return {"params": params, "batch_stats": {}}
    if arch in ("PointTrans", "PointTransV2"):
        cm_p, cm_s = _contact_pointtrans(sd, pt_blocks, v2=arch == "PointTransV2")
        params = {
            "timestep_embedder": {
                "Dense_0": _dense(sd, "timestep_embedder.time_embed.0"),
                "Dense_1": _dense(sd, "timestep_embedder.time_embed.2"),
            },
            "contact_model": cm_p,
            "contact_layer": _dense(sd, "contact_layer"),
        }
        return {"params": params, "batch_stats": {"contact_model": cm_s}}
    assert arch == "Perceiver", f"unknown CDM arch {arch}"
    cm = "contact_model"
    contact_model = {
        "Dense_0": _dense(sd, f"{cm}.encoder_adapter"),
        "Dense_1": _dense(sd, f"{cm}.language_adapter"),
        "Dense_2": _dense(sd, f"{cm}.time_embedding_adapter"),
        "CrossAttentionLayer_0": _perceiver_cross_layer(sd, f"{cm}.encoder_cross_attn"),
        "SelfAttentionBlock_0": {
            f"SelfAttentionLayer_{i}": _perceiver_self_layer(sd, f"{cm}.encoder_self_attn.{i}")
            for i in range(self_attn_layers)
        },
        "Dense_3": _dense(sd, f"{cm}.decoder_adapter"),
        "CrossAttentionLayer_1": _perceiver_cross_layer(sd, f"{cm}.decoder_cross_attn"),
    }
    params = {
        "timestep_embedder": {
            "Dense_0": _dense(sd, "timestep_embedder.time_embed.0"),
            "Dense_1": _dense(sd, "timestep_embedder.time_embed.2"),
        },
        "contact_model": contact_model,
        "contact_layer": _dense(sd, "contact_layer"),
    }
    return {"params": params, "batch_stats": {}}


# ------------------------------------------------------------- validation
def assert_tree_compatible(converted: Any, reference: Any, path: str = "") -> None:
    """Every leaf in `reference` must exist in `converted` with equal shape."""
    import jax

    ref_flat = jax.tree_util.tree_leaves_with_path(reference)
    conv = converted

    def get(tree, keypath):
        node = tree
        for k in keypath:
            key = getattr(k, "key", None)
            node = node[key]
        return node

    for keypath, leaf in ref_flat:
        try:
            c = get(conv, keypath)
        except (KeyError, TypeError) as e:
            raise KeyError(f"missing converted leaf at {jax.tree_util.keystr(keypath)}") from e
        if tuple(np.shape(c)) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(keypath)}: "
                f"{np.shape(c)} vs {np.shape(leaf)}"
            )


# ===================================================================== export
# Reverse direction: flax variables -> reference-layout torch state_dict,
# so models TRAINED HERE can be loaded by the reference's own load_ckpt
# (reference: utils/training.py:342-383) and evaluated in its environment
# (e.g. the offline MDM-protocol GPU eval). Exact inverses of the convert_*
# maps above; round-trip tested in tests/test_torch_convert.py.

def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _inv_dense(out: Dict, prefix: str, tree: Dict) -> None:
    out[f"{prefix}.weight"] = _np(tree["kernel"]).T
    if "bias" in tree:
        out[f"{prefix}.bias"] = _np(tree["bias"])


def _inv_layernorm(out: Dict, prefix: str, tree: Dict) -> None:
    out[f"{prefix}.weight"] = _np(tree["scale"])
    out[f"{prefix}.bias"] = _np(tree["bias"])


def _inv_bn(out: Dict, prefix: str, params: Dict, stats: Dict) -> None:
    bn_p, bn_s = params["BatchNorm_0"], stats["BatchNorm_0"]
    out[f"{prefix}.weight"] = _np(bn_p["scale"])
    out[f"{prefix}.bias"] = _np(bn_p["bias"])
    out[f"{prefix}.running_mean"] = _np(bn_s["mean"])
    out[f"{prefix}.running_var"] = _np(bn_s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _inv_torch_mha(out: Dict, p: str, tree: Dict, fused: bool = False,
                   fused_kv: bool = False) -> None:
    if fused:
        out[f"{p}.in_proj_weight"] = _np(tree["Dense_0"]["kernel"]).T
        out[f"{p}.in_proj_bias"] = _np(tree["Dense_0"]["bias"])
        _inv_dense(out, f"{p}.out_proj", tree["Dense_1"])
        return
    if fused_kv:
        out[f"{p}.in_proj_weight"] = np.concatenate(
            [_np(tree["Dense_0"]["kernel"]).T, _np(tree["Dense_1"]["kernel"]).T]
        )
        out[f"{p}.in_proj_bias"] = np.concatenate(
            [_np(tree["Dense_0"]["bias"]), _np(tree["Dense_1"]["bias"])]
        )
        _inv_dense(out, f"{p}.out_proj", tree["Dense_2"])
        return
    out[f"{p}.in_proj_weight"] = np.concatenate(
        [_np(tree[f"Dense_{i}"]["kernel"]).T for i in range(3)]
    )
    out[f"{p}.in_proj_bias"] = np.concatenate(
        [_np(tree[f"Dense_{i}"]["bias"]) for i in range(3)]
    )
    _inv_dense(out, f"{p}.out_proj", tree["Dense_3"])


def _inv_encoder_layer(out: Dict, p: str, tree: Dict,
                       fused_qkv: bool = False) -> None:
    _inv_torch_mha(out, f"{p}.self_attn", tree["TorchMultiHeadAttention_0"],
                   fused=fused_qkv)
    _inv_layernorm(out, f"{p}.norm1", tree["LayerNorm_0"])
    _inv_dense(out, f"{p}.linear1", tree["Dense_0"])
    _inv_dense(out, f"{p}.linear2", tree["Dense_1"])
    _inv_layernorm(out, f"{p}.norm2", tree["LayerNorm_1"])


def _inv_encoder(out: Dict, p: str, tree: Dict, num_layers: int,
                 fused_qkv: bool = False) -> None:
    for i in range(num_layers):
        _inv_encoder_layer(out, f"{p}.layers.{i}",
                           tree[f"TransformerEncoderLayer_{i}"], fused_qkv)


def _inv_decoder_layer(out: Dict, p: str, tree: Dict,
                       fused_qkv: bool = False) -> None:
    _inv_torch_mha(out, f"{p}.self_attn", tree["TorchMultiHeadAttention_0"],
                   fused=fused_qkv)
    _inv_layernorm(out, f"{p}.norm1", tree["LayerNorm_0"])
    _inv_torch_mha(out, f"{p}.multihead_attn", tree["TorchMultiHeadAttention_1"],
                   fused_kv=fused_qkv)
    _inv_layernorm(out, f"{p}.norm2", tree["LayerNorm_1"])
    _inv_dense(out, f"{p}.linear1", tree["Dense_0"])
    _inv_dense(out, f"{p}.linear2", tree["Dense_1"])
    _inv_layernorm(out, f"{p}.norm3", tree["LayerNorm_2"])


def _inv_pt_layer(out: Dict, p: str, params: Dict, stats: Dict) -> None:
    _inv_dense(out, f"{p}.linear_q", params["Dense_0"])
    _inv_dense(out, f"{p}.linear_k", params["Dense_1"])
    _inv_dense(out, f"{p}.linear_v", params["Dense_2"])
    _inv_dense(out, f"{p}.linear_p.0", params["Dense_3"])
    _inv_bn(out, f"{p}.linear_p.1", params["PointNorm_0"], stats["PointNorm_0"])
    _inv_dense(out, f"{p}.linear_p.3", params["Dense_4"])
    _inv_bn(out, f"{p}.linear_w.0", params["PointNorm_1"], stats["PointNorm_1"])
    _inv_dense(out, f"{p}.linear_w.2", params["Dense_5"])
    _inv_bn(out, f"{p}.linear_w.3", params["PointNorm_2"], stats["PointNorm_2"])
    _inv_dense(out, f"{p}.linear_w.5", params["Dense_6"])


def _inv_pt_block(out: Dict, p: str, params: Dict, stats: Dict) -> None:
    _inv_dense(out, f"{p}.linear1", params["Dense_0"])
    _inv_bn(out, f"{p}.bn1", params["PointNorm_0"], stats["PointNorm_0"])
    _inv_pt_layer(out, f"{p}.transformer2", params["PointTransformerLayer_0"],
                  stats["PointTransformerLayer_0"])
    _inv_bn(out, f"{p}.bn2", params["PointNorm_1"], stats["PointNorm_1"])
    _inv_dense(out, f"{p}.linear3", params["Dense_1"])
    _inv_bn(out, f"{p}.bn3", params["PointNorm_2"], stats["PointNorm_2"])


def _inv_transition_down(out: Dict, p: str, params: Dict, stats: Dict) -> None:
    _inv_dense(out, f"{p}.linear", params["Dense_0"])
    _inv_bn(out, f"{p}.bn", params["PointNorm_0"], stats["PointNorm_0"])


def _inv_transition_up(out: Dict, p: str, params: Dict, stats: Dict,
                       is_head: bool) -> None:
    if is_head:
        _inv_dense(out, f"{p}.linear2.0", params["Dense_0"])
        _inv_dense(out, f"{p}.linear1.0", params["Dense_1"])
        _inv_bn(out, f"{p}.linear1.1", params["PointNorm_0"], stats["PointNorm_0"])
        return
    _inv_dense(out, f"{p}.linear1.0", params["Dense_0"])
    _inv_bn(out, f"{p}.linear1.1", params["PointNorm_0"], stats["PointNorm_0"])
    _inv_dense(out, f"{p}.linear2.0", params["Dense_1"])
    _inv_bn(out, f"{p}.linear2.1", params["PointNorm_1"], stats["PointNorm_1"])


def _inv_point_encoder(out: Dict, params: Dict, stats: Dict,
                       blocks: Sequence[int], torch_prefix: str = "") -> None:
    for k, nblocks in enumerate(blocks, start=1):
        sp = params[f"PointEncoderStage_{k-1}"]
        ss = stats[f"PointEncoderStage_{k-1}"]
        _inv_transition_down(out, f"{torch_prefix}enc{k}.0",
                             sp["TransitionDown_0"], ss["TransitionDown_0"])
        for j in range(1, nblocks):
            _inv_pt_block(out, f"{torch_prefix}enc{k}.{j}",
                          sp[f"PointTransformerBlock_{j-1}"],
                          ss[f"PointTransformerBlock_{j-1}"])


def _inv_point_decoder(out: Dict, params: Dict, stats: Dict, n_levels: int,
                       torch_prefix: str = "") -> None:
    for k in range(n_levels, 0, -1):
        stage = n_levels - k
        sp = params[f"PointDecoderStage_{stage}"]
        ss = stats[f"PointDecoderStage_{stage}"]
        _inv_transition_up(out, f"{torch_prefix}dec{k}.0",
                           sp["TransitionUp_0"], ss["TransitionUp_0"],
                           is_head=stage == 0)
        _inv_pt_block(out, f"{torch_prefix}dec{k}.1",
                      sp["PointTransformerBlock_0"], ss["PointTransformerBlock_0"])


def _inv_timestep_embedder(out: Dict, tree: Dict) -> None:
    _inv_dense(out, "timestep_embedder.time_embed.0", tree["Dense_0"])
    _inv_dense(out, "timestep_embedder.time_embed.2", tree["Dense_1"])


def export_cmdm_checkpoint(variables: Dict, *,
                           num_layers: Sequence[int] = (1, 1, 1, 1, 1),
                           blocks: Sequence[int] = (2, 2, 2, 2),
                           arch: str = "trans_enc",
                           fused_qkv: bool = False) -> Dict[str, np.ndarray]:
    """flax CMDM variables -> reference CMDM state_dict (inverse of
    convert_cmdm_checkpoint). Frozen CLIP/BERT weights are not included,
    matching what the reference strips at save (training.py:92-106)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    _inv_timestep_embedder(out, params["timestep_embedder"])
    _inv_dense(out, "language_adapter", params["language_adapter"])
    _inv_dense(out, "motion_adapter", params["motion_adapter"])
    _inv_dense(out, "motion_layer", params["motion_layer"])
    sm_p = params["contact_encoder"]
    sm_s = stats["contact_encoder"]
    if arch == "trans_enc":
        _inv_point_encoder(out, sm_p["enc"], sm_s["enc"], blocks,
                           "contact_encoder.")
        _inv_dense(out, "contact_adapter", params["contact_adapter"])
        _inv_encoder(out, "self_attn_layer", params["self_attn_layer"],
                     sum(num_layers), fused_qkv)
    elif arch == "trans_dec":
        _inv_point_encoder(out, sm_p["enc"], sm_s["enc"], blocks,
                           "contact_encoder.")
        _inv_point_decoder(out, sm_p["dec"], sm_s["dec"], len(blocks),
                           "contact_encoder.")
        for i, n in enumerate(num_layers):
            _inv_encoder(out, f"self_attn_layers.{i}",
                         params[f"self_attn_layers_{i}"], n, fused_qkv)
        for i in range(len(num_layers) - 1):
            kv = params[f"kv_mapping_layers_{i}"]
            _inv_dense(out, f"kv_mappling_layers.{i}.0", kv["Dense_0"])
            _inv_layernorm(out, f"kv_mappling_layers.{i}.1", kv["LayerNorm_0"])
            _inv_decoder_layer(out, f"cross_attn_layers.{i}",
                               params[f"cross_attn_layers_{i}"], fused_qkv)
    else:
        raise NotImplementedError(arch)
    return out


def _inv_perceiver_cross_layer(out: Dict, p: str, tree: Dict) -> None:
    _inv_layernorm(out, f"{p}.0.module.q_norm", tree["LayerNorm_0"])
    _inv_layernorm(out, f"{p}.0.module.kv_norm", tree["LayerNorm_1"])
    mha = tree["PerceiverMHA_0"]
    _inv_dense(out, f"{p}.0.module.attention.q_proj", mha["Dense_0"])
    _inv_dense(out, f"{p}.0.module.attention.k_proj", mha["Dense_1"])
    _inv_dense(out, f"{p}.0.module.attention.v_proj", mha["Dense_2"])
    _inv_dense(out, f"{p}.0.module.attention.o_proj", mha["Dense_3"])
    mlp = tree["PerceiverMLP_0"]
    _inv_layernorm(out, f"{p}.1.module.0", mlp["LayerNorm_0"])
    _inv_dense(out, f"{p}.1.module.1", mlp["Dense_0"])
    _inv_dense(out, f"{p}.1.module.3", mlp["Dense_1"])


def _inv_perceiver_self_layer(out: Dict, p: str, tree: Dict) -> None:
    _inv_layernorm(out, f"{p}.0.module.norm", tree["LayerNorm_0"])
    mha = tree["PerceiverMHA_0"]
    _inv_dense(out, f"{p}.0.module.attention.q_proj", mha["Dense_0"])
    _inv_dense(out, f"{p}.0.module.attention.k_proj", mha["Dense_1"])
    _inv_dense(out, f"{p}.0.module.attention.v_proj", mha["Dense_2"])
    _inv_dense(out, f"{p}.0.module.attention.o_proj", mha["Dense_3"])
    mlp = tree["PerceiverMLP_0"]
    _inv_layernorm(out, f"{p}.1.module.0", mlp["LayerNorm_0"])
    _inv_dense(out, f"{p}.1.module.1", mlp["Dense_0"])
    _inv_dense(out, f"{p}.1.module.3", mlp["Dense_1"])


def export_cdm_checkpoint(variables: Dict, *, self_attn_layers: int = 2,
                          arch: str = "Perceiver", mlp_layers: int = 2,
                          pt_blocks: Sequence[int] = (2, 2, 2, 2)
                          ) -> Dict[str, np.ndarray]:
    """flax CDM variables (any of the 4 archs) -> reference CDM state_dict
    (inverse of convert_cdm_checkpoint)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    _inv_timestep_embedder(out, params["timestep_embedder"])
    _inv_dense(out, "contact_layer", params["contact_layer"])
    cm = params["contact_model"]
    if arch == "MLP":
        for i in range(mlp_layers):
            t = cm[f"PointSceneMLP_{i}"]
            p = f"contact_model.point_mlp.{i}"
            _inv_layernorm(out, f"{p}.mlp_pre.0", t["LayerNorm_0"])
            _inv_dense(out, f"{p}.mlp_pre.1", t["Dense_0"])
            _inv_dense(out, f"{p}.mlp_pre.3", t["Dense_1"])
            _inv_layernorm(out, f"{p}.mlp_post.0", t["LayerNorm_1"])
            _inv_dense(out, f"{p}.mlp_post.1", t["Dense_2"])
            _inv_dense(out, f"{p}.mlp_post.3", t["Dense_3"])
        return out
    if arch in ("PointTrans", "PointTransV2"):
        cs = stats["contact_model"]
        p = "contact_model"
        _inv_point_encoder(out, cm, cs, pt_blocks, f"{p}.")
        _inv_point_decoder(out, cm, cs, len(pt_blocks), f"{p}.")

        def inv_ctx(torch_name, tree_p, tree_s):
            _inv_dense(out, f"{p}.{torch_name}.0", tree_p["Dense_0"])
            _inv_bn(out, f"{p}.{torch_name}.1", tree_p["PointNorm_0"],
                    tree_s["PointNorm_0"])
            _inv_dense(out, f"{p}.{torch_name}.3", tree_p["Dense_1"])

        if arch == "PointTransV2":
            for i, name in enumerate(("ctx4", "ctx3", "ctx2")):
                inv_ctx(name, cm[f"_CtxMLP_{i}"], cs[f"_CtxMLP_{i}"])
            _inv_encoder(out, f"{p}.self_attn_layers",
                         cm["TransformerEncoder_0"], 1)
        else:
            inv_ctx("ctx", cm["_CtxMLP_0"], cs["_CtxMLP_0"])
        return out
    assert arch == "Perceiver", f"unknown CDM arch {arch}"
    p = "contact_model"
    _inv_dense(out, f"{p}.encoder_adapter", cm["Dense_0"])
    _inv_dense(out, f"{p}.language_adapter", cm["Dense_1"])
    _inv_dense(out, f"{p}.time_embedding_adapter", cm["Dense_2"])
    _inv_perceiver_cross_layer(out, f"{p}.encoder_cross_attn",
                               cm["CrossAttentionLayer_0"])
    for i in range(self_attn_layers):
        _inv_perceiver_self_layer(
            out, f"{p}.encoder_self_attn.{i}",
            cm["SelfAttentionBlock_0"][f"SelfAttentionLayer_{i}"],
        )
    _inv_dense(out, f"{p}.decoder_adapter", cm["Dense_3"])
    _inv_perceiver_cross_layer(out, f"{p}.decoder_cross_attn",
                               cm["CrossAttentionLayer_1"])
    return out


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write an exported state_dict as a torch .pt the reference's
    load_ckpt can read directly (reference: utils/training.py:342-383)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
