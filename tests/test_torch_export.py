"""Round-trip checkpoint interop: flax -> torch export (utils/torch_convert
export_*) must be the exact inverse of the torch -> flax converters, over
the REAL reference module key sets (tests/ref_harness).

This is the "switch back" path: a model trained in this framework exports
to a reference-layout model{step}.pt that the reference's load_ckpt
(reference: utils/training.py:342-383) consumes — e.g. for the offline
MDM-protocol GPU eval.
"""
import numpy as np
import pytest
import torch

from tests.ref_harness import Cfg, load_reference, randomize_module, state_dict_numpy
from tests.test_golden_parity import _cdm_cfg, _cmdm_cfg
from afford_motion_tpu.utils.torch_convert import (
    convert_cdm_checkpoint,
    convert_cmdm_checkpoint,
    export_cdm_checkpoint,
    export_cmdm_checkpoint,
)

# state_dict entries the converters intentionally skip: non-parameter
# buffers (positional encodings, BN bookkeeping)
_IGNORABLE = ("sequence_pos_encoder.pe", ".pe", "num_batches_tracked")


def _roundtrip_check(sd: dict, exported: dict) -> None:
    missing = [
        k for k in sd
        if k not in exported and not any(tag in k for tag in _IGNORABLE)
    ]
    assert missing == [], f"export misses reference keys: {missing[:8]}"
    for k in exported:
        if k.endswith("num_batches_tracked"):
            continue
        assert k in sd, f"export produced an unknown key: {k}"
        np.testing.assert_allclose(
            exported[k], sd[k], rtol=0, atol=0,
            err_msg=f"round-trip mismatch at {k}",
        )


@pytest.mark.parametrize("arch", ["trans_enc", "trans_dec"])
def test_cmdm_export_roundtrip(arch):
    ref = load_reference()
    model_t = ref.cmdm.CMDM(_cmdm_cfg(arch))
    randomize_module(model_t, seed=71)
    sd = state_dict_numpy(model_t)
    nl = (1, 1) if arch == "trans_enc" else (1, 1, 1)
    converted = convert_cmdm_checkpoint(sd, num_layers=nl,
                                        blocks=(2, 2, 2, 2), arch=arch)
    exported = export_cmdm_checkpoint(converted, num_layers=nl,
                                      blocks=(2, 2, 2, 2), arch=arch)
    _roundtrip_check(sd, exported)
    # the reference's own loader accepts the exported dict verbatim
    missing, unexpected = model_t.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=False,
    )
    assert unexpected == []
    assert all(any(tag in k for tag in _IGNORABLE) for k in missing), missing


@pytest.mark.parametrize("arch", ["Perceiver", "MLP"])
def test_cdm_export_roundtrip(arch):
    ref = load_reference()
    model_t = ref.cdm.CDM(_cdm_cfg(arch))
    randomize_module(model_t, seed=72)
    sd = state_dict_numpy(model_t)
    kw = (dict(self_attn_layers=2) if arch == "Perceiver"
          else dict(arch="MLP", mlp_layers=2))
    converted = convert_cdm_checkpoint(sd, **kw)
    exported = export_cdm_checkpoint(converted, **{
        ("self_attn_layers" if k == "self_attn_layers" else k): v
        for k, v in kw.items()})
    _roundtrip_check(sd, exported)


@pytest.mark.parametrize("arch", ["PointTrans", "PointTransV2"])
def test_cdm_pointtrans_export_roundtrip(arch):
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
    randomize_module(model_t, seed=73)
    sd = state_dict_numpy(model_t)
    converted = convert_cdm_checkpoint(sd, arch=arch)
    exported = export_cdm_checkpoint(converted, arch=arch)
    _roundtrip_check(sd, exported)
