"""Export an Orbax checkpoint trained HERE to a reference-layout torch
``model{step}.pt`` that the reference's ``load_ckpt`` consumes directly
(reference: utils/training.py:342-383; test.py:47-49) — e.g. to run the
offline MDM-protocol GPU eval in the reference environment.

Usage (same Hydra-style overrides as train.py/test.py, pointing at the
experiment whose latest checkpoint should be exported):

    python tools/export_torch_ckpt.py exp_dir=outputs/<exp> task=... model=...
    # -> outputs/<exp>/ckpt_torch/model{step}.pt

Round-trip correctness is pinned by tests/test_torch_export.py (export is
the exact inverse of the torch->flax converters over the real reference
module key sets).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> str:
    from afford_motion_tpu.utils.config import load_config
    from afford_motion_tpu.utils.misc import apply_platform_env, compute_repr_dimension

    apply_platform_env()
    cfg = load_config(os.path.join(REPO, "configs"),
                      argv if argv is not None else sys.argv[1:])
    cfg.model.input_feats = compute_repr_dimension(cfg.model.data_repr)

    import orbax.checkpoint as ocp

    from afford_motion_tpu.train import latest_ckpt
    from afford_motion_tpu.utils.torch_convert import (
        export_cdm_checkpoint, export_cmdm_checkpoint, save_torch_state_dict,
    )

    ckpt = latest_ckpt(os.path.join(cfg.exp_dir, "ckpt"))
    assert ckpt is not None, f"no checkpoint under {cfg.exp_dir}/ckpt"
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
    variables = {"params": restored["params"],
                 "batch_stats": restored.get("batch_stats", {})}
    step = int(os.path.basename(ckpt).replace("model", "") or 0)

    name = str(cfg.model.name)
    if name.startswith("CMDM"):
        sd = export_cmdm_checkpoint(
            variables,
            num_layers=tuple(cfg.model.num_layers),
            blocks=tuple(cfg.model.contact_model.blocks),
            arch=str(cfg.model.arch),
            fused_qkv=bool(cfg.model.get("fused_qkv", False)),
        )
    elif name.startswith("CDM"):
        arch = str(cfg.model.arch)
        kw = {"arch": arch}
        if arch == "Perceiver":
            kw["self_attn_layers"] = int(
                cfg.model.arch_perceiver.encoder_self_attn_num_layers
            )
        elif arch == "MLP":
            kw["mlp_layers"] = len(list(cfg.model.arch_mlp.point_mlp_dims))
        else:
            kw["pt_blocks"] = tuple(cfg.model.arch_pointtrans.blocks)
        sd = export_cdm_checkpoint(variables, **kw)
    else:
        raise NotImplementedError(name)

    out_dir = os.path.join(cfg.exp_dir, "ckpt_torch")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"model{step:06d}.pt")
    save_torch_state_dict(sd, out)
    print(f"exported {len(sd)} tensors -> {out}")
    return out


if __name__ == "__main__":
    main()
