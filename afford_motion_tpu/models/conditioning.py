"""Host- and device-side condition preparation shared by train/test/sample.

Splits the reference's in-forward conditioning (text encode, scene encode,
geometry) into:
- host side (strings -> frozen text embeddings, info_* filtering),
- device side (point hierarchies; built inside jit, once per batch).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.hierarchy import (
    build_point_hierarchy,
    build_point_hierarchy_from_fps,
    geometry_from_arrays,
)
from .cdm import CDM
from .cmdm import CMDM
from .pointtransformer import SEG_NSAMPLES, SEG_STRIDES
from .scene_map import SCENEMAP_NSAMPLES, SCENEMAP_STRIDES
from .text import TextEncoder

ARRAY_COND_KEYS = (
    "c_pc_xyz", "c_pc_feat", "c_pc_contact",
    "c_text_mask", "c_text_erase", "c_pc_mask", "c_pc_erase",
    "x_mask",
)


def host_prepare_cond(
    batch: Dict[str, Any], text_encoder: TextEncoder,
    drop_suffixes: Tuple[str, ...] = (),
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Strings -> embeddings, drop info_* metadata. Returns (x, cond).

    ``drop_suffixes``: geometry-cache fields the model never reads (e.g.
    the 3-NN up-interpolation arrays for an encoder-only SceneMap) are cut
    here so they never hit the wire."""
    cond: Dict[str, np.ndarray] = {}
    if getattr(text_encoder, "per_token", False):
        # BERT-for-CMDM: (B, L, D) token features + pad mask (True=padding,
        # the reference's inverted attention mask, cmdm.py:138-140)
        emb, pad = text_encoder.encode_tokens(batch["c_text"])
        cond["text_emb"] = emb
        cond["text_token_mask"] = pad
    else:
        cond["text_emb"] = text_encoder.encode(batch["c_text"])[:, None, :]  # (B, 1, D)
    for key in ARRAY_COND_KEYS:
        if key in batch and isinstance(batch[key], np.ndarray):
            v = batch[key]
            if key in ("c_text_mask", "c_text_erase", "c_pc_mask", "c_pc_erase"):
                v = v.reshape(v.shape[0], 1)
            cond[key] = v
    # precomputed rigid-invariant geometry (dataset geometry cache)
    for key, v in batch.items():
        if key.startswith("geo_") and isinstance(v, np.ndarray):
            if any(key.endswith(s) for s in drop_suffixes):
                continue
            cond[key] = v
    return batch["x"], cond


def add_hierarchies(model, cond: Dict[str, Any]) -> Dict[str, Any]:
    """Attach the point hierarchies the model consumes. Runs under jit —
    FPS/kNN execute on device, once per batch (and once per sampling
    chain)."""
    xyz = cond.get("c_pc_xyz")
    if xyz is None:
        return cond
    cond = dict(cond)

    with_up = bool(getattr(model, "needs_up_interpolation", True))
    # bandedness rides on the model config (TrainLoop clones the model with
    # use_banded=True for Morton-sorted packed data); the full-geometry
    # cache path stays exact — its indices were computed offline
    banded = bool(getattr(model, "use_banded", False))
    # model.knn_exact: bit-exact reference-parity kNN (eval A/B leg);
    # threaded as an explicit static arg, same discipline as use_banded
    knn_method = "exact" if bool(getattr(model, "knn_exact", False)) else None
    # the banded window/adaptive knobs ride on the model config too
    # (model.banded_window / model.banded_adaptive; resolved in banded.py —
    # AM_BANDED_* env vars remain available as debug overrides)
    window = int(getattr(model, "banded_window", 0) or 0)
    adaptive = getattr(model, "banded_adaptive", None)

    def levels_for(prefix, strides, nsamples, up):
        if f"{prefix}0_knn_idx" in cond:      # full geometry cache
            # ``banded`` is only ever set for fps-wire data whose cached
            # indices come from the banded windowed kNN (the device-store
            # geometry cache), so it transfers to the cached-index gathers;
            # offline exact caches ride with use_banded=False
            return geometry_from_arrays(
                cond, xyz, len(strides), prefix=prefix, banded=banded,
                window=window, adaptive=adaptive,
            )
        if f"{prefix}1_fps_idx" in cond:      # fps-only wire: kNN on device
            return build_point_hierarchy_from_fps(
                xyz, cond, strides, nsamples, prefix=prefix, with_up=up,
                banded=banded, knn_method=knn_method,
                window=window, adaptive=adaptive,
            )
        return build_point_hierarchy(
            xyz, strides, nsamples, with_up=up, banded=banded,
            knn_method=knn_method, window=window, adaptive=adaptive,
        )

    def sm_levels():
        return levels_for("geo_sm", SCENEMAP_STRIDES, SCENEMAP_NSAMPLES, with_up)

    if isinstance(model, CMDM):
        cond["levels_sm"] = sm_levels()
    if isinstance(model, CDM):
        if model.needs_seg_hierarchy:
            cond["levels_seg"] = levels_for(
                "geo_seg", SEG_STRIDES, SEG_NSAMPLES, True
            )
        if model.needs_pt_hierarchy:
            cond["levels_pt"] = sm_levels()
    return cond


def encode_conditions(model, variables, cond, *, train: bool = False, mutable=False):
    """Model-specific expensive condition encoding (hoisted out of the
    denoising loop). Returns the 'enc' handed to model.denoise."""
    if isinstance(model, CMDM):
        return model.apply(
            variables, cond, train=train, method=CMDM.encode_contact, mutable=mutable
        )
    if isinstance(model, CDM):
        return model.apply(
            variables, cond, train=train, method=CDM.encode_scene, mutable=mutable
        )
    raise NotImplementedError(type(model))
