"""HUMANISE target-object masks for the dist_to_target metric
(reference: prepare/generate_target_object_mask.py). For each HUMANISE
sample: mark which of the 8192 sampled contact points belong to the
annotated target object, using ScanNet's per-vertex instance segmentation
(``*_vh_clean_2.0.010000.segs.json`` + ``*.aggregation.json``)."""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import numpy as np

from ..utils.io import get_logger

logger = get_logger()


def load_scannet_object_vertex_mask(scene_dir: str, scene_id: str, object_id: int) -> np.ndarray:
    """(N_scene_verts,) bool mask of vertices belonging to object_id."""
    segs_file = os.path.join(scene_dir, scene_id, f"{scene_id}_vh_clean_2.0.010000.segs.json")
    agg_file = os.path.join(scene_dir, scene_id, f"{scene_id}.aggregation.json")
    with open(segs_file) as f:
        seg_indices = np.asarray(json.load(f)["segIndices"])
    with open(agg_file) as f:
        groups = json.load(f)["segGroups"]
    target_segs = set()
    for g in groups:
        if int(g["objectId"]) == int(object_id):
            target_segs.update(g["segments"])
    return np.isin(seg_indices, list(target_segs))


def generate_target_object_masks(data_dir: str = "./data") -> None:
    import pandas as pd

    base = os.path.join(data_dir, "HUMANISE")
    anno = pd.read_csv(os.path.join(base, "annotations.csv"))
    contact_anno = pd.read_csv(os.path.join(base, "contact_motion", "anno.csv"))
    out_dir = os.path.join(base, "contact_motion", "target_mask")
    os.makedirs(out_dir, exist_ok=True)

    for i in range(len(contact_anno)):
        scene_id = contact_anno.loc[i]["scene_id"]
        object_id = anno.loc[i]["object_id"]
        try:
            vert_mask = load_scannet_object_vertex_mask(
                os.path.join(base, "scenes"), scene_id, object_id
            )
            npz = np.load(os.path.join(base, "contact_motion", "contacts", f"{i:05d}.npz"))
            sampled = npz["mask"]  # indices into the full scene cloud
            np.save(os.path.join(out_dir, f"{i:05d}.npy"), vert_mask[sampled])
        except FileNotFoundError as e:
            logger.warning(f"target mask skipped for {i}: {e}")
