"""Evaluators (reference: utils/evaluate.py:30-531).

Same registry names + sample_list/k_samples_list contract + on-disk output
protocols as the reference:
- ContactHumanML3DEvaluator writes ``H3D/pred_contact/{id}-{cap}.npy``,
- ContactEvaluator computes dist_to_target@thresholds and writes
  ``{set}/pred_contact/{i:05d}.npy`` (the stage-1 → stage-2 handoff),
- Text2MotionInSceneHumanML3DEvaluator pickles motions for the offline
  MDM-protocol HumanML3D eval,
- Text2MotionInSceneEvaluator computes APD + physics (jitted SDF) + saves
  per-sequence results; the SMPL-X projection is gated on the fitting
  weights being available (joints are saved either way).
"""
from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..data.base import contact_to_dist
from ..utils.io import get_logger
from ..utils.registry import EVALUATOR
from .physics import compute_pairwise_distance, dist_to_obj, physics_over_sequence

logger = get_logger()


class Eval:
    """Base evaluator (reference: utils/evaluate.py:20-28)."""

    def __init__(self, cfg: Any, *args, **kwargs):
        ecfg = cfg.evaluator
        self.cfg = ecfg
        self.k_samples = int(ecfg.get("k_samples", 0))
        self.num_k_samples = int(ecfg.get("num_k_samples", 0))
        self.eval_nbatch = int(ecfg.get("eval_nbatch", 1))
        self.eval_metrics = list(ecfg.get("eval_metrics", []))
        self.save_results = bool(ecfg.get("save_results", True))
        self.metrics: Dict[str, Any] = defaultdict(list)

    def evaluate(self, sample_list, k_samples_list, save_dir, dataloader, **kwargs):
        pass

    def report(self, save_dir: str) -> None:
        """metrics.txt + metrics.json (reference: evaluate.py:409-427)."""
        path = os.path.join(save_dir, "metrics.txt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for m in self.metrics:
                if m.startswith("_"):
                    continue
                v = self.metrics[m]
                if isinstance(v, list) and v and isinstance(v[0], (int, float, np.floating)):
                    f.write(f"{m}: {np.mean(v):.6f}\n")
                else:
                    f.write(f"{m}: {v}\n")
        with open(path.replace(".txt", ".json"), "w") as f:
            json.dump({k: _jsonable(v) for k, v in self.metrics.items()}, f)


def _jsonable(v):
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def _pred_dist(contact: np.ndarray, dataset) -> np.ndarray:
    """Denormalize a sampled contact map and convert to distances
    (reference: evaluate.py:55-60)."""
    contact = dataset.denormalize(contact, clip=True)
    if getattr(dataset, "use_raw_dist", False):
        return contact.copy()
    return contact_to_dist(contact, dataset.sigma)


@EVALUATOR.register()
class ContactHumanML3DEvaluator(Eval):
    """Save stage-1 H3D contacts for the stage-2 dataset
    (reference: evaluate.py:30-82)."""

    def evaluate(self, sample_list, k_samples_list, save_dir, dataloader, **kwargs):
        if not self.save_results:
            return
        out = os.path.join(save_dir, "H3D", "pred_contact")
        os.makedirs(out, exist_ok=True)
        for sample in sample_list:
            dist = _pred_dist(sample["sample"], dataloader.dataset)
            name, cap = sample["info_index"], sample["info_caption_index"]
            np.save(os.path.join(out, f"{name}-{cap}.npy"), dist[None, ...])
        for ks in k_samples_list:
            dist = _pred_dist(ks["k_samples"], dataloader.dataset)
            name, cap = ks["info_index"], ks["info_caption_index"]
            np.save(os.path.join(out, f"{name}-{cap}.npy"), dist)


@EVALUATOR.register()
class Text2MotionInSceneHumanML3DEvaluator(Eval):
    """Pickle generated motions for the offline MDM-protocol eval
    (reference: evaluate.py:84-139)."""

    def __init__(self, cfg: Any, *args, **kwargs):
        super().__init__(cfg, *args, **kwargs)
        self.njoints = int(cfg.evaluator.get("njoints", 22))

    def evaluate(self, sample_list, k_samples_list, save_dir, dataloader, **kwargs):
        if not self.save_results:
            return
        out = os.path.join(save_dir, "humanml")
        os.makedirs(out, exist_ok=True)
        for sample in sample_list:
            # MDM's protocol re-normalizes with the T2M eval mean/std, so we
            # save the DEnormalized motion (reference: evaluate.py:109-117)
            motion = dataloader.dataset.denormalize(sample["sample"])
            length = int((~sample["x_mask"]).sum())
            name, cap = sample["info_index"], sample["info_caption_index"]
            with open(os.path.join(out, f"{name}-{cap}.pkl"), "wb") as fp:
                pickle.dump({
                    "name": name, "text": sample["c_text"],
                    "tokens": sample["info_tokens"],
                    "motion": motion, "m_len": length,
                }, fp)
        for ks in k_samples_list:
            # MM protocol consumes the raw (normalized) samples
            length = int((~ks["x_mask"]).sum())
            name, cap = ks["info_index"], ks["info_caption_index"]
            with open(os.path.join(out, f"{name}-{cap}.pkl"), "wb") as fp:
                pickle.dump({
                    "name": name, "text": ks["c_text"], "tokens": ks["info_tokens"],
                    "motion": ks["k_samples"], "m_len": length,
                }, fp)


@EVALUATOR.register()
class ContactEvaluator(Eval):
    """Stage-1 dist_to_target metrics on HUMANISE target-object masks +
    pred_contact handoff saving (reference: evaluate.py:141-235)."""

    def __init__(self, cfg: Any, *args, **kwargs):
        super().__init__(cfg, *args, **kwargs)
        self.dist_to_target_thresholds = list(
            cfg.evaluator.get("dist_to_target_thresholds", [0.1, 0.3, 0.5])
        )

    def evaluate(self, sample_list, k_samples_list, save_dir, dataloader, **kwargs):
        for sample in sample_list:
            dist = _pred_dist(sample["sample"], dataloader.dataset)
            if "dist_to_target" in self.eval_metrics and sample.get("info_obj_mask") is not None:
                obj_dist = dist[np.asarray(sample["info_obj_mask"], dtype=bool), :]
                if obj_dist.size == 0:
                    continue
                d = obj_dist.min()
                for thr in self.dist_to_target_thresholds:
                    self.metrics[f"dist_to_target_{thr}"].append(float(d < thr))
                self.metrics["dist_to_target_average"].append(float(obj_dist.mean()))
                self.metrics["dist_to_target_pelvis_average"].append(float(obj_dist[:, 0].mean()))
                self.metrics["dist_to_target_min_average"].append(float(obj_dist.min(-1).mean()))

        if self.save_results:
            for sample in sample_list:
                dist = _pred_dist(sample["sample"], dataloader.dataset)
                out = os.path.join(save_dir, str(sample["info_set"]), "pred_contact")
                os.makedirs(out, exist_ok=True)
                np.save(os.path.join(out, f"{sample['info_index']:05d}.npy"), dist[None, ...])
            for ks in k_samples_list:
                dist = _pred_dist(ks["k_samples"], dataloader.dataset)
                out = os.path.join(save_dir, str(ks["info_set"]), "pred_contact")
                os.makedirs(out, exist_ok=True)
                np.save(os.path.join(out, f"{ks['info_index']:05d}.npy"), dist)


@EVALUATOR.register()
class Text2MotionInSceneEvaluator(Eval):
    """Stage-2 physics/diversity metrics (reference: evaluate.py:237-427).

    Physics requires projecting predicted joints to SMPL-X meshes. When the
    JointsToSMPLX fitting weights (cfg.evaluator.joints_to_smplx_model_weights)
    or the SMPL-X body model are unavailable, physics metrics are skipped
    with a warning and joints are saved raw."""

    def __init__(self, cfg: Any, *args, **kwargs):
        super().__init__(cfg, *args, **kwargs)
        self.njoints = int(cfg.evaluator.get("njoints", 22))
        self.opt_rate = float(cfg.evaluator.get("opt_rate", 0.02))
        self.opt_steps = int(cfg.evaluator.get("opt_steps", 200))
        # batched-fit chunk: the 200-step Adam refinement runs ONCE over
        # (fit_batch, L) padded batches for the whole sample list, instead
        # of the reference's per-sequence Python loop (and its second
        # refit when saving — reference evaluate.py:261-279 vs :306-334)
        self.fit_batch = int(cfg.evaluator.get("fit_batch", 16))
        self._fitter = None
        self._fit_cache: Optional[np.ndarray] = None
        weights = str(cfg.evaluator.get("joints_to_smplx_model_weights", ""))
        try:
            from .joints_to_smplx import JointsToSMPLXFitter

            self._fitter = JointsToSMPLXFitter(
                weights, opt_rate=self.opt_rate, opt_steps=self.opt_steps
            )
        except Exception as e:  # missing weights/body model
            logger.warning(f"SMPL-X fitting unavailable ({e}); physics metrics skipped")

    def _fit_all(self, sample_list, dataloader) -> np.ndarray:
        """One batched SMPL-X fit for the whole sample list: (n, L, 69).
        All samples share the padded horizon L, so chunks of ``fit_batch``
        sequences refine together in one jitted fori_loop each."""
        joints = np.stack(
            [dataloader.dataset.denormalize(s["sample"]) for s in sample_list]
        )
        masks = np.stack([np.asarray(s["x_mask"]) for s in sample_list])
        out = []
        for a in range(0, len(sample_list), self.fit_batch):
            out.append(self._fitter.fit(
                joints[a: a + self.fit_batch], masks[a: a + self.fit_batch]
            ))
        return np.concatenate(out, axis=0)

    def evaluate(self, sample_list, k_samples_list, save_dir, dataloader, **kwargs):
        for item in sample_list:
            self.metrics["_name"].append(f"{item['info_set']} - {item['info_index']}")
            self.metrics["_length"].append(f"{int((~item['x_mask']).sum())}")

        wants_physics = any(
            m in self.eval_metrics for m in ("dist", "non_collision", "contact")
        )
        if self._fitter is not None and sample_list and (
            wants_physics or self.save_results
        ):
            self._fit_cache = self._fit_all(sample_list, dataloader)

        if wants_physics and self._fitter is not None:
            self.eval_physics(sample_list, dataloader)
        elif wants_physics:
            logger.warning("physics metrics requested but SMPL-X fitter unavailable")

        if "apd" in self.eval_metrics and len(k_samples_list) > 0:
            self.eval_apd(k_samples_list, dataloader)

        if "Rprecison" in self.eval_metrics or "fid" in self.eval_metrics:
            self.eval_humanml(sample_list, k_samples_list, dataloader)

        if self.save_results:
            out = os.path.join(save_dir, "joints")
            os.makedirs(out, exist_ok=True)
            for i, sample in enumerate(sample_list):
                joints = dataloader.dataset.denormalize(sample["sample"])
                payload = {
                    "joints": joints[~sample["x_mask"]],
                    "text": sample["c_text"],
                    "set": sample["info_set"],
                    "index": sample["info_index"],
                    "scene_trans": sample["info_scene_trans"],
                    "scene_mesh": sample["info_scene_mesh"],
                }
                if self._fit_cache is not None:
                    payload["params"] = self._fit_cache[i]
                with open(os.path.join(out, f"{sample['info_index']:05d}.pkl"), "wb") as f:
                    pickle.dump(payload, f)
        self._fit_cache = None

    def eval_physics(self, sample_list, dataloader):
        """(reference: evaluate.py:336-371).

        Shape discipline (round-5 rehearsal finding): every device call here
        runs at a FIXED shape so the whole protocol pass compiles a handful
        of programs instead of one per sequence — at 1000+ sequences with
        ragged valid-lengths the old sliced-verts form recompiled per item,
        which is minutes per compile over a remote backend. Physics runs on
        the full padded (L, V, 3) stack and the valid-frame mean happens
        host-side (per-frame values are independent — metric bit-identical);
        object points for `dist` pad to 128-point buckets by repeating a
        real point (idempotent under the max reduction)."""
        faces = jnp.asarray(self._fitter.faces)
        # Dispatch phase: enqueue every sequence's LBS + SDF + dist programs
        # WITHOUT syncing — the device streams through the queue while the
        # host races ahead (the per-sequence float() sync cost ~0.9s/seq
        # over a tunneled backend; round-5 rehearsal measurement). Only the
        # tiny per-frame scalar arrays are materialized, in a second pass.
        deferred = []
        for i, sample in enumerate(sample_list):
            x_mask = np.asarray(sample["x_mask"])
            valid = ~x_mask
            # LBS from the (single) batched fit — per sequence to bound the
            # (L, V, 4, 4) skinning intermediates; padded horizon kept,
            # vertex stack stays ON DEVICE between LBS and physics
            verts = self._fitter.vertices_device(self._fit_cache[i])  # (L, V, 3)
            xyz = jnp.asarray(sample["c_pc_xyz"])

            ncs = cts = d = None
            if "non_collision" in self.eval_metrics or "contact" in self.eval_metrics:
                ncs, cts = physics_over_sequence(
                    xyz, verts, faces,
                    kernel=str(self.cfg.get("sdf_kernel", "auto")),
                )

            if "dist" in self.eval_metrics and sample.get("info_obj_mask") is not None:
                obj = np.asarray(sample["c_pc_xyz"])[
                    np.asarray(sample["info_obj_mask"], dtype=bool)]
                if obj.shape[0] > 0:
                    # last VALID frame (the padded stack's -1 is a pad frame)
                    anchor = 0 if str(sample["c_text"]).startswith("stand up") \
                        else int(valid.sum()) - 1
                    bucket = -(-obj.shape[0] // 128) * 128
                    obj = np.concatenate(
                        [obj, np.repeat(obj[:1], bucket - obj.shape[0], axis=0)]
                    )
                    d = dist_to_obj(jnp.asarray(obj), verts[anchor], faces)
            deferred.append((valid, ncs, cts, d))
            if (i + 1) % 256 == 0 and ncs is not None:
                np.asarray(ncs.ravel()[:1])  # bound the in-flight queue

        for valid, ncs, cts, d in deferred:
            if ncs is not None:
                self.metrics["non_collision"].append(
                    float(np.asarray(ncs)[valid].mean()))
                self.metrics["contact"].append(
                    float(np.asarray(cts)[valid].mean()))
            if d is not None:
                self.metrics["dist"].append(float(d))

    def eval_humanml(self, sample_list, k_samples_list, dataloader):
        """In-repo HumanML3D metrics through the frozen text-motion-match
        evaluator (reference: evaluate.py:388-407). Gated on the evaluator
        checkpoint/meta existing on disk; paths configurable via
        cfg.evaluator.{eval_meta_dir, t2m_ckpt_path}."""
        try:
            from .eval_humanml import eval_humanml

            kwargs = {}
            if "eval_meta_dir" in self.cfg:
                kwargs["eval_meta_dir"] = str(self.cfg.eval_meta_dir)
            if "t2m_ckpt_path" in self.cfg:
                kwargs["ckpt_path"] = str(self.cfg.t2m_ckpt_path)
            if "eval_batch_size" in self.cfg:
                kwargs["batch_size"] = int(self.cfg.eval_batch_size)
            all_metrics = eval_humanml(sample_list, k_samples_list, dataloader, **kwargs)
        except FileNotFoundError as e:
            logger.warning(f"HumanML metrics skipped (missing asset: {e})")
            return
        for metric_name, metric_dict in all_metrics.items():
            for model_name, values in metric_dict.items():
                mean = np.mean(values, axis=0)
                if isinstance(mean, np.ndarray):
                    mean = mean.tolist()
                elif isinstance(mean, (np.floating, np.integer)):
                    mean = float(mean)
                self.metrics["H3D+" + metric_name + "_" + model_name] = mean

    def eval_apd(self, k_samples_list, dataloader):
        """(reference: evaluate.py:373-386)."""
        for ks in k_samples_list:
            x_mask = ks["x_mask"]
            pose_seq = ks["k_samples"][:, ~x_mask, :]
            pose_seq = dataloader.dataset.denormalize(pose_seq)
            pose_seq = pose_seq[:, :, : self.njoints * 3]
            self.metrics["apd"].append(compute_pairwise_distance(pose_seq))


def create_evaluator(cfg: Any, *args, **kwargs):
    """(reference: evaluate.py:522-531)."""
    return EVALUATOR.get(cfg.evaluator.name)(cfg, *args, **kwargs)
