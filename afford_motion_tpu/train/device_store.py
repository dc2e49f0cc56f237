"""Device-resident training corpus — the host streams only indices.

The e2e training loop on thin host->device links (remote TPU; measured
~40-70MB/s here) is bound by the per-step conditioning wire (~250KB/item).
At afford-motion's corpus scale the whole training set fits in HBM
(~250KB/item * ~25k items ~ 6GB on a 16GB v5e), so this module uploads it
ONCE and the per-step wire drops to a few hundred bytes of indices plus a
(B, 512) caption embedding:

- ``motion16``  (n_names, L_max, D) f16 — normalized motions (the exact
  half_wire_x wire values; normalization is per-frame so cropping commutes)
- ``length``    (n_names,) int32
- ``xyz16``     (n_scenes, P, 3) f16 and ``dist16`` (n_scenes, P, C) f16 —
  straight from the packed memmap store (data/packed.py)
- ``geo_*_fps_idx`` — the fps-only geometry wire fields
- caption choice / random crop draws stay on the HOST (python ``random``,
  identical semantics to the dataset's __getitem__); their results ride in
  the index batch. The device assembles (x, cond) inside the jitted train
  step: crop-gather + mask for x, row-gathers + the sigma kernel for the
  conditioning.

``mix_train_ratio`` > 0 ships the mixed items' contact override as a
(B, P, C) f16 operand — still ~3x less wire than full batches.

Supported for all four training families:
- ContactMotionHumanML3D (flagship t2m stage 2): trivial transforms;
  motions come from the RAM corpus (normalized f16 — the exact wire).
- ContactMotionDataset (MotionX stage 2, ts2m/novel): the RandomRotation /
  ApplyTransformCMDM augmentation moves ONTO THE DEVICE (host draws the
  angle from the same np.random stream position); motions stored f32 raw
  (they are normalized after rotation by per-channel stds that can be
  small), padding rows normalized like the reference ((0-mean)/std).
- ContactHumanML3DDataset / ContactMapDataset (stage 1): the diffusion
  target is assembled from f32 ``dist32`` (near-exact vs the live path);
  rgb color features and the points-only rotation ride along for MotionX.

``try_build`` returns None whenever any requirement is missing and the
loop falls back to the packed/live host pipeline.
"""
from __future__ import annotations

import os
import random
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.io import get_logger

logger = get_logger()

MAX_BYTES = int(float(os.environ.get("AM_DEVICE_STORE_MAX_GB", "8")) * (1 << 30))

# Host-trivial CFG transforms (data/transforms.py:40-88): each is exactly
# ONE np.random draw per item, so the device store replays them in chain
# order inside draw_batch (RNG-stream parity with the dataset __getitem__)
# and ships the outcomes as (B, 1) bool cond flags. This notably covers the
# FLAGSHIP t2m stage-2 chain ['RandomEraseLang','RandomEraseContact',
# 'NumpyToTensor'] (scripts/t2m_contact_motion/train.sh; reference
# scripts/t2m_contact_motion/train.sh uses the same transforms).
_FLAG_TRANSFORMS = {
    "RandomMaskLang": ("c_text_mask", "random_mask_prob"),
    "RandomEraseLang": ("c_text_erase", "random_mask_prob"),
    "RandomMaskContact": ("c_pc_mask", "random_mask_prob_pc"),
    "RandomEraseContact": ("c_pc_erase", "random_mask_prob_pc"),
    "RandomSetLangNull": ("__lang_null__", "random_mask_prob"),
    # RandomSetContactNull is intentionally NOT here: it zeroes the xyz
    # cloud itself, which the host path feeds into the geometry build —
    # incompatible with the fps wire / cached hierarchy. Chains using it
    # fall back to the host pipeline.
}


def _flag_chain(dataset, base=("NumpyToTensor",)):
    """Ordered (key, prob) draw plan for the CFG flag transforms in the
    dataset's train chain; None if the chain contains anything beyond
    ``base`` + flag transforms (caller falls back to the host pipeline)."""
    tcfg = dict(dataset.cfg.get("transform_cfg", {}) or {})
    chain = []
    for t in list(dataset.cfg.get("train_transforms", [])):
        if t in base:
            continue
        if t not in _FLAG_TRANSFORMS:
            return None
        key, pk = _FLAG_TRANSFORMS[t]
        chain.append((key, float(tcfg.get(pk, 0.0) or 0.0)))
    return chain


def _draw_flags(chain, j, captions, flags, npr=np.random):
    """Replay the flag-transform chain for item j (one np.random draw per
    transform, exactly like Compose would)."""
    for key, prob in chain:
        draw = bool(npr.rand() < prob)
        if key == "__lang_null__":
            if draw:
                captions[j] = ""
        else:
            flags[key][j, 0] = draw


class DeviceStore:
    """Host-side description + device arrays of the resident corpus."""

    def __init__(self, arrays: Dict[str, Any], meta: Dict[str, Any]):
        # arrays stay HOST numpy until ensure_device()/shard_over_mesh() —
        # sharded uploads must never stage the full corpus on one device
        self.arrays = arrays
        self.meta = meta
        # corpus sharding over the mesh data axis (shard_over_mesh):
        # None = every device holds a full copy (single-device / off)
        self._mesh = None
        self._axis = None
        self._sharded_keys: set = set()

    # ---------------------------------------------------- mesh distribution
    def ensure_device(self, mesh=None) -> None:
        """Upload any still-host arrays (replicated over ``mesh`` when
        given, default device otherwise). No-op for arrays already on
        device — safe to call after shard_over_mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P()) if mesh is not None else None
        for k, v in self.arrays.items():
            if isinstance(v, np.ndarray):
                self.arrays[k] = (
                    jax.device_put(v, sharding) if sharding is not None
                    else jnp.asarray(v)
                )
        jax.block_until_ready(list(self.arrays.values()))

    def shard_over_mesh(self, mesh, axis: str = "data",
                        min_bytes: int = 1 << 20) -> None:
        """Distribute the corpus rows over the mesh data axis.

        Replaces per-device full replication with a row shard per device —
        the TPU-native completion of the reference's per-rank
        ``DistributedSampler`` data split (reference: train_ddp.py:50), but
        at the STORAGE level: every device can still train on any sample
        because ``fetch`` moves the requested rows over ICI each step
        (~B rows, negligible next to the step compute). Corpus capacity
        becomes the AGGREGATE mesh HBM instead of one device's budget.

        Host-staged upload: arrays still on the host are padded in numpy
        and ``device_put`` straight to their target NamedSharding, so a
        corpus larger than ONE device's HBM (but inside the aggregate
        budget) never transits a single device. Small per-item index
        arrays (< 1MB, e.g. ``scene_row``) stay replicated. Row counts are
        zero-padded to a multiple of the mesh axis size; the pad rows are
        never addressed (indices come from the real item/scene tables)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        # rows are owned per ``axis`` rank (fetch uses axis_index(axis)),
        # so the shard count is that axis's size — NOT the whole-mesh
        # device product (they differ on any multi-axis mesh)
        n_dev = int(mesh.shape[axis])
        out = {}
        for k, v in self.arrays.items():
            if n_dev > 1 and v.ndim >= 1 and v.nbytes > min_bytes:
                pad = (-v.shape[0]) % n_dev
                if pad:
                    cat = np.concatenate if isinstance(v, np.ndarray) else jnp.concatenate
                    zeros = (np.zeros if isinstance(v, np.ndarray) else jnp.zeros)(
                        (pad,) + v.shape[1:], v.dtype
                    )
                    v = cat([v, zeros], axis=0)
                out[k] = jax.device_put(v, NamedSharding(mesh, P(axis)))
                self._sharded_keys.add(k)
            else:
                out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        self.arrays = out
        if self._sharded_keys:
            self._mesh, self._axis = mesh, axis
            total = sum(v.nbytes for v in self.arrays.values())
            logger.info(
                f"device store: corpus sharded over {n_dev} devices "
                f"({total / 1e9:.2f}GB total, {total / n_dev / 1e9:.2f}GB/device, "
                f"{len(self._sharded_keys)} sharded arrays)"
            )
        jax.block_until_ready(list(self.arrays.values()))

    def fetch(self, key: str, rows: jnp.ndarray) -> jnp.ndarray:
        """Row-gather ``arrays[key][rows]`` that works for both layouts.

        Replicated: a plain ``jnp.take``. Sharded: a ``shard_map`` gather —
        each device looks up the rows it OWNS for the full index list and a
        ``psum_scatter`` over the batch axis hands every device exactly its
        batch shard (one owner per row, so the sum moves data without
        mixing it — bit-identical to the replicated path)."""
        A = self.arrays[key]
        if self._mesh is None or key not in self._sharded_keys:
            return jnp.take(A, rows, axis=0)

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh, axis = self._mesh, self._axis
        n_dev = int(mesh.shape[axis])
        n_local = A.shape[0] // n_dev
        # 16-bit payloads ride the collective at 32-bit (psum support);
        # values pass through a single owner so the round-trip is exact
        calc = {jnp.float16: jnp.float32, jnp.bfloat16: jnp.float32,
                jnp.int16: jnp.int32}.get(A.dtype.type)

        def body(local_arr, idx_all):
            rank = jax.lax.axis_index(axis)
            li = idx_all.astype(jnp.int32) - rank * n_local
            owned = (li >= 0) & (li < n_local)
            rows_l = jnp.take(local_arr, jnp.clip(li, 0, n_local - 1), axis=0)
            if calc is not None:
                rows_l = rows_l.astype(calc)
            contrib = jnp.where(
                owned.reshape((-1,) + (1,) * (rows_l.ndim - 1)),
                rows_l, jnp.zeros((), rows_l.dtype),
            )
            out = jax.lax.psum_scatter(
                contrib, axis, scatter_dimension=0, tiled=True
            )
            return out.astype(local_arr.dtype) if calc is not None else out

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P()), out_specs=P(axis),
        )(A, rows)

    # -------------------------------------------------------------- build
    @classmethod
    def try_build(cls, dataset, max_bytes: int = MAX_BYTES) -> Optional["DeviceStore"]:
        """Dispatch by dataset class (exact — Example/Custom sample-mode
        subclasses intentionally don't match); None if requirements don't
        fit (caller falls back to the host pipeline)."""
        builders = {
            "ContactMotionHumanML3DDataset": cls._try_build_h3d,
            "ContactMotionDataset": cls._try_build_motionx,
            "ContactHumanML3DDataset": cls._try_build_h3d_contact,
            "ContactMapDataset": cls._try_build_motionx_contact,
        }
        b = builders.get(type(dataset).__name__)
        return b(dataset, max_bytes) if b else None

    @staticmethod
    def _common_gate(dataset, allowed_transforms) -> bool:
        if getattr(dataset, "phase", "") not in ("train", "all"):
            return False
        tlist = list(dataset.cfg.get("train_transforms", []))
        if tlist not in allowed_transforms:
            return False
        if str(dataset.cfg.get("geometry_wire", "full")) != "fps":
            return False
        return True

    @classmethod
    def _try_build_h3d(cls, dataset, max_bytes: int) -> Optional["DeviceStore"]:
        """ContactMotionHumanML3D: motions live in the RAM corpus, scenes
        in the packed store."""
        needed = ("name_list", "data_dict", "mean", "std", "max_horizon",
                  "unit_length", "sigma", "use_raw_dist")
        if not all(hasattr(dataset, a) for a in needed):
            return None
        if getattr(dataset, "phase", "") not in ("train", "all"):
            return None
        if getattr(dataset, "_x16", False) is False:
            return None  # the motion store IS the f16 wire format
        packed = getattr(dataset, "_packed", None)
        if packed is None or isinstance(packed, dict):
            return None
        fields = packed.fields
        if "xyz16" not in fields or "dist16" not in fields:
            return None
        # transforms: NumpyToTensor + any CFG flag transforms (replayed
        # host-side in draw_batch); anything else -> host pipeline
        flag_chain = _flag_chain(dataset)
        if flag_chain is None:
            return None
        if str(dataset.cfg.get("geometry_wire", "full")) != "fps":
            return None

        names = list(dataset.name_list)
        bases = [n.split("_")[-1] for n in names]
        if any(b not in packed.index for b in bases):
            return None

        lengths = np.array(
            [int(dataset.data_dict[n]["length"]) for n in names], dtype=np.int32
        )
        L_max = int(lengths.max())
        D = dataset.data_dict[names[0]]["motion"].shape[-1]

        motion16 = np.zeros((len(names), L_max, D), dtype=np.float16)
        for i, n in enumerate(names):
            m = dataset.data_dict[n]["motion"][: lengths[i]]
            motion16[i, : lengths[i]] = dataset.normalize(
                np.asarray(m, dtype=np.float32)
            ).astype(np.float16)

        scene_rows = np.array([packed.index[b] for b in bases], dtype=np.int32)
        host: Dict[str, np.ndarray] = {
            "motion16": motion16,
            "length": lengths,
            "scene_row": scene_rows,
            "xyz16": np.asarray(packed.fields["xyz16"]),
            "dist16": np.asarray(packed.fields["dist16"]),
        }
        for k in packed.geo_keys:
            if "_fps_idx" in k:
                host[k] = np.asarray(packed.fields[k])

        total = sum(v.nbytes for v in host.values())
        if total > max_bytes:
            logger.info(
                f"device store: corpus {total / 1e9:.2f}GB exceeds the "
                f"{max_bytes / 1e9:.1f}GB budget; using the host pipeline"
            )
            return None

        logger.info(
            f"device store: staging {total / 1e9:.2f}GB "
            f"({len(names)} motions, {host['xyz16'].shape[0]} scenes) for HBM "
            "upload"
        )
        meta = {
            "kind": "h3d",
            "n_items": len(names),
            "max_horizon": int(dataset.max_horizon),
            "unit_length": int(dataset.unit_length),
            "sigma": float(dataset.sigma),
            "use_raw_dist": bool(dataset.use_raw_dist),
            "motion_dim": int(D),
            "mix": float(dataset.cfg.get("mix_train_ratio", 0.0) or 0.0) > 0
            and bool(getattr(dataset, "pred_contact_dict", None)),
            "flag_chain": flag_chain,
        }
        return cls(host, meta)

    @classmethod
    def _try_build_motionx(cls, dataset, max_bytes: int) -> Optional["DeviceStore"]:
        """ContactMotionDataset over MotionX sets: motions + scenes both
        come from the per-set packed stores; the RandomRotation /
        ApplyTransformCMDM augmentation moves onto the device (the host
        draws the angle — the same np.random stream position as the
        transform chain)."""
        needed = ("all_data", "mean", "std", "max_horizon", "sigma",
                  "use_raw_dist", "contact_type")
        if not all(hasattr(dataset, a) for a in needed):
            return None
        if getattr(dataset, "phase", "") not in ("train", "all"):
            return None
        if getattr(dataset, "_x16", False) is False:
            return None
        stores = getattr(dataset, "_packed", None)
        if not isinstance(stores, dict) or not stores:
            return None
        tlist = list(dataset.cfg.get("train_transforms", []))
        rotate = tlist == ["RandomRotation", "ApplyTransformCMDM", "NumpyToTensor"]
        if not rotate and any(t != "NumpyToTensor" for t in tlist):
            return None
        gravity_dim = int(dataset.cfg.get("transform_cfg", {}).get("gravity_dim", 2))
        if rotate and gravity_dim != 2:
            return None  # reference configs always use z-up
        if str(dataset.cfg.get("geometry_wire", "full")) != "fps":
            return None
        for st in stores.values():
            if not {"xyz16", "dist16", "motion32", "motion_len"} <= set(st.fields):
                return None

        # per-item rows into per-set stores, concatenated with offsets
        sets = sorted(stores.keys())
        offsets = {}
        off = 0
        for s in sets:
            offsets[s] = off
            off += len(stores[s].meta["bases"])
        rows = []
        for (s, i, *_rest) in dataset.all_data:
            st = stores.get(s)
            if st is None or f"{i:05d}" not in st.index:
                return None
            rows.append(offsets[s] + st.index[f"{i:05d}"])

        L_max = max(int(stores[s].fields["motion32"].shape[1]) for s in sets)
        D = int(stores[sets[0]].fields["motion32"].shape[2])
        P = int(stores[sets[0]].fields["xyz16"].shape[1])
        n_sc = off
        # f32: raw (unnormalized) motions are later divided by per-channel
        # stds that can be small — f16 quantization here would be amplified
        motion = np.zeros((n_sc, L_max, D), dtype=np.float32)
        length = np.zeros((n_sc,), dtype=np.int32)
        host: Dict[str, np.ndarray] = {}
        for s in sets:
            st = stores[s]
            a, b = offsets[s], offsets[s] + len(st.meta["bases"])
            m = np.asarray(st.fields["motion32"])
            motion[a:b, : m.shape[1]] = m
            length[a:b] = np.asarray(st.fields["motion_len"])
        host["motion32"] = motion
        host["length"] = length
        for f in ["xyz16", "dist16"] + [
            k for k in stores[sets[0]].geo_keys if "_fps_idx" in k
        ]:
            host[f] = np.concatenate(
                [np.asarray(stores[s].fields[f]) for s in sets], axis=0
            )
        host["scene_row"] = np.arange(n_sc, dtype=np.int32)  # 1:1 here

        total = sum(v.nbytes for v in host.values())
        if total > max_bytes:
            logger.info(
                f"device store: corpus {total / 1e9:.2f}GB exceeds the "
                f"{max_bytes / 1e9:.1f}GB budget; using the host pipeline"
            )
            return None
        logger.info(
            f"device store: staging {total / 1e9:.2f}GB "
            f"({len(rows)} items over {sets}) for HBM upload"
        )
        meta = {
            "kind": "motionx",
            "item_store_row": np.asarray(rows, dtype=np.int32),
            "n_items": len(rows),
            "max_horizon": int(dataset.max_horizon),
            "sigma": float(dataset.sigma),
            "use_raw_dist": bool(dataset.use_raw_dist),
            "motion_dim": D,
            "rotate": rotate,
            "mean": np.asarray(dataset.mean, dtype=np.float32),
            "std": np.asarray(dataset.std, dtype=np.float32),
            "mix": float(dataset.cfg.get("mix_train_ratio", 0.0) or 0.0) > 0,
        }
        return cls(host, meta)

    # ---------------------------------------------------- geometry cache
    def add_geometry_cache(self, model, max_bytes: int = MAX_BYTES,
                           chunk: int = 64) -> bool:
        """Precompute the FULL per-scene hierarchy (kNN / down-kNN / 3-NN
        up) from the stored fps wire ONCE at upload time and keep it in
        HBM, so the train step's ``add_hierarchies`` takes the cached
        branch instead of re-running the kNN cascade every step (~14.5ms
        of the 105ms flagship step, measured tools/step_breakdown.py).

        Valid because every index field is rigid-invariant — the on-device
        rotation augmentations never change neighborhoods (see the
        "rigid-invariant caching" note in ops/hierarchy.py). The cache is
        computed with the SAME kernels the in-step rebuild would use
        (banded windowed kNN when ``model.use_banded``), so training
        numerics are unchanged — only recomputed once instead of per step.

        Budget-gated against ``max_bytes`` (existing store + cache);
        ``AM_DEVICE_GEO=off`` disables. Returns True when cached."""
        if os.environ.get("AM_DEVICE_GEO", "auto") == "off":
            return False
        from ..models.cdm import CDM
        from ..models.cmdm import CMDM
        from ..models.pointtransformer import SEG_NSAMPLES, SEG_STRIDES
        from ..models.scene_map import SCENEMAP_NSAMPLES, SCENEMAP_STRIDES
        from ..ops.hierarchy import (
            build_point_hierarchy_from_fps, geometry_to_arrays,
        )

        with_up = bool(getattr(model, "needs_up_interpolation", True))
        specs = []
        if isinstance(model, CMDM):
            specs.append(("geo_sm", SCENEMAP_STRIDES, SCENEMAP_NSAMPLES, with_up))
        if isinstance(model, CDM):
            if model.needs_seg_hierarchy:
                specs.append(("geo_seg", SEG_STRIDES, SEG_NSAMPLES, True))
            if model.needs_pt_hierarchy:
                specs.append(("geo_sm", SCENEMAP_STRIDES, SCENEMAP_NSAMPLES,
                              with_up))
        specs = [s for s in specs if f"{s[0]}1_fps_idx" in self.arrays]
        if not specs:
            return False

        banded = bool(getattr(model, "use_banded", False))
        knn_method = "exact" if getattr(model, "knn_exact", False) else None
        window = int(getattr(model, "banded_window", 0) or 0)
        adaptive = getattr(model, "banded_adaptive", None)
        xyz = self.arrays["xyz16"]
        n_sc = xyz.shape[0]

        def _idx_dtype(n_parent):
            return np.int16 if n_parent < (1 << 15) else np.int32

        new_host: Dict[str, np.ndarray] = {}
        for prefix, strides, nsamples, up in specs:
            if f"{prefix}0_knn_idx" in self.arrays:
                continue  # already cached (e.g. CDM pt + CMDM share geo_sm)
            fps_keys = [
                k for k in self.arrays
                if k.startswith(prefix) and k.endswith("_fps_idx")
            ]

            @jax.jit
            def geo_chunk(xc, fps, _p=prefix, _s=tuple(strides),
                          _n=tuple(nsamples), _u=up):
                levels = build_point_hierarchy_from_fps(
                    xc.astype(jnp.float32), fps, _s, _n, prefix=_p,
                    with_up=_u, banded=banded, knn_method=knn_method,
                    window=window, adaptive=adaptive,
                )
                return geometry_to_arrays(levels, prefix=_p)

            outs: Dict[str, list] = {}
            for a in range(0, n_sc, chunk):
                b = min(a + chunk, n_sc)
                fps = {k: self.arrays[k][a:b] for k in fps_keys}
                got = geo_chunk(xyz[a:b], fps)
                for k, v in got.items():
                    if k.endswith("_fps_idx"):
                        continue  # already stored (the wire itself)
                    arr = np.asarray(v)
                    if k.endswith("_idx"):
                        arr = arr.astype(_idx_dtype(int(arr.max(initial=0)) + 1))
                    outs.setdefault(k, []).append(arr)
            for k, parts in outs.items():
                new_host[k] = np.concatenate(parts, axis=0)

        if not new_host:
            return False
        existing = sum(
            int(np.prod(v.shape)) * v.dtype.itemsize
            for v in self.arrays.values()
        )
        # Budget-aware PARTIAL caching, deepest levels first: at real
        # corpus scale (H3D ~24k clouds) the full cache is ~7GB and may
        # not fit next to the corpus. Deep levels are tiny (the per-scene
        # bytes shrink ~4x per level) while level 0's kNN is ~40% of the
        # cache, so we keep whole levels from the deepest up and stop at
        # the first that overflows; build_point_hierarchy_from_fps
        # consumes any cached subset and recomputes only what is missing.
        def level_of(key):
            rest = key[len(prefix_of(key)):]
            return int(rest.split("_")[0])

        def prefix_of(key):
            for p in ("geo_sm", "geo_seg", "geo"):
                if key.startswith(p) and key[len(p)].isdigit():
                    return p
            return key.split("_")[0]

        levels_bytes: Dict[tuple, int] = {}
        for k, v in new_host.items():
            levels_bytes.setdefault((prefix_of(k), level_of(k)), 0)
            levels_bytes[(prefix_of(k), level_of(k))] += v.nbytes
        kept_groups = set()
        stopped_prefixes = set()
        budget_left = max_bytes - existing
        for grp in sorted(levels_bytes, key=lambda g: -g[1]):  # deepest first
            if grp[0] in stopped_prefixes:
                continue  # keep each prefix's kept set a contiguous deep suffix
            if levels_bytes[grp] <= budget_left:
                kept_groups.add(grp)
                budget_left -= levels_bytes[grp]
            else:
                # this prefix stops here, but deeper-level groups of OTHER
                # prefixes may still fit
                stopped_prefixes.add(grp[0])
        kept = {k: v for k, v in new_host.items()
                if (prefix_of(k), level_of(k)) in kept_groups}
        if not kept:
            logger.info(
                f"device store: geometry cache "
                f"({sum(v.nbytes for v in new_host.values()) / 1e9:.2f}GB) "
                f"exceeds the {max_bytes / 1e9:.1f}GB budget; keeping the "
                "in-step kNN rebuild"
            )
            return False
        dropped = len(new_host) - len(kept)
        add = sum(v.nbytes for v in kept.values())
        logger.info(
            f"device store: caching hierarchy geometry "
            f"({add / 1e9:.2f}GB, {len(kept)}/{len(new_host)} fields for "
            f"{n_sc} scenes) in HBM"
            + (f"; {dropped} shallow-level fields rebuilt in-step "
               "(budget)" if dropped else "")
        )
        # host-staged like the corpus itself: ensure_device/shard_over_mesh
        # move the cache to HBM with the corpus (no single-device staging)
        self.arrays.update(kept)
        return True

    # ------------------------------------------------------------ host side
    def draw_batch(self, dataset, item_ids, py_rng=None,
                   np_rng=None) -> Dict[str, np.ndarray]:
        """Host-side randomness for a batch of dataset item ids: caption
        choice, crop/rotation draws, optional contact-mix override — the
        exact semantics (and RNG streams) of the dataset's __getitem__.

        ``py_rng``/``np_rng`` (random.Random / np.random.RandomState):
        explicit per-call generators for resume-exact training — the
        process-global modules are shared across threads, so seeding them
        from the prefetcher worker races with any other consumer (the
        round-5 resume bit-identity test caught exactly that: a
        concurrent Orbax save perturbed the stream). Defaults keep the
        global-stream behavior the dataset-parity tests rely on."""
        rnd = py_rng or random
        npr = np_rng or np.random
        if self.meta["kind"] == "motionx":
            return self._draw_batch_motionx(dataset, item_ids, rnd, npr)
        if self.meta["kind"].endswith("_contact"):
            return _draw_batch_contact(self, dataset, item_ids, rnd, npr)
        B = len(item_ids)
        crop_start = np.zeros((B,), np.int32)
        crop_len = np.zeros((B,), np.int32)
        captions = []
        mix_contact = None
        mix_mask = None
        if self.meta["mix"]:
            P, C = self.arrays["dist16"].shape[1:]
            mix_contact = np.zeros((B, P, C), np.float16)
            mix_mask = np.zeros((B,), bool)
        chain = self.meta.get("flag_chain") or []
        flags = {k: np.zeros((B, 1), bool) for k, _ in chain
                 if k != "__lang_null__"}
        u = self.meta["unit_length"]
        for j, idx in enumerate(item_ids):
            name = dataset.name_list[dataset.indices[idx]]
            item = dataset.data_dict[name]
            text = dataset._pick_caption(item["text"], rnd)
            captions.append(text["caption"])
            L = int(item["length"])
            m_len = (L // u) * u
            crop_start[j] = rnd.randint(0, L - m_len)
            crop_len[j] = m_len
            # np.random draw happens for EVERY item — RNG-stream parity
            # with the dataset __getitem__'s mix branch
            mixed = npr.random() < getattr(dataset, "mix_train_ratio", 0.0)
            if mixed and mix_contact is not None:
                base = name.split("_")[-1]
                cands = getattr(dataset, "pred_contact_dict", {}).get(base, [])
                if cands:
                    from .. import native as nio

                    mix_contact[j] = nio.load(
                        npr.choice(cands)
                    ).squeeze(0).astype(np.float16)
                    mix_mask[j] = True
            # CFG flag transforms run LAST in __getitem__ (the Compose
            # chain) — replay them here in the same np.random order
            _draw_flags(chain, j, captions, flags, npr)
        out = {
            "item_row": np.array(
                [dataset.indices[i] for i in item_ids], dtype=np.int32
            ),
            "crop_start": crop_start,
            "crop_len": crop_len,
            "c_text": captions,
        }
        if mix_contact is not None:
            out["mix_contact"] = mix_contact
            out["mix_mask"] = mix_mask
        out.update(flags)
        return out

    def _draw_batch_motionx(self, dataset, item_ids, rnd=random,
                            npr=np.random) -> Dict[str, np.ndarray]:
        B = len(item_ids)
        captions = []
        rows = np.zeros((B,), np.int32)
        angle = np.zeros((B,), np.float32) if self.meta["rotate"] else None
        mix_contact = mix_mask = None
        if self.meta["mix"]:
            P, C = self.arrays["dist16"].shape[1:]
            mix_contact = np.zeros((B, P, C), np.float16)
            mix_mask = np.zeros((B,), bool)
        store_rows = self.meta["item_store_row"]
        for j, idx in enumerate(item_ids):
            resolved = dataset.indices[idx]
            s, i, _scene_id, _trans, desc = dataset.all_data[resolved]
            rows[j] = store_rows[resolved]
            captions.append(dataset._pick_text(desc, rnd))
            # np.random stream order matches the dataset chain:
            # mix draw (inside _load_contact), then the rotation angle
            mixed = npr.random() < getattr(dataset, "mix_train_ratio", 0.0)
            if mixed and mix_contact is not None:
                f = os.path.join(
                    dataset.data_dir, s, "pred_contact", f"{i:05d}.npy"
                )
                if os.path.exists(f):
                    from .. import native as nio

                    mix_contact[j] = nio.load(f).squeeze(0).astype(np.float16)
                    mix_mask[j] = True
            if angle is not None:
                angle[j] = npr.uniform(-1.0, 1.0) * np.pi
        out: Dict[str, Any] = {"item_row": rows, "c_text": captions}
        if angle is not None:
            out["aug_angle"] = angle
        if mix_contact is not None:
            out["mix_contact"] = mix_contact
            out["mix_mask"] = mix_mask
        return out


def index_stream(n_items: int, G: int, B: int, start_step: int,
                 base_seed: int, loader_seed: int):
    """Resume-aware infinite stream of (G*B,) dataset-index chunks for the
    device-store pipeline (the host's only per-step data-selection state).

    Each corpus pass ``ep`` draws one seeded permutation (the loop seed and
    the dataloader's shuffle seed both fold in), split into G*B chunks; a
    resume at ``start_step`` re-enters the SAME epoch/chunk position the
    uninterrupted run would be at, so crash-resume does not replay data
    from the beginning (and two runs resumed at different points see the
    same overall stream)."""
    chunk = G * B
    chunks_per_ep = max(1, n_items // chunk)
    steps_per_pass = chunks_per_ep * G
    ep = start_step // steps_per_pass
    skip = (start_step % steps_per_pass) // G
    while True:
        order = np.random.default_rng(
            (base_seed * 977 + loader_seed * 9176 + ep) & 0x7FFFFFFF
        ).permutation(n_items)
        for s in range(skip * chunk, chunks_per_ep * chunk, chunk):
            yield order[s: s + chunk]
        skip = 0
        ep += 1


def make_assemble_fn(store: DeviceStore):
    """(index batch) -> (x, cond), executed inside the jitted train step.
    The store arrays are captured device residents — jit treats them as
    constants-by-reference (no per-step transfer). Host-staged stores are
    uploaded (replicated, default device) here if the caller hasn't already
    distributed them via shard_over_mesh/ensure_device."""
    store.ensure_device()
    if store.meta["kind"] == "motionx":
        return _make_assemble_motionx(store)
    if store.meta["kind"].endswith("_contact"):
        return _make_assemble_contact(store)
    A = store.arrays
    H = store.meta["max_horizon"]
    sigma = store.meta["sigma"]
    use_raw = store.meta["use_raw_dist"]

    def assemble(batch: Dict[str, jnp.ndarray]):
        rows = batch["item_row"]                      # (B,)
        s_rows = jnp.take(A["scene_row"], rows)
        crop_start = batch["crop_start"]
        crop_len = batch["crop_len"]

        t_idx = jnp.arange(H, dtype=jnp.int32)        # (H,)
        src = crop_start[:, None] + t_idx[None]       # (B, H)
        valid = t_idx[None] < crop_len[:, None]       # (B, H)
        L_max = A["motion16"].shape[1]
        motions = store.fetch("motion16", rows)
        x = jnp.take_along_axis(
            motions, jnp.clip(src, 0, L_max - 1)[..., None], axis=1
        )
        x = jnp.where(valid[..., None], x, jnp.float16(0))

        contact = store.fetch("dist16", s_rows).astype(jnp.float32)
        if "mix_contact" in batch:
            contact = jnp.where(
                batch["mix_mask"][:, None, None],
                batch["mix_contact"].astype(jnp.float32), contact,
            )
        if not use_raw:
            contact = jnp.exp(-0.5 * contact ** 2 / sigma ** 2)

        cond = {
            "x_mask": ~valid,
            "text_emb": batch["text_emb"],
            "c_pc_xyz": store.fetch("xyz16", s_rows),
            "c_pc_contact": contact.astype(jnp.float16),
        }
        for k in ("c_text_mask", "c_text_erase", "c_pc_mask", "c_pc_erase"):
            if k in batch:                      # CFG flags, (B, 1) bool
                cond[k] = batch[k]
        for k in A:
            if k.startswith("geo_"):  # fps wire + cached hierarchy fields
                cond[k] = store.fetch(k, s_rows)
        return x, cond

    return assemble


def _make_assemble_motionx(store: DeviceStore):
    """MotionX ContactMotion assembly: pad + rotate (on device, host-drawn
    angle) + normalize for x; rotate xyz; sigma kernel for contact."""
    A = store.arrays
    H = store.meta["max_horizon"]
    sigma = store.meta["sigma"]
    use_raw = store.meta["use_raw_dist"]
    mean = jnp.asarray(store.meta["mean"], dtype=jnp.float32)
    std = jnp.asarray(store.meta["std"], dtype=jnp.float32)

    def assemble(batch: Dict[str, jnp.ndarray]):
        rows = batch["item_row"]                               # (B,)
        B = rows.shape[0]
        L_max, D = A["motion32"].shape[1:]
        lengths = jnp.take(A["length"], rows)                  # (B,)

        motion = store.fetch("motion32", rows)
        if L_max < H:
            motion = jnp.pad(motion, ((0, 0), (0, H - L_max), (0, 0)))
        else:
            motion = motion[:, :H]
        t_idx = jnp.arange(H, dtype=jnp.int32)
        valid = t_idx[None] < lengths[:, None]                 # (B, H)

        xyz = store.fetch("xyz16", rows).astype(jnp.float32)
        if "aug_angle" in batch:
            ang = batch["aug_angle"].astype(jnp.float32)       # (B,)

            def rot_xy(pts, cc, ss):  # (..., 3) about the z (gravity) axis
                x0, x1, x2 = pts[..., 0], pts[..., 1], pts[..., 2]
                return jnp.stack(
                    [cc * x0 - ss * x1, ss * x0 + cc * x1, x2], axis=-1
                )

            c = jnp.cos(ang)
            s = jnp.sin(ang)
            xyz = rot_xy(xyz, c[:, None], s[:, None])
            j = motion.reshape(B, H, D // 3, 3)
            motion = rot_xy(j, c[:, None, None], s[:, None, None]).reshape(B, H, D)
        # normalize AFTER padding, like the reference chain — padding rows
        # become (0 - mean)/std, not 0 (reference: motionx.py normalize
        # after transform; the loss masks them via x_mask)
        x = ((motion - mean[None]) / std[None]).astype(jnp.float16)

        contact = store.fetch("dist16", rows).astype(jnp.float32)
        if "mix_contact" in batch:
            contact = jnp.where(
                batch["mix_mask"][:, None, None],
                batch["mix_contact"].astype(jnp.float32), contact,
            )
        if not use_raw:
            contact = jnp.exp(-0.5 * contact ** 2 / sigma ** 2)

        cond = {
            "x_mask": ~valid,
            "text_emb": batch["text_emb"],
            "c_pc_xyz": xyz.astype(jnp.float16),
            "c_pc_contact": contact.astype(jnp.float16),
        }
        for k in A:
            if k.startswith("geo_"):  # fps wire + cached hierarchy fields
                cond[k] = store.fetch(k, rows)
        return x, cond

    return assemble


# ----------------------------------------------------------- stage-1 (CDM)
def _finish_contact_store(cls_, host, meta, max_bytes):
    total = sum(v.nbytes for v in host.values())
    if total > max_bytes:
        logger.info(
            f"device store: corpus {total / 1e9:.2f}GB exceeds the "
            f"{max_bytes / 1e9:.1f}GB budget; using the host pipeline"
        )
        return None
    logger.info(
        f"device store: staging {total / 1e9:.2f}GB "
        f"({meta['n_items']} stage-1 items) for HBM upload"
    )
    return cls_(host, meta)


def _build_h3d_contact(cls_, dataset, max_bytes):
    """ContactHumanML3D (stage-1 t2m): x = normalize(sigma(dist32));
    dist32 rides at f32 so the diffusion target matches the live path."""
    packed = getattr(dataset, "_packed", None)
    if packed is None or isinstance(packed, dict):
        return None
    if not DeviceStore._common_gate(dataset, [["NumpyToTensor"]]):
        return None
    if "dist32" not in packed.fields:
        return None
    names = list(dataset.name_list)
    bases = [n.split("_")[-1] for n in names]
    if any(b not in packed.index for b in bases):
        return None
    host = {
        "scene_row": np.array([packed.index[b] for b in bases], dtype=np.int32),
        "xyz16": np.asarray(packed.fields["xyz16"]),
        "dist32": np.asarray(packed.fields["dist32"]),
    }
    for k in packed.geo_keys:
        if "_fps_idx" in k:
            host[k] = np.asarray(packed.fields[k])
    meta = {
        "kind": "h3d_contact",
        "n_items": len(names),
        "sigma": float(dataset.sigma),
        "use_raw_dist": bool(dataset.use_raw_dist),
        "rotate": False,
        "use_color": False,
        "mean": np.asarray(dataset.mean, dtype=np.float32),
        "std": np.asarray(dataset.std, dtype=np.float32),
    }
    return _finish_contact_store(cls_, host, meta, max_bytes)


def _build_motionx_contact(cls_, dataset, max_bytes):
    """ContactMapDataset (stage-1 ts2m/novel): like the h3d variant plus
    optional rgb features and the on-device rotation (points only —
    ApplyTransformCDM never touches the contact target)."""
    stores = getattr(dataset, "_packed", None)
    if not isinstance(stores, dict) or not stores:
        return None
    allowed = [["NumpyToTensor"],
               ["RandomRotation", "ApplyTransformCDM", "NumpyToTensor"]]
    if not DeviceStore._common_gate(dataset, allowed):
        return None
    rotate = "RandomRotation" in list(dataset.cfg.get("train_transforms", []))
    if rotate and int(dataset.cfg.get("transform_cfg", {}).get("gravity_dim", 2)) != 2:
        return None
    use_color = bool(getattr(dataset, "use_color", False))
    sets = sorted(stores.keys())
    for s in sets:
        need = {"xyz16", "dist32"} | ({"rgb16"} if use_color else set())
        if not need <= set(stores[s].fields):
            return None
    offsets, off = {}, 0
    for s in sets:
        offsets[s] = off
        off += len(stores[s].meta["bases"])
    rows = []
    for (s, i, *_rest) in dataset.all_data:
        st = stores.get(s)
        if st is None or f"{i:05d}" not in st.index:
            return None
        rows.append(offsets[s] + st.index[f"{i:05d}"])
    host = {"scene_row": np.arange(off, dtype=np.int32)}
    fields = ["xyz16", "dist32"] + (["rgb16"] if use_color else []) + [
        k for k in stores[sets[0]].geo_keys if "_fps_idx" in k
    ]
    for f in fields:
        host[f] = np.concatenate(
            [np.asarray(stores[s].fields[f]) for s in sets], axis=0
        )
    meta = {
        "kind": "motionx_contact",
        "item_store_row": np.asarray(rows, dtype=np.int32),
        "n_items": len(rows),
        "sigma": float(dataset.sigma),
        "use_raw_dist": bool(dataset.use_raw_dist),
        "rotate": rotate,
        "use_color": use_color,
        "mean": np.asarray(dataset.mean, dtype=np.float32),
        "std": np.asarray(dataset.std, dtype=np.float32),
    }
    return _finish_contact_store(cls_, host, meta, max_bytes)


def _draw_batch_contact(store, dataset, item_ids, rnd=random, npr=np.random):
    """Stage-1 host draws: caption choice (+ rotation angle for motionx)."""
    B = len(item_ids)
    captions = []
    rows = np.zeros((B,), np.int32)
    h3d = store.meta["kind"] == "h3d_contact"
    angle = np.zeros((B,), np.float32) if store.meta["rotate"] else None
    srows = store.meta.get("item_store_row")
    for j, idx in enumerate(item_ids):
        resolved = dataset.indices[idx]
        if h3d:
            name = dataset.name_list[resolved]
            captions.append(
                dataset._pick_caption(dataset.data_dict[name]["text"], rnd)["caption"])
            rows[j] = resolved
        else:
            s, i, _sid, _tr, desc = dataset.all_data[resolved]
            captions.append(dataset._pick_text(desc, rnd))
            rows[j] = srows[resolved]
        if angle is not None:
            angle[j] = npr.uniform(-1.0, 1.0) * np.pi
    out = {"item_row": rows, "c_text": captions}
    if angle is not None:
        out["aug_angle"] = angle
    return out


def _make_assemble_contact(store: DeviceStore):
    A = store.arrays
    sigma = store.meta["sigma"]
    use_raw = store.meta["use_raw_dist"]
    use_color = store.meta["use_color"]
    h3d = store.meta["kind"] == "h3d_contact"
    mean = jnp.asarray(store.meta["mean"], dtype=jnp.float32)
    std = jnp.asarray(store.meta["std"], dtype=jnp.float32)

    def assemble(batch: Dict[str, jnp.ndarray]):
        rows = batch["item_row"]
        s_rows = jnp.take(A["scene_row"], rows) if h3d else rows
        contact = store.fetch("dist32", s_rows)
        if not use_raw:
            contact = jnp.exp(-0.5 * contact ** 2 / sigma ** 2)
        x = (contact - mean) / std

        xyz = store.fetch("xyz16", s_rows).astype(jnp.float32)
        if "aug_angle" in batch:
            ang = batch["aug_angle"].astype(jnp.float32)
            c = jnp.cos(ang)[:, None]
            s = jnp.sin(ang)[:, None]
            x0, x1, x2 = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            xyz = jnp.stack([c * x0 - s * x1, s * x0 + c * x1, x2], axis=-1)
        cond = {
            "text_emb": batch["text_emb"],
            "c_pc_xyz": xyz.astype(jnp.float16),
        }
        if not h3d:
            if use_color:
                feat = (store.fetch("rgb16", s_rows).astype(jnp.float32)
                        + 1.0) / 2.0
            else:
                feat = jnp.zeros(xyz.shape[:-1] + (0,), dtype=jnp.float32)
            cond["c_pc_feat"] = feat.astype(jnp.float16)
        for k in A:
            if k.startswith("geo_"):  # fps wire + cached hierarchy fields
                cond[k] = store.fetch(k, s_rows)
        return x.astype(jnp.float32), cond

    return assemble


DeviceStore._try_build_h3d_contact = classmethod(_build_h3d_contact)
DeviceStore._try_build_motionx_contact = classmethod(_build_motionx_contact)
