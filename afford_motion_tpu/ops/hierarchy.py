"""Precomputed multi-resolution point geometry.

The reference recomputes FPS + kNN inside every PointTransformer layer, per
forward pass (reference: pointtransformer.py:29-30,61-63 — each of the
[2,3,4,6,3] blocks re-runs queryandgroup on identical coordinates). All of
that geometry depends only on the point coordinates, not on features, so a
TPU-first design computes it ONCE per batch into a ``LevelGeometry`` pytree
and feeds it to every layer. During diffusion sampling the condition point
cloud is constant across the whole denoising chain, so the hierarchy is
hoisted entirely out of the ``lax.scan``.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from .pointops import batched_fps, batched_knn, interpolation_weights


def _knn_auto(query: jnp.ndarray, support: jnp.ndarray, k: int,
              banded_on: bool = False, method: Optional[str] = None,
              starts: Optional[jnp.ndarray] = None, window: int = 0):
    """Windowed (banded) kNN on curve-ordered data when requested (and
    the shapes/backend support it), full kNN otherwise. Both bandedness
    and the kNN method are explicit per-call arguments — no process-global
    state. ``method='exact'`` is the bit-exact reference-parity path
    (no Pallas packed-bits kernel, no approx_min_k). ``starts`` (B, G)
    overrides the per-tile window starts (adaptive centering); ``window``
    is the W0 width knob (0 = env/default policy)."""
    from .pallas import banded

    if (
        banded_on
        and banded.available()
        and banded.knn_supports(query.shape[1], support.shape[1], k)
    ):
        return banded.knn_banded(query, support, k, starts, window)
    return batched_knn(query, support, k, method)


def _adaptive_starts(fps_idx, m_query: int, n_support: int, k: int,
                     banded_on: bool, kind: str, window: int = 0,
                     adaptive: Optional[bool] = None):
    """Per-item window starts for cross-level banded ops, or None whenever
    the banded kernel would not engage (the gating mirrors _knn_auto so a
    fallback exact kNN is never paired with windowed gathers). Pure
    function of fps_idx — recomputed identically at geometry build, cache
    upload, and in-step rebuild (the containment invariant's anchor)."""
    from .pallas import banded

    if (
        fps_idx is None
        or not banded_on
        or not banded.resolve_adaptive(adaptive)
        or not banded.available()
        or not banded.knn_supports(m_query, n_support, k)
    ):
        return None
    if kind == "down":
        return banded.adaptive_down_starts(fps_idx, n_support, window)
    return banded.adaptive_up_starts(fps_idx, m_query, window)


@struct.dataclass
class LevelGeometry:
    """Geometry of one resolution level of the point hierarchy.

    All index arrays are per-batch (leading B dim). Fields that don't apply
    to level 0 are None.
    """

    xyz: jnp.ndarray                     # (B, N_l, 3)
    knn_idx: jnp.ndarray                 # (B, N_l, k) neighbours within this level
    fps_idx: Optional[jnp.ndarray]       # (B, N_l) indices into the parent level
    down_knn_idx: Optional[jnp.ndarray]  # (B, N_l, k) neighbours in the parent level
    up_idx: Optional[jnp.ndarray]        # (B, N_parent, 3) this-level NNs of parent points
    up_weight: Optional[jnp.ndarray]     # (B, N_parent, 3) inverse-distance weights
    # per-item adaptive window starts for the banded cross-level ops
    # (None = proportional policy); pure functions of fps_idx, attached
    # wherever the geometry is (re)built so kNN indices and gathers always
    # share the same windows (ops/pallas/banded.py ADAPTIVE)
    down_starts: Optional[jnp.ndarray] = None  # (B, N_l // TQ)
    up_starts: Optional[jnp.ndarray] = None    # (B, N_parent // TQ)
    # STATIC aux data (not a pytree leaf): the index fields above came from
    # the banded windowed kNN, so neighbourhood gathers may use the banded
    # one-hot-matmul kernels. Part of the jit cache key by construction.
    banded: bool = struct.field(pytree_node=False, default=False)
    # W0 window-width knob the indices were built with (model.banded_window;
    # 0 = env/default policy) — gathers MUST use the same width or the
    # containment invariant breaks. Static for the same reason as banded.
    window: int = struct.field(pytree_node=False, default=0)

    @property
    def num_points(self) -> int:
        return self.xyz.shape[1]


def _level_geom(
    parent_xyz: jnp.ndarray,
    stride: int,
    nsample: int,
    with_up: bool,
    banded: bool = False,
    sort_fps: bool = False,
    knn_method: Optional[str] = None,
    window: int = 0,
    adaptive: Optional[bool] = None,
) -> LevelGeometry:
    """Batched geometry for one downsampling step ((B, N, 3) arrays)."""
    n = parent_xyz.shape[1]
    if stride == 1:
        xyz = parent_xyz
        fps_idx = None
        down_knn_idx = None
        down_starts = None
    else:
        m = n // stride
        fps_idx = batched_fps(parent_xyz, m)
        if banded or sort_fps:
            # ascending order: a pure relabeling of the FPS *set* that
            # keeps a Morton-ordered parent's spatial locality in the
            # child level (the banded kernels' window assumption). The
            # DEFAULT keeps the CUDA kernel's greedy selection order
            # (reference: pointtransformer.py:61-62) — downstream token
            # consumers are order-sensitive (the CMDM adds positional
            # encodings to the SceneMap group tokens, cmdm.py:164-166),
            # so converted reference checkpoints only reproduce exactly
            # in selection order (tests/test_golden_parity.py).
            fps_idx = jnp.sort(fps_idx, axis=-1)
        xyz = jnp.take_along_axis(parent_xyz, fps_idx[..., None], axis=1)
        down_starts = _adaptive_starts(fps_idx, m, n, nsample, banded, "down",
                                       window, adaptive)
        down_knn_idx, _ = _knn_auto(xyz, parent_xyz, nsample, banded,
                                    knn_method, down_starts, window)

    knn_idx, _ = _knn_auto(xyz, xyz, nsample, banded, knn_method,
                           window=window)

    up_idx = up_weight = up_starts = None
    if with_up and stride != 1:
        up_starts = _adaptive_starts(fps_idx, n, xyz.shape[1], 3, banded, "up",
                                     window, adaptive)
        up_idx, up_dist = _knn_auto(parent_xyz, xyz, 3, banded, knn_method,
                                    up_starts, window)
        up_weight = interpolation_weights(up_dist)

    return LevelGeometry(
        xyz=xyz,
        knn_idx=knn_idx,
        fps_idx=fps_idx,
        down_knn_idx=down_knn_idx,
        up_idx=up_idx,
        up_weight=up_weight,
        down_starts=down_starts,
        up_starts=up_starts,
        banded=banded,
        window=window,
    )


import functools


def build_point_hierarchy(
    xyz: jnp.ndarray,
    strides: Sequence[int],
    nsamples: Sequence[int],
    *,
    with_up: bool = True,
    banded: bool = False,
    sort_fps: bool = False,
    knn_method: Optional[str] = None,
    window: int = 0,
    adaptive: Optional[bool] = None,
) -> List[LevelGeometry]:
    """Jit-compiled wrapper (eager execution of the FPS/kNN cascade would
    dispatch op-by-op, which is pathological over a remote TPU).

    ``sort_fps`` relabels each level into ascending-index order (implied
    by ``banded``; offline geometry caches also set it so the cached
    indices satisfy the banded wire's window assumption).
    ``window``/``adaptive``: the banded W0 width and adaptive-starts knobs
    (model.banded_window / model.banded_adaptive; 0/None = env+default)."""
    return list(
        _build_point_hierarchy(
            xyz, tuple(strides), tuple(nsamples), with_up=with_up,
            banded=banded, sort_fps=sort_fps, knn_method=knn_method,
            window=window, adaptive=adaptive,
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=("strides", "nsamples", "with_up", "banded", "sort_fps",
                     "knn_method", "window", "adaptive"),
)
def _build_point_hierarchy(
    xyz: jnp.ndarray,
    strides: Sequence[int],
    nsamples: Sequence[int],
    *,
    with_up: bool = True,
    banded: bool = False,
    sort_fps: bool = False,
    knn_method: Optional[str] = None,
    window: int = 0,
    adaptive: Optional[bool] = None,
) -> List[LevelGeometry]:
    """Build the full hierarchy for a batch of clouds, (B, N, 3).

    ``strides``/``nsamples`` follow the encoder definition, e.g. the
    4-level SceneMap encoders use ([1, 4, 4, 4], [8, 16, 16, 16]) and the
    5-level PointTransformerSeg uses ([1, 4, 4, 4, 4], [8, 16, 16, 16, 16])
    (reference: models/modules.py:66, pointtransformer.py:133).
    """
    assert len(strides) == len(nsamples)
    levels = []
    # half-precision wire inputs: FPS/kNN distance math needs f32
    parent = xyz.astype(jnp.float32) if xyz.dtype != jnp.float32 else xyz
    for stride, nsample in zip(strides, nsamples):
        geom = _level_geom(parent, stride, nsample, with_up, banded, sort_fps,
                           knn_method, window, adaptive)
        levels.append(geom)
        parent = geom.xyz
    return levels


def build_point_hierarchy_from_fps(
    xyz: jnp.ndarray,
    arrays: dict,
    strides: Sequence[int],
    nsamples: Sequence[int],
    *,
    prefix: str = "geo",
    with_up: bool = True,
    banded: bool = False,
    knn_method: Optional[str] = None,
    window: int = 0,
    adaptive: Optional[bool] = None,
) -> List[LevelGeometry]:
    """Rebuild the hierarchy from cached FPS indices only, recomputing all
    kNN / up-interpolation on device.

    Rationale: FPS is the *sequential* part (the reason the offline cache
    exists), but its indices are tiny (~5KB/item at N=8192). kNN is
    MXU-friendly distance-matmul + top-k and cheap on device, while its
    cached index arrays are ~60x larger than the FPS indices. On
    bandwidth-bound input pipelines (remote TPU, modest host IO) shipping
    only ``geo_*_fps_idx`` and recomputing kNN here is a large net win.
    Runs under jit (called from add_hierarchies inside the train step).

    PARTIAL caches compose: any ``{prefix}{li}_{knn_idx,down_knn_idx,
    up_idx,up_weight}`` present in ``arrays`` is used as-is and only the
    missing fields are recomputed — the device store's budget-gated
    geometry cache keeps the cheap-to-store deep levels and lets level 0
    rebuild here (train/device_store.py add_geometry_cache).
    """
    def cached(li, field):
        v = arrays.get(f"{prefix}{li}_{field}")
        if v is None:
            return None
        return v.astype(jnp.float32 if field == "up_weight" else jnp.int32)

    levels = []
    parent = xyz.astype(jnp.float32) if xyz.dtype != jnp.float32 else xyz
    for li, (stride, nsample) in enumerate(zip(strides, nsamples)):
        if stride == 1:
            lvl_xyz = parent
            fps_idx = None
            down_knn_idx = None
            down_starts = None
        else:
            fps_idx = arrays[f"{prefix}{li}_fps_idx"].astype(jnp.int32)
            lvl_xyz = jnp.take_along_axis(parent, fps_idx[..., None], axis=1)
            down_starts = _adaptive_starts(
                fps_idx, lvl_xyz.shape[1], parent.shape[1], nsample, banded,
                "down", window, adaptive,
            )
            down_knn_idx = cached(li, "down_knn_idx")
            if down_knn_idx is None:
                down_knn_idx, _ = _knn_auto(lvl_xyz, parent, nsample, banded,
                                            knn_method, down_starts, window)
        knn_idx = cached(li, "knn_idx")
        if knn_idx is None:
            knn_idx, _ = _knn_auto(lvl_xyz, lvl_xyz, nsample, banded,
                                   knn_method, window=window)
        up_idx = up_weight = up_starts = None
        if with_up and stride != 1:
            up_starts = _adaptive_starts(
                fps_idx, parent.shape[1], lvl_xyz.shape[1], 3, banded, "up",
                window, adaptive,
            )
            up_idx = cached(li, "up_idx")
            up_weight = cached(li, "up_weight")
            if up_idx is None or up_weight is None:
                up_idx, up_dist = _knn_auto(parent, lvl_xyz, 3, banded,
                                            knn_method, up_starts, window)
                up_weight = interpolation_weights(up_dist)
        levels.append(LevelGeometry(
            xyz=lvl_xyz, knn_idx=knn_idx, fps_idx=fps_idx,
            down_knn_idx=down_knn_idx, up_idx=up_idx, up_weight=up_weight,
            down_starts=down_starts, up_starts=up_starts,
            banded=banded, window=window,
        ))
        parent = lvl_xyz
    return levels


# ------------------------------------------------- rigid-invariant caching
# Every index/weight field of the hierarchy depends only on pairwise
# distances, so it is INVARIANT to the rigid augmentations the datasets
# apply (RandomRotation / recentering). The geometry can therefore be
# precomputed once per sample offline (prepare.py geometry stage) and fed
# through the batch, skipping the in-step FPS/kNN entirely; only the xyz
# fields are re-gathered from the augmented cloud.

_GEO_FIELDS = ("knn_idx", "fps_idx", "down_knn_idx", "up_idx", "up_weight")


def geometry_to_arrays(levels: List[LevelGeometry], prefix: str = "geo") -> dict:
    """Flatten a (single-sample or batched) hierarchy's index/weight fields
    into a {name: array} dict for npz storage / batch transport."""
    out = {}
    for li, lvl in enumerate(levels):
        for field in _GEO_FIELDS:
            v = getattr(lvl, field)
            if v is not None:
                out[f"{prefix}{li}_{field}"] = v
    return out


def geometry_from_arrays(
    arrays: dict, xyz: jnp.ndarray, num_levels: int, prefix: str = "geo",
    banded: bool = False, window: int = 0, adaptive: Optional[bool] = None,
) -> List[LevelGeometry]:
    """Rebuild LevelGeometry from cached index arrays + the (augmented)
    level-0 coordinates: per-level xyz is re-gathered through the cached
    FPS chains.

    ``banded=True`` marks the cached indices as produced by the banded
    windowed kNN (device-store geometry cache on Morton-sorted clouds) so
    neighbourhood gathers may use the banded one-hot-matmul kernels;
    offline caches from exact kNN (prepare.py geometry) keep the default."""
    levels = []
    parent_xyz = xyz
    for li in range(num_levels):
        def get(field):
            return arrays.get(f"{prefix}{li}_{field}")

        fps_idx = get("fps_idx")
        if fps_idx is not None:
            fps_idx = fps_idx.astype(jnp.int32)
        lvl_xyz = (
            parent_xyz if fps_idx is None
            else jnp.take_along_axis(parent_xyz, fps_idx[..., None], axis=1)
        )
        down_knn_idx = get("down_knn_idx")
        up_idx = get("up_idx")
        # cached banded indices were produced with the same (deterministic,
        # fps_idx-derived) adaptive starts — reattach them for the gathers
        down_starts = up_starts = None
        if fps_idx is not None and down_knn_idx is not None:
            down_starts = _adaptive_starts(
                fps_idx, lvl_xyz.shape[1], parent_xyz.shape[1],
                int(down_knn_idx.shape[-1]), banded, "down", window, adaptive,
            )
        if fps_idx is not None and up_idx is not None:
            up_starts = _adaptive_starts(
                fps_idx, parent_xyz.shape[1], lvl_xyz.shape[1], 3,
                banded, "up", window, adaptive,
            )
        levels.append(LevelGeometry(
            xyz=lvl_xyz,
            knn_idx=get("knn_idx").astype(jnp.int32),
            fps_idx=fps_idx,
            down_knn_idx=None if down_knn_idx is None else down_knn_idx.astype(jnp.int32),
            up_idx=None if up_idx is None else up_idx.astype(jnp.int32),
            up_weight=None if get("up_weight") is None else get("up_weight").astype(jnp.float32),
            down_starts=down_starts, up_starts=up_starts,
            banded=banded, window=window,
        ))
        parent_xyz = lvl_xyz
    return levels
