"""Banded (windowed) neighborhood kernels for Morton-ordered clouds.

With points stored in Morton order (ops/morton.py, prepare.py sort), kNN
neighbors are index-local: ~90-95% of true 8-NN at N=8192 fall within a
+-512-row window. These kernels make the *window* the neighborhood
definition ("windowed kNN" — the same approximation class as the default
``approx_min_k`` kNN, documented in PARITY.md):

- ``knn_banded``: per query tile, distances against a (S = T·ratio + 2W)
  support slice instead of all N — ~6x less distance/top-k work at l0;
- ``gather_banded``: neighborhood gather as a dense one-hot **matmul on
  the MXU** over the window slice — replaces the scalar-issue-bound
  row-copy loop (ops/pallas/gather.py, ~4 cycles/row, the hottest op in
  the PointTransformer stack);
- its VJP ``scatter_banded``: the transposed one-hot matmul, accumulated
  into per-tile window slices and folded with static XLA adds.

Because every index produced by ``knn_banded`` lies in its tile's window
by construction, the gather/scatter pair is *exact* for those indices —
the only approximation in the system is the windowed neighborhood itself.

There is NO process-global on/off state: bandedness is carried explicitly
— ``model.use_banded`` -> ``add_hierarchies`` -> the ``LevelGeometry.banded``
static field -> per-call ``banded=`` arguments of ``bgather``/``_knn_auto``
(the TrainLoop turns it on when the packed store reports Morton-sorted data
and geometry ships as fps-only). A flag threaded through the pytree aux
data also makes jit caching correct by construction: toggling it retraces.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def available() -> bool:
    """Banded kernels run compiled on TPU only (interpret mode is for
    tests); routers call this in addition to the explicit ``banded`` flag."""
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


TQ = 128  # query rows per tile (all level sizes are multiples of 128)

# The window-width knob W0 (the W policy's level-0 value, multiple of 128;
# default 128 since round 3) and the adaptive-starts toggle are CONFIG
# values — ``model.banded_window`` / ``model.banded_adaptive`` in the model
# yamls, threaded to the kernels exactly like ``use_banded`` (model field
# -> add_hierarchies -> LevelGeometry static fields -> per-call arguments).
# The AM_BANDED_* env vars are DEBUG overrides only (quick A/B without a
# config edit); they take precedence when set.
#
# Why the knob matters: smaller windows are faster but replace more true
# neighbors with in-window ones (hilbert L0 recall: .932 at W=128, .949 at
# W=256, .965 at W=512; adaptive starts recover most of the cross-level
# loss — docs/PERF.md window-locality study). The one-hot gather/scatter
# matmuls — the dominant step FLOPs — scale with the window slice S, so
# flagship train measures 12.05 (W=128+adaptive) / 11.73 (W=256+adaptive) /
# 10.7 (W=512) steps/s. Accuracy evidence: docs/PARITY.md (paired A/B).
import os as _os


def resolve_window(cfg_value: int = 0) -> int:
    """W0 precedence: AM_BANDED_WINDOW (debug override) > config value
    (``model.banded_window``; 0 = unset) > 128 (the round-3 default)."""
    env = int(_os.environ.get("AM_BANDED_WINDOW", "0") or 0)
    v = env or int(cfg_value or 0) or 128
    return max(128, (v // 128) * 128)


def resolve_adaptive(cfg_value=None) -> bool:
    """Adaptive per-item window starts (FPS density varies per scene;
    centering cross-level windows on each query tile's actual fps_idx span
    measured down-level in-window recall .87 -> .93 at the same S —
    docs/PERF.md "window-locality study"; default ON since round 3).
    Precedence: AM_BANDED_ADAPTIVE (debug override) > config value
    (``model.banded_adaptive``; None = unset) > True."""
    env = _os.environ.get("AM_BANDED_ADAPTIVE")
    if env is not None and env != "":
        return env != "0"
    return True if cfg_value is None else bool(cfg_value)


def window_width(n_support: int, w0: int = 0) -> int:
    """W policy: scale with support size, clamped to [128, W0], multiple
    of 128. ``w0=0`` resolves to the env/default policy (resolve_window)."""
    w0 = resolve_window(w0)
    return max(128, min(w0, (n_support // 16) // 128 * 128))


def window_starts(m: int, n: int, w: int) -> Tuple[List[int], int]:
    """Static per-tile window starts + window size S for M query rows over
    N support rows. Window center tracks the proportional position
    (curve order is preserved across FPS levels via sorted fps_idx)."""
    ratio = n / m
    s = min(n, ((int(TQ * ratio) + 2 * w + 127) // 128) * 128)
    starts = []
    for t in range(m // TQ):
        c = int(t * TQ * ratio) - w
        c = max(0, min(n - s, c))
        starts.append((c // 128) * 128)
    return starts, s


def _starts_array(b: int, m: int, n: int, w0: int = 0) -> jnp.ndarray:
    """Proportional starts as a rank-1 (G,) operand — the static policy
    values. Kernels read rank-1 starts per tile (the round-1 compiled
    path, bit-identical) and rank-2 (B, G) starts per item+tile."""
    del b
    starts, _ = window_starts(m, n, window_width(n, w0))
    return jnp.asarray(starts, dtype=jnp.int32)


def _read_start(starts_ref, b, t):
    """Per-tile window start from a rank-1 (static policy) or rank-2
    (per-item adaptive) SMEM starts operand."""
    if len(starts_ref.shape) == 1:
        return pl.multiple_of(starts_ref[t], 128)
    return pl.multiple_of(starts_ref[b, t], 128)


def _clip_round_starts(center: jnp.ndarray, n: int, s: int) -> jnp.ndarray:
    """center (B, G) -> window starts: clipped to [0, n-s], 128-aligned."""
    st = jnp.clip(center - s // 2, 0, n - s)
    return (st // 128 * 128).astype(jnp.int32)


def adaptive_down_starts(fps_idx: jnp.ndarray, n_support: int,
                         w0: int = 0) -> jnp.ndarray:
    """Window starts for cross-level queries (FPS level -> parent level):
    center each query tile's window on the tile's actual span of parent
    curve positions (fps_idx is sorted ascending). (B, M) -> (B, G)."""
    B, M = fps_idx.shape
    _, s = window_starts(M, n_support, window_width(n_support, w0))
    lo = fps_idx[:, 0::TQ].astype(jnp.int32)          # (B, G)
    hi = fps_idx[:, TQ - 1::TQ].astype(jnp.int32)     # (B, G)
    return _clip_round_starts((lo + hi) // 2, n_support, s)


def adaptive_up_starts(fps_idx: jnp.ndarray, m_fine: int,
                       w0: int = 0) -> jnp.ndarray:
    """Window starts for parent-level queries over the coarse level (3-NN
    up-interpolation): center each fine tile's window on where its rows
    land in the coarse curve order (searchsorted into sorted fps_idx)."""
    B, n_coarse = fps_idx.shape
    _, s = window_starts(m_fine, n_coarse, window_width(n_coarse, w0))
    g = m_fine // TQ
    tile_centers = jnp.arange(g, dtype=jnp.int32) * TQ + TQ // 2   # (G,)
    center = jax.vmap(
        lambda f: jnp.searchsorted(f, tile_centers).astype(jnp.int32)
    )(fps_idx.astype(jnp.int32))
    return _clip_round_starts(center, n_coarse, s)


def knn_supports(m: int, n: int, k: int) -> bool:
    return (
        m % TQ == 0
        and n % 128 == 0
        and 256 <= n <= 8192
        and k < 64
    )


def gather_supports(m: int, n: int, c: int, k: int, itemsize: int,
                    w0: int = 0) -> bool:
    """Banded gather/scatter applicability. Valid either when the window
    covers the whole support (s == n: exact for any indices) or when the
    indices came from knn_banded with the same window geometry."""
    if m % TQ != 0 or n % 128 != 0 or n > 8192 or k >= 64:
        return False
    _, s = window_starts(m, n, window_width(n, w0))
    x_bytes = n * c * itemsize
    onehot_bytes = TQ * k * s * itemsize
    out_bytes = TQ * k * c * itemsize
    return x_bytes + onehot_bytes + 2 * out_bytes <= 12 * 1024 * 1024


# ----------------------------------------------------------------- kNN
_IDX_BITS = 13
_IDX_MASK = (1 << _IDX_BITS) - 1


def _knn_kernel(k: int, s: int, starts_ref, q_ref, sT_ref, idx_ref, dist_ref):
    """starts (G,)|(B, G) SMEM; q (1, TQ, 3); sT (1, 3, N); out (1, TQ, k)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = _read_start(starts_ref, b, t)
    q = q_ref[0]                               # (TQ, 3)
    sw = sT_ref[0, :, pl.ds(start, s)]         # (3, S) window slice

    d = None
    for c in range(3):
        qc = q[:, c:c + 1]
        sc = sw[c:c + 1, :]
        tt = qc - sc
        tt = tt * tt
        d = tt if d is None else d + tt        # (TQ, S)

    col = lax.broadcasted_iota(jnp.int32, (TQ, s), 1)
    bits = lax.bitcast_convert_type(d, jnp.int32)
    packed = (bits & jnp.int32(~_IDX_MASK)) | col
    for j in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)
        idx_ref[0, :, j] = (m & jnp.int32(_IDX_MASK))[:, 0] + start
        dq = lax.bitcast_convert_type(m & jnp.int32(~_IDX_MASK), jnp.float32)
        dist_ref[0, :, j] = jnp.sqrt(jnp.maximum(dq[:, 0], 0.0))
        packed = jnp.where(packed == m, jnp.int32(0x7FFFFFFF), packed)


@functools.partial(jax.jit, static_argnums=(2, 4))
def knn_banded(query: jnp.ndarray, support: jnp.ndarray, k: int,
               starts: jnp.ndarray | None = None, w0: int = 0):
    """(B, M, 3), (B, N, 3) -> absolute idx (B, M, k) int32, sqrt dist.
    Neighbors restricted to each tile's curve window. ``starts`` (B, G)
    overrides the proportional per-tile window starts (128-aligned, in
    [0, N-S]) — the adaptive centering for cross-level queries. ``w0``:
    window-width knob (0 = env/default policy)."""
    B, M, _ = query.shape
    N = support.shape[1]
    w = window_width(N, w0)
    _, s = window_starts(M, N, w)
    starts_arr = _starts_array(B, M, N, w0) if starts is None else starts
    q = query.astype(jnp.float32)
    sT = jnp.transpose(support, (0, 2, 1)).astype(jnp.float32)

    idx, dist = pl.pallas_call(
        functools.partial(_knn_kernel, k, s),
        grid=(B, M // TQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TQ, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, k), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, k), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, k), jnp.int32),
            jax.ShapeDtypeStruct((B, M, k), jnp.float32),
        ],
        interpret=_interpret(),
    )(starts_arr, q, sT)
    return idx, dist


# ----------------------------------------------------------- gather/scatter
def _onehot(idx_block, start, K, s, dtype):
    """(TQ, K) absolute indices -> (TQ*K, s) one-hot over the window.
    Built at rank 3 then merged on the leading dims (minor dim untouched —
    a layout-free reshape)."""
    rel3 = idx_block - start                                # (TQ, K)
    col3 = lax.broadcasted_iota(jnp.int32, (TQ, K, s), 2)
    oh = (col3 == rel3[:, :, None]).astype(dtype)           # (TQ, K, s)
    return oh.reshape(TQ * K, s)


def _dot_precision(dtype) -> lax.Precision:
    """TPU MXU default precision rounds f32 operands to bf16 — for a
    one-hot SELECTION matmul that silently degrades gathered f32 data to
    bf16 (caught by the compiled-kernel tier, tests_tpu/). HIGHEST makes
    the f32 path exact (1.0-one-hot x bf16x3-split recovers f32 bit-for-
    bit); bf16 operands stay on the fast single pass either way."""
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


def _gather_kernel(K: int, s: int, starts_ref, idx_ref, x_ref, o_ref):
    """starts (G,)|(B, G) SMEM; idx (1, TQ, K) VMEM; x (1, N, C); o (1, TQ*K, C)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = _read_start(starts_ref, b, t)
    xw = x_ref[0, pl.ds(start, s), :]                       # (S, C)
    onehot = _onehot(idx_ref[0], start, K, s, xw.dtype)     # (TQ*K, S)
    o_ref[0] = jax.lax.dot_general(
        onehot, xw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(xw.dtype),
    ).astype(o_ref.dtype)


def _scatter_kernel(K: int, s: int, starts_ref, idx_ref, g_ref, o_ref):
    """Transposed one-hot matmul: o (1, 1, S, C) per-tile window slice."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = _read_start(starts_ref, b, t)
    g = g_ref[0]                                            # (TQ*K, C)
    onehot = _onehot(idx_ref[0], start, K, s, g.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        onehot, g, (((0,), (0,)), ((), ())),                # (S, C)
        preferred_element_type=jnp.float32,
        precision=_dot_precision(g.dtype),
    ).astype(o_ref.dtype)


def _gather_banded_impl(x: jnp.ndarray, idx: jnp.ndarray,
                        starts_arr: jnp.ndarray, w0: int = 0) -> jnp.ndarray:
    B, N, C = x.shape
    _, M, K = idx.shape
    _, s = window_starts(M, N, window_width(N, w0))
    out = pl.pallas_call(
        functools.partial(_gather_kernel, K, s),
        grid=(B, M // TQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TQ, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ * K, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M * K, C), x.dtype),
        interpret=_interpret(),
    )(starts_arr, idx, x)
    return out.reshape(B, M, K, C)


def _scatter_banded_impl(g: jnp.ndarray, idx: jnp.ndarray,
                         starts_arr: jnp.ndarray, n: int,
                         w0: int = 0) -> jnp.ndarray:
    B, M, K, C = g.shape
    _, s = window_starts(M, n, window_width(n, w0))
    G = M // TQ
    # Scatter-add accumulates in f32 regardless of g.dtype: the per-tile
    # matmul partials and the overlapping-window fold sum many bf16 terms
    # per support row, and this is the hottest backward op (matching the
    # row-loop kernel's deliberate f32 scatter, ops/pallas/gather.py).
    tiles = pl.pallas_call(
        functools.partial(_scatter_kernel, K, s),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TQ, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ * K, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, s, C), jnp.float32),
        interpret=_interpret(),
    )(starts_arr, idx, g.reshape(B, M * K, C))
    if starts_arr.ndim == 1:
        # static proportional starts: fold with static dynamic-update adds
        # (the round-1 compiled path, unchanged)
        starts, _ = window_starts(M, n, window_width(n, w0))
        dx = jnp.zeros((B, n, C), dtype=jnp.float32)
        for t, st in enumerate(starts):
            dx = dx.at[:, st: st + s, :].add(tiles[:, t])
        return dx.astype(g.dtype)
    # Per-item starts: fold overlapping per-tile windows into (B, n, C)
    # with ONE block-level one-hot einsum over 128-row blocks — handles
    # dynamic offsets and replaces G serial read-modify-write slice-adds
    # with an MXU matmul whose FLOPs are negligible:
    # B*G*(S/128)*(n/128)*(128C)*2.
    kb, nb = s // 128, n // 128
    blocks = starts_arr // 128                                    # (B, G)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, kb, nb), 3)
        - jax.lax.broadcasted_iota(jnp.int32, (1, 1, kb, nb), 2)
        == blocks[:, :, None, None]
    ).astype(jnp.float32)                                         # (B,G,kb,nb)
    tiles_b = tiles.reshape(B, G, kb, 128 * C)
    # tiles are the f32 accumulators — HIGHEST keeps the fold from
    # rounding them to bf16 on the MXU (negligible FLOPs either way)
    dx = jnp.einsum(
        "bgkn,bgkd->bnd", oh, tiles_b,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ).reshape(B, n, C)
    return dx.astype(g.dtype)


def gather_banded(x: jnp.ndarray, idx: jnp.ndarray,
                  starts: jnp.ndarray | None = None,
                  w0: int = 0) -> jnp.ndarray:
    """(B, N, C), (B, M, K) int32 (window-local absolute indices) ->
    (B, M, K, C). Exact for indices produced by knn_banded with the SAME
    ``starts`` and ``w0``.

    INVARIANT: every index in row block t of item b must lie inside that
    tile's curve window [starts[b, t], starts[b, t] + S) for the *same*
    (M, N, w0) geometry (``window_starts(M, N, window_width(N, w0))``;
    ``starts`` defaults to the proportional policy). Out-of-window indices
    silently produce zero rows (the one-hot has no hit), so call sites must
    only feed indices from ``knn_banded`` with matching shapes/starts/w0 —
    or shapes where S == N (full window: exact for any indices).
    Set ``AM_BANDED_DEBUG=1`` to assert containment on concrete (eager /
    interpret-mode) calls — a host-side test/debug check; traced calls
    skip it."""
    if starts is None:
        starts = _starts_array(x.shape[0], idx.shape[1], x.shape[1], w0)
    if (
        _os.environ.get("AM_BANDED_DEBUG", "") == "1"
        and not isinstance(idx, jax.core.Tracer)
        and not isinstance(starts, jax.core.Tracer)
    ):
        import numpy as _np

        _, M, K = idx.shape
        N = x.shape[1]
        _, s = window_starts(M, N, window_width(N, w0))
        st2 = _np.atleast_2d(_np.asarray(starts, dtype=_np.int32))
        rel = _np.asarray(idx) - _np.repeat(st2, TQ, axis=1)[:, :, None]
        assert bool(((rel >= 0) & (rel < s)).all()), (
            "gather_banded: index outside its curve window "
            f"(M={M}, N={N}, S={s})"
        )
    return _gather_banded_vjp(x, idx, starts, w0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_banded_vjp(x, idx, starts, w0):
    return _gather_banded_impl(x, idx, starts, w0)


def _gather_banded_fwd(x, idx, starts, w0):
    return _gather_banded_impl(x, idx, starts, w0), (idx, starts, x.shape[1])


def _gather_banded_bwd(w0, res, g):
    idx, starts, n = res
    return _scatter_banded_impl(g, idx, starts, n, w0), None, None


_gather_banded_vjp.defvjp(_gather_banded_fwd, _gather_banded_bwd)
