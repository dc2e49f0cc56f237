"""Pallas TPU kernel for fused 1-NN over large support clouds (SDF physics).

The eval physics metric needs, per frame, the nearest BODY VERTEX of every
scene point (reference: utils/evaluate.py:473-520 smplx_signed_distance —
a torch ``cdist`` + argmin that materializes the (O, H) distance matrix).
The XLA rebuild (eval/physics.py signed_distance_to_body) already fuses
the matmul-form distances with the argmin, but the contraction dim is 3,
so the MXU runs at <3% occupancy and the (O, H) tile traffic bounds the
frame at ~2.4 ms (O=8192, H=10475 — docs/PERF.md round-4 eval section).

This kernel keeps each (TQ, H) distance tile in VMEM, computes EXACT f32
coordinate-difference distances on the VPU, and reduces to (min d2,
first-index argmin) in-place — no packed-mantissa quantization (unlike
ops/pallas/knn.py, which trades ~2^-11 distance bits for k>1 sweeps):
k=1 needs only two reductions, so the result is exact, with jnp.argmin's
first-index tie-break. The support cloud is padded to a multiple of 128
with a +1e6 sentinel coordinate (d2 ~ 3e12, never selected for real data
in metres).

Numerics vs the XLA path: the coordinate-difference form (q-s)^2 is
MORE accurate than the matmul form |q|^2 - 2 q.s + |s|^2 (which loses
bits to cancellation); selections differ only when two vertices tie at
f32 rounding level. ``eval/physics.py`` exposes ``kernel="xla"`` to
restore the previous path bit-for-bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _nn1_kernel(hc: int, q_ref, sT_ref, d2_ref, idx_ref):
    """q_ref: (1, TQ, 3) f32 queries; sT_ref: (1, 3, HC) f32 support
    chunk; d2_ref/idx_ref: (1, TQ) running (min d2, argmin) blocks —
    revisited across the (innermost) support-chunk grid axis, so the
    reduction carries in VMEM. ``hc`` = chunk width (static).

    Output blocks are (1, 8, TQ=128) — Mosaic requires the last two
    block dims to be (multiple of 8, multiple of 128), so the scalar row
    is broadcast over an 8-sublane axis (sliced off outside; the extra
    writeback is ~KBs). The support axis is chunked instead of shrinking
    TQ because TQ is pinned to 128 by the same tiling rule."""
    c = pl.program_id(2)
    q = q_ref[0]                 # (TQ, 3)
    sT = sT_ref[0]               # (3, HC)
    tq = q.shape[0]

    d = None
    for a in range(3):
        t = q[:, a:a + 1] - sT[a:a + 1, :]       # (TQ, HC)
        t = t * t
        d = t if d is None else d + t

    m = jnp.min(d, axis=1, keepdims=True)        # (TQ, 1) exact f32 min
    col = lax.broadcasted_iota(jnp.int32, (tq, hc), 1) + c * hc
    # first GLOBAL index attaining the exact min — jnp.argmin's tie-break:
    # within a chunk the smallest column wins; across chunks a strict <
    # keeps the earlier chunk's winner on exact ties
    idx = jnp.min(jnp.where(d == m, col, jnp.int32(2 ** 30)), axis=1)

    @pl.when(c == 0)
    def _init():
        d2_ref[0] = jnp.broadcast_to(m[:, 0][None], (8, tq))
        idx_ref[0] = jnp.broadcast_to(idx[None], (8, tq))

    @pl.when(c != 0)
    def _combine():
        prev_d = d2_ref[0][0]
        prev_i = idx_ref[0][0]
        better = m[:, 0] < prev_d
        d2_ref[0] = jnp.broadcast_to(
            jnp.where(better, m[:, 0], prev_d)[None], (8, tq))
        idx_ref[0] = jnp.broadcast_to(
            jnp.where(better, idx, prev_i)[None], (8, tq))


_TQ = 128
_VMEM_BUDGET = 12 * 1024 * 1024


def _chunking(h: int) -> tuple:
    """(n_chunks, chunk_width, padded_h): smallest chunk count whose ~3
    live (TQ, HC) f32/i32 planes (d, iota, select temp) fit the ~12MB
    VMEM budget; HC is a multiple of 128 and n_chunks * HC covers h."""
    budget = _VMEM_BUDGET
    n_chunks = 1
    while True:
        hc = -(-h // (n_chunks * 128)) * 128
        if _TQ * hc * 4 * 3 + hc * 16 <= budget:
            return n_chunks, hc, n_chunks * hc
        n_chunks += 1


def supports(o: int, h: int) -> bool:
    """Queries must tile by 128; any support size works (chunked)."""
    return o % _TQ == 0 and h >= 1


@jax.jit
def nn1_pallas(points: jnp.ndarray, verts_seq: jnp.ndarray):
    """points (O, 3) f32, verts_seq (L, H, 3) f32 ->
    d2 (L, O) f32, idx (L, O) int32 — per-frame nearest support vertex.

    Exact distances; ties resolve to the smallest vertex index."""
    O = points.shape[0]
    L, H, _ = verts_seq.shape
    TQ = _TQ
    assert supports(O, H), (O, H)
    n_chunks, hc, h_pad = _chunking(H)

    sT = jnp.transpose(verts_seq, (0, 2, 1)).astype(jnp.float32)  # (L, 3, H)
    if h_pad != H:
        sT = jnp.pad(sT, ((0, 0), (0, 0), (0, h_pad - H)),
                     constant_values=1e6)
    # queries are frame-invariant: one (1, O, 3) operand, block index
    # ignores the frame axis so each tile is fetched once per grid row
    q = points.astype(jnp.float32)[None]

    d2, idx = pl.pallas_call(
        functools.partial(_nn1_kernel, hc),
        # support chunks INNERMOST so the output blocks carry the running
        # (min, argmin) across them in VMEM
        grid=(L, O // TQ, n_chunks),
        in_specs=[
            pl.BlockSpec((1, TQ, 3), lambda f, i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, hc), lambda f, i, c: (f, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, TQ), lambda f, i, c: (f, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TQ), lambda f, i, c: (f, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, 8, O), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, O), jnp.int32),
        ],
        interpret=_interpret(),
    )(q, sT)
    return d2[:, 0], idx[:, 0]
