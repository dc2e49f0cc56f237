"""Pallas TPU kernels for neighbourhood row gather / scatter-add.

XLA's row gather on TPU is per-row-overhead bound (~27 ms to gather 2M
67-channel rows at batch 32 on v5e; its scatter-add transpose ~57 ms).
These kernels stream the index tiles through SMEM and do sequential
VMEM-row copies / read-modify-writes, measured 2.4x (gather) and 3.5x
(scatter-add) faster. Together they wrap into a custom-VJP ``gather_rows``
that the PointTransformer layers call for every kNN neighbourhood —
the hottest memory op in the framework.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # interpret mode runs the kernel semantics in pure JAX — slow, but it
    # lets the CPU test suite cover the kernel logic
    return jax.default_backend() != "tpu"


def _pick_tile(m: int, max_tile: int = 256) -> int:
    t = min(max_tile, m)
    while m % t != 0:
        t -= 1
    return t


def _gather_kernel(K: int, T: int, U: int, idx_ref, x_ref, o_ref):
    """idx (T, K) SMEM; x (N, C) VMEM; out (T*K, C) VMEM.

    The copy loop is issue-rate bound on the scalar core; manually
    unrolling U tile-rows per iteration (Mosaic's fori_loop only supports
    full or no unroll) measured 11.5 -> 10.1 ms on the 2M-row L0 gather.
    Output rows are distinct, so unrolling is hazard-free (unlike the
    scatter's read-modify-write, which measured no gain)."""

    def body(iu, _):
        for du in range(U):
            i = iu * U + du

            def inner(k, _, i=i):
                j = idx_ref[i, k]
                o_ref[pl.ds(i * K + k, 1), :] = x_ref[pl.ds(j, 1), :]
                return 0

            lax.fori_loop(0, K, inner, 0, unroll=True)
        return 0

    lax.fori_loop(0, T // U, body, 0)


def _scatter_kernel(K: int, T: int, idx_ref, g_ref, o_ref):
    """idx (T, K) SMEM; grads (T*K, C) VMEM; out (N, C) VMEM accumulated
    across sequential grid steps."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, _):
        def inner(k, _):
            j = idx_ref[i, k]
            o_ref[pl.ds(j, 1), :] = o_ref[pl.ds(j, 1), :] + g_ref[pl.ds(i * K + k, 1), :]
            return 0

        return lax.fori_loop(0, K, inner, 0, unroll=True)

    lax.fori_loop(0, T, body, 0)


def fits_vmem(n: int, c: int, k: int) -> bool:
    """The kernel keeps the full (N, C) f32 source block in VMEM (and
    Mosaic double-buffers it); oversized sources must use the XLA path."""
    return 2 * n * c * 4 + 2 * 128 * k * c * 4 <= 14 * 1024 * 1024


def _gather_fwd_impl(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    B, N, C = x.shape
    _, M, K = idx.shape
    # cap the (T*K, C) output block so its double-buffered VMEM footprint
    # (plus the double-buffered (N, C) source block) stays in budget, and
    # T itself so the SMEM index tile (lane-padded per row) fits 1M SMEM
    vmem_left = 7 * 1024 * 1024 - N * C * 4
    t_vmem = max(1, vmem_left // max(1, K * C * 4))
    T = _pick_tile(M, max_tile=min(512, max(1, 4096 // K), t_vmem))
    U = 4 if T % 4 == 0 else (2 if T % 2 == 0 else 1)
    call = pl.pallas_call(
        functools.partial(_gather_kernel, K, T, U),
        grid=(M // T,),
        out_shape=jax.ShapeDtypeStruct((M * K, C), x.dtype),
        in_specs=[
            pl.BlockSpec((T, K), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, C), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T * K, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )
    return jax.vmap(call)(idx, x).reshape(B, M, K, C)


def _scatter_add_impl(g: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    B, M, K, C = g.shape
    T = _pick_tile(M)
    call = pl.pallas_call(
        functools.partial(_scatter_kernel, K, T),
        grid=(M // T,),
        out_shape=jax.ShapeDtypeStruct((n, C), g.dtype),
        in_specs=[
            pl.BlockSpec((T, K), lambda gi: (gi, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T * K, C), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, C), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )
    return jax.vmap(call)(idx, g.reshape(B, M * K, C))


@jax.custom_vjp
def _gather_rows_f32(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return _gather_fwd_impl(x, idx)


def _gather_bf16_fwd_impl(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """bf16 rows break Mosaic's (16, 128) tile alignment for single-row
    dynamic slices. The kernel is per-row-overhead bound (row WIDTH is
    nearly free), so casting through f32 costs nothing — measured identical
    to the pure-f32 gather, and faster than a bitcast-packed half-width
    variant whose pack/unpack add whole HBM passes."""
    return _gather_fwd_impl(x.astype(jnp.float32), idx).astype(jnp.bfloat16)


@jax.custom_vjp
def _gather_rows_bf16(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return _gather_bf16_fwd_impl(x, idx)


def _gather_rows_bf16_fwd(x, idx):
    return _gather_bf16_fwd_impl(x, idx), (idx, x.shape[1])


def _gather_rows_bf16_bwd(res, g):
    # the packed-f32 trick is fwd-only: summing two bf16s bitcast into one
    # f32 is garbage, so the scatter-add runs in real f32 at full width
    idx, n = res
    return _scatter_add_impl(g.astype(jnp.float32), idx, n).astype(jnp.bfloat16), None


_gather_rows_bf16.defvjp(_gather_rows_bf16_fwd, _gather_rows_bf16_bwd)


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C), (B, M, K) int32 -> (B, M, K, C) with a Pallas forward and
    Pallas scatter-add backward. f32 natively; bf16 via cast-through-f32
    forward + f32 scatter backward (see _gather_bf16_fwd_impl)."""
    if not fits_vmem(x.shape[1], x.shape[2], idx.shape[2]):
        return jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)
    if x.dtype == jnp.float32:
        return _gather_rows_f32(x, idx)
    if x.dtype == jnp.bfloat16:
        return _gather_rows_bf16(x, idx)
    return jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(x, idx)


def _gather_rows_fwd(x, idx):
    return _gather_fwd_impl(x, idx), (idx, x.shape[1])


def _gather_rows_bwd(res, g):
    idx, n = res
    return _scatter_add_impl(g, idx, n), None


_gather_rows_f32.defvjp(_gather_rows_fwd, _gather_rows_bwd)
