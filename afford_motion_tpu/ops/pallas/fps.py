"""Pallas TPU kernel for farthest point sampling.

FPS is inherently sequential (each selection depends on the running
min-distance field), which makes it loop-overhead-bound as plain XLA ops
(~380 ms for 8192->2048 at batch 32 on v5e). This kernel keeps the whole
greedy loop VMEM-resident: the (3, N) coordinates and the (1, N) running
min-distance field never leave VMEM, and each iteration is a handful of
VPU ops + one argmax. Exact same selection rule as ops.pointops.
farthest_point_sampling (start at index 0, maximize min squared distance).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(num_samples: int, xyz_ref, out_ref):
    """xyz_ref: (3, N) f32 VMEM; out_ref: (1, M) int32 VMEM."""
    xyz = xyz_ref[:]                       # (3, N), stays in registers/VMEM
    n = xyz.shape[1]
    out_cols = lax.broadcasted_iota(jnp.int32, (1, num_samples), 1)
    in_cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, state):
        min_d, sel, last = state
        # extract the last-selected point by one-hot reduction (dynamic
        # lane-index loads don't lower on TPU Pallas)
        onehot = (in_cols == last).astype(jnp.float32)        # (1, N)
        p = jnp.sum(xyz * onehot, axis=1, keepdims=True)      # (3, 1)
        delta = xyz - p
        d = jnp.sum(delta * delta, axis=0, keepdims=True)    # (1, N)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d[0]).astype(jnp.int32)
        sel = jnp.where(out_cols == i, nxt, sel)             # one-hot update
        return min_d, sel, nxt

    init = (
        jnp.full((1, n), jnp.inf, dtype=jnp.float32),
        jnp.zeros((1, num_samples), dtype=jnp.int32),
        jnp.int32(0),
    )
    _, sel, _ = lax.fori_loop(1, num_samples, body, init)
    out_ref[:] = sel


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(points: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, num_samples) int32 via the VMEM-resident kernel."""
    B, N, _ = points.shape
    xyz_t = jnp.transpose(points, (0, 2, 1)).astype(jnp.float32)  # (B, 3, N)

    kernel = functools.partial(_fps_kernel, num_samples)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, num_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.vmap(call)(xyz_t)[:, 0, :]
