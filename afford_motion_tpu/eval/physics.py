"""Physics metrics: scene↔body signed distance on device
(reference: utils/evaluate.py:436-520).

The reference computes an O(O·H) pairwise distance between scene points and
SMPL-X vertices per frame in torch; here the whole per-frame computation is
one jitted JAX function (matmul-form pairwise distances on the MXU,
vertex-normal sign trick identical to the reference's smplx_signed_distance).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals, (H, 3) from faces (F, 3) int."""
    fv = verts[faces]                                  # (F, 3, 3)
    e1 = fv[:, 1] - fv[:, 0]
    e2 = fv[:, 2] - fv[:, 0]
    e1 = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-12)
    e2 = e2 / (jnp.linalg.norm(e2, axis=-1, keepdims=True) + 1e-12)
    fn = jnp.cross(e1, e2)                             # (F, 3)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-12)


def signed_distance_to_body(
    points: jnp.ndarray, verts: jnp.ndarray, faces: jnp.ndarray
) -> jnp.ndarray:
    """Signed distance of each scene point to the body surface, (O,).

    Positive = inside the body (penetration), negative = outside — the
    reference's vertex-normal sign convention (evaluate.py:473-520)."""
    vn = vertex_normals(verts, faces)                   # (H, 3)
    p2 = jnp.sum(points * points, axis=-1, keepdims=True)
    v2 = jnp.sum(verts * verts, axis=-1, keepdims=True).T
    # HIGHEST: the TPU MXU default silently rounds f32 operands to bf16
    # (the same bug class tests_tpu caught in the round-3 banded gather —
    # ops/pallas/banded.py _dot_precision); eval numerics must be exact
    cross = jnp.matmul(points, verts.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(p2 - 2.0 * cross + v2, 0.0)        # (O, H)
    dist = jnp.sqrt(d2)
    idx = jnp.argmin(d2, axis=-1)                       # (O,)
    closest = verts[idx]                                # (O, 3)
    to_surface = closest - points
    to_surface = to_surface / (jnp.linalg.norm(to_surface, axis=-1, keepdims=True) + 1e-12)
    same_dir = jnp.sum(to_surface * vn[idx], axis=-1)
    return jnp.sign(same_dir) * jnp.take_along_axis(dist, idx[:, None], axis=-1)[:, 0]


def _resolve_kernel(kernel: str, o: int, h: int) -> str:
    """'auto' -> the fused Pallas 1-NN on TPU when shapes fit, else the
    XLA matmul-form path. AM_SDF_KERNEL=xla|pallas is a debug override."""
    import os

    kernel = os.environ.get("AM_SDF_KERNEL", kernel)
    if kernel == "auto":
        from ..ops.pallas.sdf import supports

        kernel = (
            "pallas"
            if jax.default_backend() == "tpu" and supports(o, h)
            else "xla"
        )
    return kernel


def signed_distance_seq(
    points: jnp.ndarray,       # (O, 3)
    verts_seq: jnp.ndarray,    # (L, H, 3)
    faces: jnp.ndarray,        # (F, 3)
    kernel: str = "auto",
) -> jnp.ndarray:
    """(L, O) signed distances over a sequence. kernel='pallas' fuses the
    per-frame 1-NN in VMEM (ops/pallas/sdf.py — exact f32
    coordinate-difference distances, ~100x less (O, H) tile traffic);
    'xla' is the original matmul-form path, kept bit-for-bit."""
    if kernel not in ("pallas", "xla"):
        kernel = _resolve_kernel(kernel, points.shape[0], verts_seq.shape[1])
    if kernel == "xla":
        return lax.map(
            lambda v: signed_distance_to_body(points, v, faces), verts_seq
        )

    from ..ops.pallas.sdf import nn1_pallas

    d2, idx = nn1_pallas(points, verts_seq)                 # (L, O)
    vn = jax.vmap(lambda v: vertex_normals(v, faces))(verts_seq)
    closest = jax.vmap(lambda v, i: v[i])(verts_seq, idx)   # (L, O, 3)
    vnn = jax.vmap(lambda n, i: n[i])(vn, idx)              # (L, O, 3)
    to_surface = closest - points[None]
    to_surface = to_surface / (
        jnp.linalg.norm(to_surface, axis=-1, keepdims=True) + 1e-12
    )
    same_dir = jnp.sum(to_surface * vnn, axis=-1)
    return jnp.sign(same_dir) * jnp.sqrt(jnp.maximum(d2, 0.0))


@functools.partial(jax.jit, static_argnames=("contact_threshold", "kernel"))
def _physics_over_sequence_jit(points, verts_seq, faces,
                               contact_threshold, kernel):
    sdf = signed_distance_seq(points, verts_seq, faces, kernel)   # (L, O)
    non_collision = jnp.mean((sdf <= 0).astype(jnp.float32), axis=1)
    contact = (
        jnp.sum((sdf > -contact_threshold).astype(jnp.int32), axis=1) > 0
    ).astype(jnp.float32)
    return non_collision, contact


def physics_over_sequence(
    points: jnp.ndarray,       # (O, 3) scene points
    verts_seq: jnp.ndarray,    # (L, H, 3) body vertices per frame (padded)
    faces: jnp.ndarray,        # (F, 3)
    contact_threshold: float = 0.05,
    kernel: str = "auto",
):
    """Per-frame (non_collision, contact) over a padded sequence
    (reference: utils/evaluate.py:436-458). Returns (L,) arrays; caller
    averages over valid frames. The kernel choice (incl. the
    AM_SDF_KERNEL debug override) is resolved HERE, outside the jit
    boundary, so it participates in the trace-cache key."""
    kernel = _resolve_kernel(kernel, points.shape[0], verts_seq.shape[1])
    return _physics_over_sequence_jit(points, verts_seq, faces,
                                      contact_threshold, kernel)


@jax.jit
def dist_to_obj(points: jnp.ndarray, verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """min(max signed distance, 0) of object points to an anchor body frame
    (reference: utils/evaluate.py:460-471)."""
    sdf = signed_distance_to_body(points, verts, faces)
    return jnp.minimum(sdf.max(), 0.0)


def compute_pairwise_distance(x: np.ndarray) -> float:
    """Average pairwise l2 distance across k samples, per frame — the APD
    diversity metric (reference: utils/evaluate.py:429-434)."""
    k, n, d = x.shape
    diff = x[:, None, :, :] - x[None, :, :, :]           # (k, k, n, d)
    dist = np.linalg.norm(diff, axis=-1)                 # (k, k, n)
    return float(dist.sum() / (k * (k - 1)) / n)
