"""Probe: where does the SMPL-X refine Adam step spend time on chip?"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from afford_motion_tpu.eval.smplx_lbs import SMPLXModel, smplx_joints, rodrigues
from afford_motion_tpu.eval.joints_to_smplx import make_refine_fn, PARAM_DIM

body = SMPLXModel.synthetic(num_verts=10475, num_faces=20908)
B, L = 16, 196
rng = np.random.default_rng(0)
params = jnp.asarray(rng.normal(size=(B, L, PARAM_DIM)).astype(np.float32) * 0.2)
joints = jnp.asarray(rng.normal(size=(B, L, 66)).astype(np.float32) * 0.3)
x_mask = jnp.zeros((B, L), dtype=bool)
flat = params.reshape(B * L, PARAM_DIM)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args, n=20):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return dt


# 1. joints-only forward
fwd = jax.jit(lambda f: smplx_joints(body, f[:, :3], f[:, 3:6], f[:, 6:69]))
timeit("joints fwd (3136 frames)", fwd, flat)

# 2. rodrigues only
rod = jax.jit(lambda f: rodrigues(
    jnp.zeros((f.shape[0], 55, 3)).at[:, 0].set(f[:, 3:6]).at[:, 1:22].set(
        f[:, 6:69].reshape(-1, 21, 3))))
timeit("rodrigues (3136, 55)", rod, flat)


# 3. loss fwd
def loss_fn(p):
    fl = p.reshape(B * L, PARAM_DIM)
    j = smplx_joints(body, fl[:, :3], fl[:, 3:6], fl[:, 6:69])[:, :22].reshape(B, L, 66)
    return jnp.mean((j - joints) ** 2)


timeit("loss fwd", jax.jit(loss_fn), params)

# 4. loss grad
timeit("loss grad", jax.jit(jax.grad(loss_fn)), params)

# 5. one full Adam step (via make_refine_fn with steps=1)
r1 = make_refine_fn(body, 0.02, 1)
timeit("refine steps=1 (incl. dispatch)", r1, params, joints, x_mask, n=5)
r10 = make_refine_fn(body, 0.02, 10)
d10 = timeit("refine steps=10", r10, params, joints, x_mask, n=3)
r100 = make_refine_fn(body, 0.02, 100)
d100 = timeit("refine steps=100", r100, params, joints, x_mask, n=2)
print(f"in-loop Adam step: {(d100 - d10) / 90 * 1e3:.3f} ms")
