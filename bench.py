"""Benchmark harness — prints ONE JSON line for the driver.

Measures training throughput of the flagship configuration
(CMDM trans_enc on HumanML3D shapes: global batch 32, 8192-point contact
cloud, 196x263 motion — the reference's 4-GPU DDP training config,
scripts/t2m_contact_motion/train_ddp.sh) as steps/sec on the available
TPU chip(s).

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); the ratio is computed against the recorded value in
BENCH_BASELINE.json when present (a previously-measured reference or own
number), else 1.0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 32))
NUM_POINTS = int(os.environ.get("BENCH_POINTS", 8192))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
WARMUP = int(os.environ.get("BENCH_WARMUP", 3))
# 2 = fps-only wire, kNN recomputed on device (the SHIPPED production
# path: configs default geometry_wire=fps); 1 = full precomputed geometry
# cache on the wire; 0 = build FPS/kNN in-step.
GEO_CACHE = int(os.environ.get("BENCH_GEO_CACHE", 2))
# computation dtype (bfloat16 = the shipped mixed-precision recipe:
# f32 params/norms/softmax/head, bf16 activations)
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# 1 = banded windowed-neighborhood kernels on Morton-sorted clouds (the
# shipped default for Morton-sorted packed data; pairs with GEO_CACHE=2)
BANDED = int(os.environ.get("BENCH_BANDED", 1))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from afford_motion_tpu.diffusion import create_gaussian_diffusion
    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.models.conditioning import add_hierarchies
    from afford_motion_tpu.parallel.mesh import create_mesh_for_batch, replicate, shard_batch
    from afford_motion_tpu.train import TrainState, make_optimizer, make_train_step
    from afford_motion_tpu.utils.config import DictConfig

    model = CMDM(
        motion_dim=263, latent_dim=512, time_emb_dim=512, text_feat_dim=512,
        contact_dim=6, planes=(32, 64, 128, 256), blocks=(2, 2, 2, 2),
        arch="trans_enc", num_layers=(1, 1, 1, 1, 1), num_heads=8,
        dim_feedforward=1024, dtype=jnp.dtype(DTYPE),
    )
    diffusion = create_gaussian_diffusion(DictConfig({
        "predict_xstart": True, "steps": 1000, "noise_schedule": "cosine",
        "timestep_respacing": "", "loss_type": "MSE",
        "learn_sigma": False, "sigma_small": True,
    }))

    rng = np.random.default_rng(0)
    B, N, L, D = BATCH, NUM_POINTS, 196, 263
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    if BANDED:
        from afford_motion_tpu.ops.morton import morton_order
        from afford_motion_tpu.ops.pallas import banded

        xyz = np.stack([s[morton_order(s)] for s in xyz])
        banded.set_enabled(True)
    cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 512)).astype(np.float32)),
        "c_pc_xyz": jnp.asarray(xyz),
        "c_pc_contact": jnp.asarray(rng.random(size=(B, N, 6)).astype(np.float32)),
        "x_mask": jnp.zeros((B, L), dtype=bool),
    }

    cond_h = add_hierarchies(model, cond)
    if GEO_CACHE:
        from afford_motion_tpu.ops.hierarchy import geometry_to_arrays

        arrays = geometry_to_arrays(cond_h["levels_sm"], prefix="geo_sm")
        if GEO_CACHE == 2:
            arrays = {k: v for k, v in arrays.items() if "_fps_idx" in k}
        cond.update(arrays)
    t0 = jnp.zeros((B,), dtype=jnp.int32)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, t0, cond_h, train=False,
        )
    )()
    tx = make_optimizer(1e-4, params=variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}), tx=tx
    )

    mesh = create_mesh_for_batch(B)
    state = replicate(state, mesh)
    x = shard_batch(x, mesh)
    cond = shard_batch(cond, mesh)

    step_fn = make_train_step(model, diffusion)
    key = jax.random.PRNGKey(0)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, x, cond, sub)
    jax.block_until_ready(metrics["loss"])

    t_start = time.perf_counter()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, x, cond, sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t_start
    steps_per_sec = STEPS / dt

    vs_baseline = 1.0
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            base = json.load(open("BENCH_BASELINE.json"))["value"]
            vs_baseline = steps_per_sec / float(base)
        except Exception:
            pass

    print(json.dumps({
        "metric": f"cmdm_h3d_train_steps_per_sec_b{B}_n{N}",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
