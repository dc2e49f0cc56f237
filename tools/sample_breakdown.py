"""Where does the sampling chain's time go? (companion to
tools/step_breakdown.py, for the throughput axis 2 metrics)

Times, on the real chip, for the flagship CMDM b32 DDPM chain:

  encode      one-time contact/scene encode (hoisted out of the scan)
  denoise1    ONE jitted denoiser step (trunk fwd + q_posterior math)
  chain       the full 1000-step p_sample_loop (bench_sampler's number)

``chain - 1000 * denoise1`` exposes scan/dispatch overhead;
``denoise1`` directly shows what AM_FLASH_ATTN / dtype changes buy.
BENCH_* env vars apply (BENCH_BATCH, BENCH_DTYPE, AM_FLASH_ATTN=1 ...).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

REPS = int(os.environ.get("BD_REPS", 20))
WARMUP = int(os.environ.get("BD_WARMUP", 2))


def _time(fn, *args, reps=REPS) -> float:
    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    bench._sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    bench._sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    from afford_motion_tpu.models.conditioning import (
        add_hierarchies, encode_conditions,
    )
    from afford_motion_tpu.train.sampling import make_sample_fn

    model = bench._make_cmdm(bench.DTYPE)
    diffusion = bench._diffusion(1000)
    rng = np.random.default_rng(0)
    B, N = bench.BATCH, bench.NUM_POINTS
    x, cond = bench._cmdm_batch(rng, B, N)

    cond_h = add_hierarchies(model, cond)
    t0 = jnp.zeros((B,), dtype=jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, t0, cond_h,
                           train=False)
    )()

    results = {}

    @jax.jit
    def encode(variables, cond):
        ch = add_hierarchies(model, cond)
        return encode_conditions(model, variables, ch, train=False)

    results["encode"] = _time(encode, variables, cond)
    enc = encode(variables, cond)

    denoise_method = type(model).denoise

    @jax.jit
    def denoise1(variables, xt, cond, enc):
        ch = add_hierarchies(model, cond)
        t = jnp.full((B,), 500, dtype=jnp.int32)
        # NOTE: denoiser trunk only — the scan body additionally runs the
        # q_posterior elementwise math, so part of the reported "scan
        # overhead" is that per-step posterior pass, not pure dispatch
        return model.apply(variables, xt, t, ch, enc, train=False,
                           method=denoise_method)

    results["denoise1"] = _time(denoise1, variables, x, cond, enc)

    sample_fn = make_sample_fn(model, diffusion, clip_denoised=False)

    def chain(key):
        return sample_fn(variables, (B, 196, 263), cond, key)

    results["chain"] = _time(chain, jax.random.PRNGKey(0), reps=3)
    results["per_step_ms"] = results["chain"] / diffusion.num_timesteps * 1e3
    results["denoise1_ms"] = results["denoise1"] * 1e3
    results["scan_overhead_ms_per_step"] = (
        results["per_step_ms"] - results["denoise1_ms"]
    )
    print(json.dumps({k: round(float(v), 5) for k, v in results.items()}))
