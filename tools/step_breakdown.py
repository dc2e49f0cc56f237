"""Where does the flagship train step's time go? (VERDICT r1 #8)

Times jitted sub-stages of the CMDM b32/8192 train step on the real chip,
reusing bench.py's exact model/batch construction so numbers line up with
the driver benchmark:

  hier        on-device hierarchy rebuild from the fps wire (banded kNN)
  enc_fwd     encode_contact forward (the 8192-pt PointTransformer)
  fwd         full model forward (hierarchy included, train=True)
  grad        loss fwd+bwd (value_and_grad, hierarchy included)
  step        the full train step (grad + AdamW) == bench.py's number

Each stage is its own jit; stage deltas give the marginal cost (e.g.
step - grad = optimizer, grad - fwd ~= backward). BENCH_* env vars from
bench.py apply (BENCH_BANDED=0, BENCH_DTYPE=float32, ...).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402  (the harness helpers — model/batch/init)

REPS = int(os.environ.get("BD_REPS", 10))
WARMUP = int(os.environ.get("BD_WARMUP", 2))


def _time(fn, *args) -> float:
    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    bench._sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    bench._sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / REPS


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from afford_motion_tpu.models.conditioning import add_hierarchies
    from afford_motion_tpu.ops.hierarchy import geometry_to_arrays

    model = bench._make_cmdm(bench.DTYPE)
    diffusion = bench._diffusion(1000)
    rng = np.random.default_rng(0)
    B, N = bench.BATCH, bench.NUM_POINTS
    x, cond = bench._cmdm_batch(rng, B, N)
    step_fn, state, x, cond, variables = bench._init_train(model, diffusion, x, cond)

    results = {}

    # 1. hierarchy rebuild alone (what add_hierarchies does in-step)
    @jax.jit
    def hier(cond):
        ch = add_hierarchies(model, cond)
        return geometry_to_arrays(ch["levels_sm"], prefix="g")

    results["hier"] = _time(hier, cond)

    # 2. contact-encoder forward alone (hierarchy included, like in-step)
    @jax.jit
    def enc_fwd(variables, cond):
        ch = add_hierarchies(model, cond)
        return model.apply(variables, ch, train=False,
                           method=model.encode_contact)

    results["enc_fwd"] = _time(enc_fwd, variables, cond)

    # 3. full forward (train=True, batch_stats mutable) incl. hierarchy
    t0 = jnp.zeros((B,), dtype=jnp.int32)

    @jax.jit
    def fwd(variables, x, cond):
        ch = add_hierarchies(model, cond)
        out, _ = model.apply(variables, x, t0, ch, train=True,
                             rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
        return out

    results["fwd"] = _time(fwd, variables, x, cond)

    # 4. loss fwd+bwd (no optimizer)
    def loss_fn(params, bs, x, cond, key):
        ch = add_hierarchies(model, cond)
        rng_t, rng_noise, rng_drop = jax.random.split(key, 3)
        t = jax.random.randint(rng_t, (x.shape[0],), 0, diffusion.num_timesteps)

        def model_fn(x_t, ts):
            out, _ = model.apply({"params": params, "batch_stats": bs},
                                 x_t, ts, ch, train=True,
                                 rngs={"dropout": rng_drop},
                                 mutable=["batch_stats"])
            return out

        terms = diffusion.training_losses(model_fn, x, t, rng_noise,
                                          x_mask=ch.get("x_mask"))
        return terms["loss"].mean()

    grad_fn = jax.jit(jax.grad(loss_fn))
    key = jax.random.PRNGKey(0)
    results["grad"] = _time(
        grad_fn, state.params, variables.get("batch_stats", {}), x, cond, key
    )

    # 5. the full train step (bench.py's metric)
    def full(state, x, cond, key):
        new_state, metrics = step_fn(state, x, cond, key)
        return metrics["loss"]

    for _ in range(WARMUP):
        state, m = step_fn(state, x, cond, key)
    bench._sync(m["loss"])
    t_start = time.perf_counter()
    for _ in range(REPS):
        state, m = step_fn(state, x, cond, key)
    bench._sync(m["loss"])
    results["step"] = (time.perf_counter() - t_start) / REPS

    ms = {k: round(v * 1e3, 2) for k, v in results.items()}
    deltas = {
        "bwd+opt = step-fwd": round((results["step"] - results["fwd"]) * 1e3, 2),
        "opt = step-grad": round((results["step"] - results["grad"]) * 1e3, 2),
        "denoiser_fwd = fwd-enc_fwd": round((results["fwd"] - results["enc_fwd"]) * 1e3, 2),
        "enc_only = enc_fwd-hier": round((results["enc_fwd"] - results["hier"]) * 1e3, 2),
    }
    print(json.dumps({"ms": ms, "deltas_ms": deltas,
                      "steps_per_sec": round(1.0 / results["step"], 2),
                      "config": {"B": B, "N": N, "dtype": bench.DTYPE,
                                 "banded": bench.BANDED,
                                 "geo_cache": bench.GEO_CACHE}},
                     indent=1))
