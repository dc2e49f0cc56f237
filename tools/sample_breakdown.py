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
    def denoise1(variables, xt, cond_h, enc):
        t = jnp.full((B,), 500, dtype=jnp.int32)
        # NOTE: denoiser trunk only, hierarchies + encode precomputed —
        # exactly the scan body's per-step work minus the q_posterior
        # elementwise math, so ``scan_overhead`` = posterior + dispatch
        return model.apply(variables, xt, t, cond_h, enc, train=False,
                           method=denoise_method)

    results["denoise1"] = _time(denoise1, variables, x, cond_h, enc)

    sample_fn = make_sample_fn(model, diffusion, clip_denoised=False)

    def chain(key):
        return sample_fn(variables, (B, 196, 263), cond, key)

    results["chain"] = _time(chain, jax.random.PRNGKey(0), reps=3)
    results["per_step_ms"] = results["chain"] / diffusion.num_timesteps * 1e3
    results["denoise1_ms"] = results["denoise1"] * 1e3
    results["scan_overhead_ms_per_step"] = (
        results["per_step_ms"] - results["denoise1_ms"]
    )

    # ---- roofline substantiation (VERDICT r3 weak #5): is the DDPM chain
    # really denoiser-bound, and at what MFU / HBM utilization?
    ca = denoise1.lower(variables, x, cond_h, enc).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    hbm = float(ca.get("bytes accessed", 0.0))
    peak = bench._peak_flops()
    results["denoise1_gflop"] = flops / 1e9
    results["denoise1_hbm_mb"] = hbm / 1e6
    results["denoise1_mfu"] = flops / results["denoise1"] / peak
    results["denoise1_hbm_gbps"] = hbm / results["denoise1"] / 1e9
    results["chain_step_mfu"] = flops / (results["per_step_ms"] / 1e3) / peak

    # analytic attention/MLP FLOP split of the trans_enc stack at the REAL
    # token count (time + text + scene group tokens + 196 motion frames)
    n_group = max(
        (l.shape[1] for l in jax.tree_util.tree_leaves(enc)
         if hasattr(l, "ndim") and l.ndim == 3 and l.shape[0] == B),
        default=0,
    )
    L_tok = 1 + 1 + int(n_group) + x.shape[1]
    d, ff = model.latent_dim, model.dim_feedforward
    n_layers = sum(model.num_layers)
    qkvo = 8 * L_tok * d * d            # 4 projections x 2 FLOP/MAC
    attn = 4 * L_tok * L_tok * d        # scores + value-weighting
    mlp = 4 * L_tok * d * ff            # two ff matmuls
    results["tokens"] = L_tok
    results["analytic_layer_gflop_b1"] = (qkvo + attn + mlp) / 1e9
    results["analytic_stack_gflop"] = B * n_layers * (qkvo + attn + mlp) / 1e9
    results["analytic_attn_frac"] = attn / (qkvo + attn + mlp)
    results["analytic_mlp_frac"] = mlp / (qkvo + attn + mlp)
    print(json.dumps({k: round(float(v), 5) for k, v in results.items()}))
