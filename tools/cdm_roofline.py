"""CDM stage-1 roofline (VERDICT r4 item 4): the train (b64) and t500
sampling axes have sat at 1.00x since round 1 with no evidence of WHY.
This tool produces the same standard of proof the CMDM chain got in
r04_sampler_roofline.json: measured sub-stage times + XLA cost-model
FLOPs/bytes + an analytic cross-check of the Perceiver stack at the real
token counts (reference models/cdm.py:88-188: the encoder consumes all
8192 scene tokens as KV for a 2-token [text, time] query, then every
point cross-attends back as decoder query).

Emits one JSON line; archive to docs/artifacts/r05_cdm_roofline.json.
BENCH_* env vars from bench.py apply.
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

REPS = int(os.environ.get("BD_REPS", 10))
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


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


if __name__ == "__main__":
    from afford_motion_tpu.models.cdm import CDM
    from afford_motion_tpu.models.conditioning import add_hierarchies
    from afford_motion_tpu.train.sampling import make_sample_fn

    model = bench._make_cdm(bench.DTYPE)
    rng = np.random.default_rng(1)
    B, N = int(os.environ.get("BENCH_CDM_BATCH", 64)), bench.NUM_POINTS
    x, cond = bench._cdm_batch(rng, B, N)
    peak = bench._peak_flops()
    results = {"batch": B, "points": N, "dtype": bench.DTYPE}

    # ---------------- train axis (bench_cdm's exact path) ----------------
    diffusion = bench._diffusion(500)
    step_fn, state, xs, conds, _ = bench._init_train(model, diffusion, x, cond)
    key = jax.random.PRNGKey(0)
    step_flops, step_bytes = _cost(step_fn.lower(state, xs, conds, key).compile())
    # the train step donates state (donate_argnums=(0,)) — time via the
    # state-threading harness, not a fixed-args lambda
    steps_per_sec, state, _ = bench._time_train(step_fn, state, xs, conds)
    t_step = 1.0 / steps_per_sec
    results["train_step_ms"] = t_step * 1e3
    results["train_step_gflop"] = step_flops / 1e9
    results["train_step_hbm_mb"] = step_bytes / 1e6
    results["train_step_mfu"] = step_flops / t_step / peak
    results["train_step_hbm_gbps"] = step_bytes / t_step / 1e9

    # forward fraction — hierarchy HOISTED, as the train step and the
    # sampler both hoist it (timing it inline would misattribute the
    # one-off fps/kNN build to every forward); the build itself is timed
    # separately below
    t0 = jnp.zeros((B,), dtype=jnp.int32)
    # keep params DEVICE-resident (device_get would re-upload ~50 MB of
    # host params per call through the tunnel, swamping the forward)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    hier = jax.jit(lambda cond: add_hierarchies(model, cond))
    cond_h = hier(cond)
    jax.block_until_ready(jax.tree_util.tree_leaves(cond_h)[0])
    t_hier = _time(hier, cond)
    results["hierarchy_build_ms"] = t_hier * 1e3

    @jax.jit
    def fwd(variables, x, cond_h):
        return model.apply(variables, x, t0, cond_h, train=False)

    fwd_flops, fwd_bytes = _cost(fwd.lower(variables, x, cond_h).compile())
    t_fwd = _time(fwd, variables, x, cond_h)
    results["fwd_ms"] = t_fwd * 1e3
    results["fwd_gflop"] = fwd_flops / 1e9
    results["fwd_hbm_mb"] = fwd_bytes / 1e6
    results["fwd_mfu"] = fwd_flops / t_fwd / peak
    results["fwd_hbm_gbps"] = fwd_bytes / t_fwd / 1e9

    # ---------------- sampling axis (bench_sampler_cdm's path) ----------
    sample_fn = make_sample_fn(model, diffusion, clip_denoised=False)

    def chain(k):
        return sample_fn(variables, (B, N, 6), cond, k)

    cj = jax.jit(chain)
    # NOTE: XLA's cost model counts a lax.scan BODY ONCE — the compiled
    # chain's reported flops/bytes are ~one denoiser step, not T of them.
    # True chain totals multiply by num_timesteps (posterior math and
    # outside-scan ops are <1% of a step).
    T = diffusion.num_timesteps
    body_flops, body_bytes = _cost(cj.lower(key).compile())
    t_chain = _time(cj, key, reps=3)
    results["chain_s"] = t_chain
    results["chain_per_step_ms"] = t_chain / T * 1e3
    results["chain_body_gflop"] = body_flops / 1e9
    results["chain_mfu"] = body_flops * T / t_chain / peak
    results["chain_hbm_gbps"] = body_bytes * T / t_chain / 1e9
    results["chain_per_step_hbm_mb"] = body_bytes / 1e6
    # denoiser-only forward vs the measured scan step (posterior + noise
    # math accounts for the remainder)
    results["fwd_frac_of_chain_step"] = (
        results["fwd_ms"] / results["chain_per_step_ms"]
    )

    # ---------------- analytic cross-check (Perceiver at real tokens) ----
    ac = dict(model.arch_cfg)
    ckv = int(ac["encoder_q_input_channels"])      # attn inner = q channels
    kvin = int(ac["encoder_kv_input_channels"])
    dq = int(ac["decoder_q_input_channels"])
    din = x.shape[-1] + cond["c_pc_feat"].shape[-1] + 3  # contact+feat+xyz
    per_item = {
        "enc_kv_proj": 2 * N * din * kvin,
        # encoder cross-attn: K,V project all N scene tokens 256->512
        "enc_cross_kv": 2 * 2 * N * kvin * ckv,
        "dec_q_proj": 2 * N * kvin * dq,
        # decoder cross-attn: Q/out projections over all N points + MLP
        "dec_cross_q_out": 2 * 2 * N * dq * dq,
        "dec_mlp": 2 * 2 * N * dq * dq,
        "head": 2 * N * dq * x.shape[-1],
    }
    tot = sum(per_item.values())
    results["analytic_fwd_gflop"] = B * tot / 1e9
    results["analytic_vs_costmodel_fwd"] = (B * tot) / max(fwd_flops, 1.0)
    results["analytic_enc_kv_frac"] = (
        (per_item["enc_kv_proj"] + per_item["enc_cross_kv"]) / tot
    )

    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in results.items()}))
