"""Numerical parity tests for the diffusion core against a pure-numpy oracle
implementing the published guided-diffusion formulas (the reference's
diffusion/gaussian_diffusion.py is itself a port of those formulas, so
matching the math here is matching the reference)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afford_motion_tpu.diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    betas_for_alpha_bar,
    create_gaussian_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from afford_motion_tpu.diffusion.schedule import respaced_betas
from afford_motion_tpu.utils.config import DictConfig


# ------------------------------------------------------------------ oracle
def oracle_schedule(betas):
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    out = {
        "alphas_cumprod": ac,
        "sqrt_alphas_cumprod": np.sqrt(ac),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1 - ac),
        "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / ac),
        "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / ac - 1),
        "posterior_variance": betas * (1 - ac_prev) / (1 - ac),
        "posterior_mean_coef1": betas * np.sqrt(ac_prev) / (1 - ac),
        "posterior_mean_coef2": (1 - ac_prev) * np.sqrt(alphas) / (1 - ac),
    }
    out["posterior_log_variance_clipped"] = np.log(
        np.append(out["posterior_variance"][1], out["posterior_variance"][1:])
    )
    return out


def make_diffusion(T=50, schedule="cosine", mean_type=ModelMeanType.START_X):
    betas = get_named_beta_schedule(schedule, T)
    return GaussianDiffusion.create(
        betas,
        model_mean_type=mean_type,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )


def test_linear_schedule_values():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert math.isclose(betas[0], 0.0001) and math.isclose(betas[-1], 0.02)
    # scaled variant for T=500
    betas = get_named_beta_schedule("linear", 500)
    assert math.isclose(betas[0], 2 * 0.0001) and math.isclose(betas[-1], 2 * 0.02)


def test_cosine_schedule_matches_formula():
    T = 100
    betas = get_named_beta_schedule("cosine", T)
    ab = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    expect = [min(1 - ab((i + 1) / T) / ab(i / T), 0.999) for i in range(T)]
    np.testing.assert_allclose(betas, expect, rtol=1e-12)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_schedule_arrays_match_oracle():
    T = 200
    betas = get_named_beta_schedule("cosine", T)
    diff = make_diffusion(T)
    ora = oracle_schedule(betas)
    for key, val in ora.items():
        got = np.asarray(getattr(diff, key))
        np.testing.assert_allclose(got, val.astype(np.float32), rtol=2e-5, atol=1e-7, err_msg=key)


def test_q_sample_matches_oracle():
    T = 50
    diff = make_diffusion(T)
    ora = oracle_schedule(get_named_beta_schedule("cosine", T))
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 8, 6)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 10, 25, 49])
    got = np.asarray(diff.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    want = (
        ora["sqrt_alphas_cumprod"][t, None, None] * x0
        + ora["sqrt_one_minus_alphas_cumprod"][t, None, None] * noise
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_q_posterior_matches_oracle():
    T = 50
    diff = make_diffusion(T)
    ora = oracle_schedule(get_named_beta_schedule("cosine", T))
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(3, 5, 2)).astype(np.float32)
    xt = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([1, 20, 49])
    mean, var, logvar = diff.q_posterior_mean_variance(jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    want_mean = (
        ora["posterior_mean_coef1"][t, None, None] * x0
        + ora["posterior_mean_coef2"][t, None, None] * xt
    )
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(var)[:, 0, 0], ora["posterior_variance"][t], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logvar)[:, 0, 0], ora["posterior_log_variance_clipped"][t], rtol=1e-5, atol=1e-6
    )


def test_p_mean_variance_start_x():
    """predict_xstart model: mean must be posterior mean of (pred_x0, x_t)."""
    T = 50
    diff = make_diffusion(T)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    t = jnp.array([5, 30])
    pred_x0 = x * 0.5
    out = diff.p_mean_variance(lambda xt, tt: pred_x0, x, t, clip_denoised=False)
    want_mean, _, _ = diff.q_posterior_mean_variance(pred_x0, x, t)
    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(want_mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(pred_x0), rtol=1e-6)


def test_epsilon_xstart_roundtrip():
    T = 50
    diff = make_diffusion(T, mean_type=ModelMeanType.EPSILON)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    t = jnp.array([7, 33])
    xt = diff.q_sample(x0, t, noise)
    # recovering x0 from the true eps must invert q_sample
    rec = diff._predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_masked_mse_loss():
    T = 50
    diff = make_diffusion(T)
    B, L, D = 3, 8, 4
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([0, 10, 49])
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[0, 4:] = True  # half of sample 0 is padding
    x_mask[1, 1:] = True

    model_out = jnp.zeros((B, L, D))  # model predicts x0 = 0
    terms = diff.training_losses(
        lambda xt, tt: model_out, x0, t, jax.random.PRNGKey(0),
        x_mask=jnp.asarray(x_mask), noise=noise,
    )
    # oracle: mean of x0^2 over valid frames only
    x0n = np.asarray(x0)
    for b, valid_n in [(0, 4), (1, 1), (2, 8)]:
        want = (x0n[b, :valid_n] ** 2).sum() / (valid_n * D)
        np.testing.assert_allclose(float(terms["mse"][b]), want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(terms["loss"]), np.asarray(terms["mse"]))


def test_space_timesteps_ddim_and_sections():
    assert space_timesteps(1000, "ddim50") == set(range(0, 1000, 20))
    # single-section count preserves first and last-ish strided layout
    s = space_timesteps(300, [10, 15, 20])
    assert len(s) == 45 and min(s) == 0
    full = space_timesteps(500, [500])
    assert full == set(range(500))


def test_respaced_betas_consistency():
    """Respaced alphas_cumprod at kept steps must equal original values."""
    T = 100
    betas = get_named_beta_schedule("cosine", T)
    keep = space_timesteps(T, [10])
    new_betas, tmap = respaced_betas(betas, keep)
    ac_orig = np.cumprod(1 - betas)
    ac_new = np.cumprod(1 - new_betas)
    np.testing.assert_allclose(ac_new, ac_orig[tmap], rtol=1e-9)
    assert sorted(tmap.tolist()) == sorted(keep)


def test_create_from_config_and_sampling_shapes():
    cfg = DictConfig({
        "predict_xstart": True, "steps": 20, "noise_schedule": "cosine",
        "timestep_respacing": "", "rescale_timesteps": False, "loss_type": "MSE",
        "learn_sigma": False, "sigma_small": True,
    })
    diff = create_gaussian_diffusion(cfg)
    assert diff.num_timesteps == 20
    model_fn = lambda x, t: x * 0.0
    out = diff.p_sample_loop(model_fn, (2, 6, 3), jax.random.PRNGKey(0), clip_denoised=False)
    assert out.shape == (2, 6, 3)
    # final step uses no noise and model predicts 0 -> result close to 0-mean posterior collapse
    out2 = diff.ddim_sample_loop(model_fn, (2, 6, 3), jax.random.PRNGKey(0), clip_denoised=False)
    assert out2.shape == (2, 6, 3)
    # ddim with eta=0 and zero-predicting model ends exactly at 0
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)


def test_p_sample_loop_respaced_runs():
    cfg = DictConfig({
        "predict_xstart": True, "steps": 100, "noise_schedule": "cosine",
        "timestep_respacing": "ddim10", "rescale_timesteps": False, "loss_type": "MSE",
        "learn_sigma": False, "sigma_small": True,
    })
    diff = create_gaussian_diffusion(cfg)
    assert diff.num_timesteps == 10
    seen_ts = []

    def model_fn(x, t):
        # t must be mapped back to original-step indices (0..99)
        return x * 0.0

    out = diff.p_sample_loop(model_fn, (1, 4, 2), jax.random.PRNGKey(1), clip_denoised=False)
    assert out.shape == (1, 4, 2)
    assert int(diff.timestep_map[-1]) == 90


def test_learned_range_variance_path():
    T = 30
    betas = get_named_beta_schedule("cosine", T)
    diff = GaussianDiffusion.create(
        betas,
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.LEARNED_RANGE,
        loss_type=LossType.RESCALED_MSE,
    )
    rng = np.random.default_rng(5)
    B, L, D = 2, 4, 3
    x0 = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([3, 20])

    def model_fn(xt, tt):
        return jnp.concatenate([xt * 0.1, jnp.zeros_like(xt)], axis=-1)

    out = diff.p_mean_variance(model_fn, x0, t, clip_denoised=False)
    assert out["mean"].shape == (B, L, D)
    terms = diff.training_losses(model_fn, x0, t, jax.random.PRNGKey(2))
    assert "vb" in terms and terms["loss"].shape == (B,)


def test_ddim_eta0_fast_path_matches_general_branch():
    """The eta==0 DDIM step (which skips sigma and the per-step normal draw;
    gaussian.py:389-399) must equal the general-branch formula evaluated at
    sigma=0: pred_xstart*sqrt(ab_prev) + sqrt(1-ab_prev)*eps."""
    T = 40
    betas = get_named_beta_schedule("cosine", T)
    diff = GaussianDiffusion.create(
        betas,
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )
    rng = np.random.default_rng(7)
    B, L, D = 3, 5, 4
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([0, 17, 39])

    def model_fn(xt, tt):
        return jnp.tanh(xt) * 0.5

    out = diff.ddim_sample(model_fn, x, t, jax.random.PRNGKey(3),
                           clip_denoised=False, eta=0.0)

    # general-branch oracle at sigma=0 (float64 numpy)
    sched = oracle_schedule(betas)
    tn = np.asarray(t)
    xn = np.asarray(x, dtype=np.float64)
    pred_x0 = np.tanh(xn) * 0.5
    eps = (
        sched["sqrt_recip_alphas_cumprod"][tn][:, None, None] * xn - pred_x0
    ) / sched["sqrt_recipm1_alphas_cumprod"][tn][:, None, None]
    ac_prev = np.append(1.0, sched["alphas_cumprod"][:-1])[tn][:, None, None]
    want = pred_x0 * np.sqrt(ac_prev) + np.sqrt(1 - ac_prev) * eps
    np.testing.assert_allclose(np.asarray(out["sample"]), want, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), pred_x0, rtol=2e-5, atol=2e-6)

    # and a tiny-eta general-branch run must converge to the fast path
    out_tiny = diff.ddim_sample(model_fn, x, t, jax.random.PRNGKey(3),
                                clip_denoised=False, eta=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_tiny["sample"]), np.asarray(out["sample"]), rtol=1e-4, atol=1e-5
    )
