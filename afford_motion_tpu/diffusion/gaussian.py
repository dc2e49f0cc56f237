"""Gaussian diffusion as a JAX pytree of precomputed schedule arrays.

Capability-equivalent to the reference engine
(reference: diffusion/gaussian_diffusion.py:102-826 and respace.py:64-129)
but structured TPU-first:

- the schedule is a frozen ``flax.struct`` pytree of float32 arrays built
  once on the host in float64 — respacing simply bakes a ``timestep_map``
  into the same pytree instead of a wrapper class;
- models are plain functions ``model_fn(x, t) -> prediction`` with all
  conditioning bound by closure (strings and frozen-encoder outputs are
  encoded *before* jit, replacing the reference's per-forward ``.detach()``);
- sampling loops are ``lax.scan`` over the reversed schedule — the whole
  500/1000-step DDPM chain compiles to a single device program instead of a
  Python loop of kernel cascades (reference: gaussian_diffusion.py:488-536).
"""
from __future__ import annotations

import enum
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from .losses import discretized_gaussian_log_likelihood, mean_flat, normal_kl, sum_flat
from .schedule import get_named_beta_schedule, respaced_betas, space_timesteps


def _scan_unroll() -> int:
    """Unroll factor for the sampling-chain scans (AM_SCAN_UNROLL, default
    1). Unrolling trades compile time and code size for less per-iteration
    loop overhead; numerics are unchanged (same ops, same order)."""
    import os

    return max(1, int(os.environ.get("AM_SCAN_UNROLL", "1") or 1))

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class ModelMeanType(str, enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(str, enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(str, enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


@struct.dataclass
class DiffusionConfig:
    model_mean_type: ModelMeanType = struct.field(pytree_node=False)
    model_var_type: ModelVarType = struct.field(pytree_node=False)
    loss_type: LossType = struct.field(pytree_node=False)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)
    original_num_steps: int = struct.field(pytree_node=False, default=1000)


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for broadcasting."""
    return arr[t].reshape(t.shape[0], *([1] * (ndim - 1)))


@struct.dataclass
class GaussianDiffusion:
    """Schedule pytree + pure sampling/training math."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    log_fixed_large_variance: jnp.ndarray
    timestep_map: jnp.ndarray  # respaced step -> original step (identity if unspaced)
    config: DiffusionConfig = struct.field(pytree_node=False)

    # ------------------------------------------------------------------ init
    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        *,
        model_mean_type: ModelMeanType,
        model_var_type: ModelVarType,
        loss_type: LossType,
        rescale_timesteps: bool = False,
        timestep_map: Optional[np.ndarray] = None,
        original_num_steps: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "GaussianDiffusion":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        T = betas.shape[0]

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        fixed_large = np.append(posterior_variance[1], betas[1:])

        if timestep_map is None:
            timestep_map = np.arange(T, dtype=np.int32)
        if original_num_steps is None:
            original_num_steps = T

        f = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=f(betas),
            alphas_cumprod=f(alphas_cumprod),
            alphas_cumprod_prev=f(alphas_cumprod_prev),
            alphas_cumprod_next=f(alphas_cumprod_next),
            sqrt_alphas_cumprod=f(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f(posterior_variance),
            posterior_log_variance_clipped=f(posterior_log_variance_clipped),
            posterior_mean_coef1=f(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            log_betas=f(np.log(betas)),
            fixed_large_variance=f(fixed_large),
            log_fixed_large_variance=f(np.log(fixed_large)),
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
            config=DiffusionConfig(
                model_mean_type=model_mean_type,
                model_var_type=model_var_type,
                loss_type=loss_type,
                rescale_timesteps=rescale_timesteps,
                original_num_steps=int(original_num_steps),
            ),
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def model_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Timesteps as seen by the model: respacing map + optional rescale
        (reference: respace.py:117-129, gaussian_diffusion.py:352-355)."""
        new_t = self.timestep_map[t]
        if self.config.rescale_timesteps:
            return new_t.astype(jnp.float32) * (1000.0 / self.config.original_num_steps)
        return new_t

    # -------------------------------------------------------------- q-process
    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        posterior_mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = _extract(self.posterior_variance, t, nd)
        posterior_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    # -------------------------------------------------------------- p-process
    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        return (
            _extract(1.0 / self.posterior_mean_coef1, t, nd) * xprev
            - _extract(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd) * x_t
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        *,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        nd = x.ndim
        model_output = model_fn(x, self.model_timesteps(t))

        if cfg.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            # Split the doubled channel (last) dim into mean / variance halves.
            # The reference splits dim=1 (gaussian_diffusion.py:265) which is
            # only correct for NCHW images; for (B, L, D) sequence data the
            # feature dim is last, so we split there. No shipped config
            # learns sigma, so this path has no parity constraint.
            C = x.shape[-1]
            model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
            if cfg.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, nd)
                max_log = _extract(self.log_betas, t, nd)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif cfg.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _extract(self.fixed_large_variance, t, nd) * jnp.ones_like(x)
            model_log_variance = _extract(self.log_fixed_large_variance, t, nd) * jnp.ones_like(x)
        elif cfg.model_var_type == ModelVarType.FIXED_SMALL:
            model_variance = _extract(self.posterior_variance, t, nd) * jnp.ones_like(x)
            model_log_variance = (
                _extract(self.posterior_log_variance_clipped, t, nd) * jnp.ones_like(x)
            )
        else:
            raise NotImplementedError(cfg.model_var_type)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if cfg.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif cfg.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        elif cfg.model_mean_type == ModelMeanType.EPSILON:
            pred_xstart = process_xstart(self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:
            raise NotImplementedError(cfg.model_mean_type)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ---------------------------------------------------------------- sampling
    def p_sample(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        *,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        cond_fn: Optional[Callable] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        if noise is None:
            noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        mean = out["mean"]
        if cond_fn is not None:
            gradient = cond_fn(x, self.model_timesteps(t))
            mean = mean + out["variance"] * gradient
        sample = mean + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape: Sequence[int],
        rng: jax.Array,
        *,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        cond_fn: Optional[Callable] = None,
        dtype=jnp.float32,
        noise_seq: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full ancestral DDPM chain as one ``lax.scan`` — compiles once and
        runs without host round-trips (replaces the reference's Python loop,
        gaussian_diffusion.py:442-536).

        ``noise_seq`` (T, *shape): externally supplied per-step noise in
        scan order t = T-1..0, replacing the internal RNG draws — the
        parity-testing hook that lets the reference torch pipeline and this
        one consume an IDENTICAL noise stream (tools/ref_e2e_ab.py). The
        reference draws ``th.randn_like(x)`` once per step
        (gaussian_diffusion.py:396-440), so matched streams give matched
        trajectories up to forward-parity error."""
        init_rng, loop_rng = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(init_rng, tuple(shape), dtype=dtype)

        def body(carry, scan_in):
            idx, step_noise = scan_in
            step_rng = jax.random.fold_in(loop_rng, idx)
            t = jnp.full((shape[0],), idx, dtype=jnp.int32)
            out = self.p_sample(
                model_fn, carry, t, step_rng,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_fn=cond_fn,
                noise=step_noise,
            )
            return out["sample"], None

        timesteps = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        if noise_seq is None:
            # scan carries only the timestep; p_sample draws its own noise
            def body_rng(carry, idx):
                return body(carry, (idx, None))

            x, _ = lax.scan(body_rng, x, timesteps, unroll=_scan_unroll())
        else:
            x, _ = lax.scan(
                body, x, (timesteps, noise_seq.astype(dtype)),
                unroll=_scan_unroll(),
            )
        return x

    def ddim_sample(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        *,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        eta: float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        nd = x.ndim
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, nd)
        if eta == 0.0:
            # Deterministic DDIM (the standard deployment mode): sigma is
            # identically 0, so the noise term vanishes — skip the per-step
            # normal draw entirely. Bit-identical to the general branch
            # (mean_pred + 0 * noise == mean_pred); eta is a static Python
            # float, so this resolves at trace time.
            sample = (
                out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                + jnp.sqrt(1 - alpha_bar_prev) * eps
            )
            return {"sample": sample, "pred_xstart": out["pred_xstart"]}
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (nd - 1)))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        *,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
    ) -> Dict[str, jnp.ndarray]:
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        nd = x.ndim
        eps = (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x - out["pred_xstart"]
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model_fn: ModelFn,
        shape: Sequence[int],
        rng: jax.Array,
        *,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        eta: float = 0.0,
        dtype=jnp.float32,
    ) -> jnp.ndarray:
        init_rng, loop_rng = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(init_rng, tuple(shape), dtype=dtype)

        def body(carry, idx):
            step_rng = jax.random.fold_in(loop_rng, idx)
            t = jnp.full((shape[0],), idx, dtype=jnp.int32)
            out = self.ddim_sample(
                model_fn, carry, t, step_rng,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn, eta=eta,
            )
            return out["sample"], None

        timesteps = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        x, _ = lax.scan(body, x, timesteps, unroll=_scan_unroll())
        return x

    # ---------------------------------------------------------------- training
    def _vb_terms_bpd(self, model_fn, x_start, x_t, t, *, clip_denoised=True):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        *,
        x_mask: Optional[jnp.ndarray] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Per-sample masked diffusion loss.

        ``x_mask`` is the padding mask with True = padded/invalid frame,
        shape (B, L); the MSE is averaged over valid frames × features only
        (reference: gaussian_diffusion.py:758-761, 815-818).
        """
        cfg = self.config
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        if x_mask is None:
            x_mask = jnp.zeros(x_start.shape[:-1], dtype=bool)
        valid = (~x_mask).astype(x_start.dtype)[..., None]  # (B, L, 1)

        terms: Dict[str, jnp.ndarray] = {}
        if cfg.loss_type in (LossType.KL, LossType.RESCALED_KL):
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False
            )["output"]
            if cfg.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model_fn(x_t, self.model_timesteps(t))

        if cfg.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            C = x_t.shape[-1]
            model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
            frozen_out = jnp.concatenate(
                [lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *_args: frozen_out, x_start, x_t, t, clip_denoised=False
            )["output"]
            if cfg.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        if cfg.model_mean_type == ModelMeanType.PREVIOUS_X:
            target = self.q_posterior_mean_variance(x_start, x_t, t)[0]
        elif cfg.model_mean_type == ModelMeanType.START_X:
            target = x_start
        elif cfg.model_mean_type == ModelMeanType.EPSILON:
            target = noise
        else:
            raise NotImplementedError(cfg.model_mean_type)

        d = target.shape[-1]
        mse = (target - model_output) ** 2
        mse = sum_flat(mse * valid) / (sum_flat(valid) * d)
        terms["mse"] = mse
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms


def create_gaussian_diffusion(diff_cfg: Any) -> GaussianDiffusion:
    """Build a (possibly respaced) diffusion from the config block
    (reference: models/base.py:55-70 + configs/default.yaml diffusion block).
    """
    steps = int(diff_cfg.get("steps", 1000))
    predict_xstart = bool(diff_cfg.get("predict_xstart", True))
    learn_sigma = bool(diff_cfg.get("learn_sigma", False))
    sigma_small = bool(diff_cfg.get("sigma_small", True))
    noise_schedule = str(diff_cfg.get("noise_schedule", "cosine"))
    timestep_respacing = diff_cfg.get("timestep_respacing", "") or [steps]
    rescale_timesteps = bool(diff_cfg.get("rescale_timesteps", False))
    loss_type = LossType(str(diff_cfg.get("loss_type", "MSE")).lower())

    betas = get_named_beta_schedule(noise_schedule, steps)
    use_timesteps = space_timesteps(steps, timestep_respacing)
    new_betas, timestep_map = respaced_betas(betas, use_timesteps)

    if learn_sigma:
        var_type = ModelVarType.LEARNED_RANGE
    elif sigma_small:
        var_type = ModelVarType.FIXED_SMALL
    else:
        var_type = ModelVarType.FIXED_LARGE

    return GaussianDiffusion.create(
        new_betas,
        model_mean_type=ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON,
        model_var_type=var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
        timestep_map=timestep_map,
        original_num_steps=steps,
    )
