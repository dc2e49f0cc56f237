"""Timestep schedule samplers (reference: diffusion/resample.py:7-160).

``UniformSampler`` is the only one the shipped configs use
(configs/task/*.yaml schedule_sampler_type: 'uniform'); the
loss-second-moment importance sampler is provided as a functional-state
pytree whose update is a pure function, so it jits and — under a device
mesh — its history can be synchronized with ``lax.all_gather`` inside the
train step (replacing the reference's dist.all_gather, resample.py:89-110).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


def uniform_sampling(rng: jax.Array, batch_size: int, num_timesteps: int) -> jnp.ndarray:
    """Uniform t sampling (reference: diffusion/resample.py:7-12)."""
    return jax.random.randint(rng, (batch_size,), 0, num_timesteps, dtype=jnp.int32)


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng: jax.Array, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = uniform_sampling(rng, batch_size, self.num_timesteps)
        weights = jnp.ones((batch_size,), dtype=jnp.float32)
        return t, weights


@struct.dataclass
class LossSecondMomentState:
    """Running per-timestep squared-loss history (reference: resample.py:130-160)."""

    loss_history: jnp.ndarray  # (T, history_per_term)
    loss_counts: jnp.ndarray   # (T,) int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10) -> "LossSecondMomentState":
        return cls(
            loss_history=jnp.zeros((num_timesteps, history_per_term), dtype=jnp.float32),
            loss_counts=jnp.zeros((num_timesteps,), dtype=jnp.int32),
        )


class LossSecondMomentResampler:
    def __init__(self, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self) -> LossSecondMomentState:
        return LossSecondMomentState.create(self.num_timesteps, self.history_per_term)

    def weights(self, state: LossSecondMomentState) -> jnp.ndarray:
        warmed = jnp.all(state.loss_counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(state.loss_history ** 2, axis=-1))
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.ones((self.num_timesteps,), dtype=jnp.float32) / self.num_timesteps
        return jnp.where(warmed, w, uniform)

    def sample(
        self, rng: jax.Array, batch_size: int, state: LossSecondMomentState
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p = self.weights(state)
        t = jax.random.choice(rng, self.num_timesteps, shape=(batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t.astype(jnp.int32), weights

    def update(
        self, state: LossSecondMomentState, ts: jnp.ndarray, losses: jnp.ndarray,
        axis_name: str | None = None,
    ) -> LossSecondMomentState:
        """Fold a batch of (t, loss) pairs into the history. Under a mesh,
        pass ``axis_name`` to gather every shard's pairs first (the TPU
        equivalent of the reference's dist.all_gather sync)."""
        if axis_name is not None:
            ts = jax.lax.all_gather(ts, axis_name).reshape(-1)
            losses = jax.lax.all_gather(losses, axis_name).reshape(-1)

        def fold(carry, tl):
            hist, counts = carry
            t, loss = tl
            cnt = counts[t]
            at_cap = cnt == self.history_per_term
            # shift-left on full history, else append at cnt
            shifted = jnp.concatenate([hist[t, 1:], jnp.array([loss])])
            appended = hist[t].at[jnp.minimum(cnt, self.history_per_term - 1)].set(loss)
            hist = hist.at[t].set(jnp.where(at_cap, shifted, appended))
            counts = counts.at[t].set(jnp.minimum(cnt + 1, self.history_per_term))
            return (hist, counts), None

        (hist, counts), _ = jax.lax.scan(
            fold, (state.loss_history, state.loss_counts), (ts, losses)
        )
        return LossSecondMomentState(loss_history=hist, loss_counts=counts)


def create_schedule_sampler(name: str, num_timesteps: int):
    """Factory (reference: diffusion/resample.py:20-36 equivalent)."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name in ("loss-second-moment", "loss_second_moment"):
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
