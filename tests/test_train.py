"""End-to-end training smoke tests: overfit a tiny batch (SURVEY.md §4),
checkpoint round-trip, and multi-device data-parallel step on the virtual
8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from afford_motion_tpu.diffusion import create_gaussian_diffusion
from afford_motion_tpu.models.cmdm import CMDM
from afford_motion_tpu.models.cdm import CDM
from afford_motion_tpu.models.conditioning import add_hierarchies
from afford_motion_tpu.parallel import create_mesh, replicate, shard_batch
from afford_motion_tpu.train import (
    TrainState,
    load_ckpt,
    make_optimizer,
    make_sample_fn,
    make_train_step,
    save_ckpt,
)
from afford_motion_tpu.utils.config import DictConfig

B, N, L, D = 4, 256, 16, 66


def tiny_cmdm():
    return CMDM(
        motion_dim=D, latent_dim=64, time_emb_dim=64, text_feat_dim=32,
        contact_dim=6, planes=(16, 32, 64, 128), blocks=(2, 2, 2, 2),
        arch="trans_enc", num_layers=(1, 1), num_heads=4, dim_feedforward=128,
    )


def tiny_diffusion(steps=8):
    return create_gaussian_diffusion(DictConfig({
        "predict_xstart": True, "steps": steps, "noise_schedule": "cosine",
        "timestep_respacing": "", "loss_type": "MSE",
        "learn_sigma": False, "sigma_small": True,
    }))


def tiny_batch(rng):
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[0, 12:] = True
    cond = {
        "text_emb": rng.normal(size=(B, 1, 32)).astype(np.float32),
        "c_pc_xyz": rng.normal(size=(B, N, 3)).astype(np.float32),
        "c_pc_contact": rng.random(size=(B, N, 6)).astype(np.float32),
        "x_mask": x_mask,
    }
    return jnp.asarray(x), {k: jnp.asarray(v) for k, v in cond.items()}


def init_state(model, x, cond, lr=1e-3):
    cond_h = add_hierarchies(model, cond)
    t = jnp.zeros((x.shape[0],), dtype=jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           x, t, cond_h, train=False)
    tx = make_optimizer(lr, 0.0, 0, params=variables["params"])
    return TrainState.create(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}), tx=tx
    )


def test_overfit_tiny_batch_cmdm():
    rng = np.random.default_rng(0)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)
    state = init_state(model, x, cond, lr=2e-3)
    step_fn = make_train_step(model, diffusion)

    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(80):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, x, cond, sub)
        losses.append(float(metrics["loss"]))
    # loss must drop substantially when overfitting one batch
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5]), losses


def test_sampling_shapes_and_determinism():
    rng = np.random.default_rng(1)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)
    state = init_state(model, x, cond)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    sample_fn = make_sample_fn(model, diffusion)
    out1 = sample_fn(variables, (B, L, D), cond, jax.random.PRNGKey(7))
    out2 = sample_fn(variables, (B, L, D), cond, jax.random.PRNGKey(7))
    assert out1.shape == (B, L, D)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))  # same key
    out3 = sample_fn(variables, (B, L, D), cond, jax.random.PRNGKey(8))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-3  # diff key

    ddim_fn = make_sample_fn(model, diffusion, sampler="ddim")
    out4 = ddim_fn(variables, (B, L, D), cond, jax.random.PRNGKey(7))
    assert out4.shape == (B, L, D)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)
    state = init_state(model, x, cond)
    step_fn = make_train_step(model, diffusion)
    state, _ = step_fn(state, x, cond, jax.random.PRNGKey(0))

    path = str(tmp_path / "model000001")
    save_ckpt(state, path)

    state2 = init_state(model, x, cond)
    state2 = load_ckpt(state2, path)
    assert int(state2.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_data_parallel_step_on_8_devices():
    """The full train step must run sharded over the virtual CPU mesh and
    produce the same loss as single-device execution."""
    assert jax.device_count() >= 8, "conftest must force 8 virtual CPU devices"
    rng = np.random.default_rng(3)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    B8 = 8
    x = jnp.asarray(rng.normal(size=(B8, L, D)).astype(np.float32))
    cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B8, 1, 32)).astype(np.float32)),
        "c_pc_xyz": jnp.asarray(rng.normal(size=(B8, N, 3)).astype(np.float32)),
        "c_pc_contact": jnp.asarray(rng.random(size=(B8, N, 6)).astype(np.float32)),
        "x_mask": jnp.zeros((B8, L), dtype=bool),
    }
    state = init_state(model, x, cond)
    step_fn = make_train_step(model, diffusion)

    # single-device result
    _, m_single = step_fn(state, x, cond, jax.random.PRNGKey(5))

    # sharded over the 8-device mesh
    mesh = create_mesh()
    state_r = replicate(init_state(model, x, cond), mesh)
    x_s = shard_batch(x, mesh)
    cond_s = shard_batch(cond, mesh)
    new_state, m_sharded = step_fn(state_r, x_s, cond_s, jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=2e-4
    )
    # params actually updated
    assert int(new_state.step) == 1


def test_multi_step_dispatch():
    """steps_per_dispatch scans G optimizer steps in one compiled dispatch;
    works with both the uniform and loss-aware samplers."""
    from afford_motion_tpu.diffusion import LossSecondMomentResampler

    rng = np.random.default_rng(9)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)
    G = 3
    xs = jnp.stack([x] * G)
    conds = jax.tree_util.tree_map(lambda a: jnp.stack([a] * G), cond)

    state = init_state(model, x, cond)
    step = make_train_step(model, diffusion, steps_per_dispatch=G)
    state, m = step(state, xs, conds, jax.random.PRNGKey(0))
    assert int(state.step) == G
    assert np.isfinite(float(m["loss"]))

    sampler = LossSecondMomentResampler(diffusion.num_timesteps)
    sstate = sampler.init_state()
    state = init_state(model, x, cond)
    step = make_train_step(model, diffusion, sampler=sampler, steps_per_dispatch=G)
    state, m, sstate = step(state, xs, conds, jax.random.PRNGKey(0), sstate)
    assert int(state.step) == G
    assert int(sstate.loss_counts.sum()) == G * x.shape[0]
