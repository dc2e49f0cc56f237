"""Multi-device sampling correctness (VERDICT r2 item #5).

The reference's test path is single-GPU (reference test.py:28,57,94-101);
ours batch-shards the full p_sample_loop chain over the device mesh
(test.py sampling mesh + train/sampling.py). These tests pin that the
GSPMD-sharded chain produces the SAME samples as the single-device chain —
a sharding bug in the per-step ``fold_in`` RNG or the hoisted
``encode_contact`` would break equality, not just crash.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from afford_motion_tpu.diffusion import create_gaussian_diffusion
from afford_motion_tpu.models.cmdm import CMDM
from afford_motion_tpu.models.conditioning import add_hierarchies
from afford_motion_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from afford_motion_tpu.train import make_sample_fn
from afford_motion_tpu.utils.config import DictConfig

B, N, L, D = 8, 256, 8, 66


@pytest.fixture(scope="module")
def setup():
    model = CMDM(
        motion_dim=D, latent_dim=32, time_emb_dim=32, text_feat_dim=32,
        contact_dim=6, planes=(8, 16, 32, 64), blocks=(2, 2, 2, 2),
        arch="trans_enc", num_layers=(1, 1), num_heads=4, dim_feedforward=64,
    )
    diffusion = create_gaussian_diffusion(DictConfig({
        "predict_xstart": True, "steps": 4, "noise_schedule": "cosine",
        "timestep_respacing": "", "loss_type": "MSE",
        "learn_sigma": False, "sigma_small": True,
    }))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[1, 5:] = True  # ragged lengths through the mesh
    cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B, 1, 32)).astype(np.float32)),
        "c_pc_xyz": jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)),
        "c_pc_contact": jnp.asarray(rng.random(size=(B, N, 6)).astype(np.float32)),
        "x_mask": jnp.asarray(x_mask),
    }
    cond_h = add_hierarchies(model, cond)
    t = jnp.zeros((B,), dtype=jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, t, cond_h,
                           train=False)
    return model, diffusion, variables, cond


def test_sampler_mesh_matches_single_device(setup):
    model, diffusion, variables, cond = setup
    assert jax.device_count() >= 8, "conftest provisions the 8-device mesh"
    sample_fn = make_sample_fn(model, diffusion, clip_denoised=False)
    key = jax.random.PRNGKey(42)

    # single device: everything committed to device 0
    dev0 = jax.devices()[0]
    out_single = np.asarray(sample_fn(
        jax.device_put(variables, dev0),
        (B, L, D),
        jax.device_put(cond, dev0),
        key,
    ))

    # mesh: batch-sharded cond, replicated params (the test.py layout)
    mesh = create_mesh(jax.devices())
    out_mesh = np.asarray(sample_fn(
        replicate(variables, mesh),
        (B, L, D),
        shard_batch(cond, mesh),
        key,
    ))

    assert out_mesh.shape == out_single.shape
    np.testing.assert_allclose(out_mesh, out_single, rtol=1e-5, atol=1e-5)


def test_sampler_mesh_matches_single_device_ddim(setup):
    """Same equality through the DDIM loop (task.test.sampler=ddim)."""
    model, _, variables, cond = setup
    diffusion = create_gaussian_diffusion(DictConfig({
        "predict_xstart": True, "steps": 8, "noise_schedule": "cosine",
        "timestep_respacing": "ddim4", "loss_type": "MSE",
        "learn_sigma": False, "sigma_small": True,
    }))
    sample_fn = make_sample_fn(model, diffusion, clip_denoised=False,
                               sampler="ddim")
    key = jax.random.PRNGKey(43)
    dev0 = jax.devices()[0]
    out_single = np.asarray(sample_fn(
        jax.device_put(variables, dev0), (B, L, D),
        jax.device_put(cond, dev0), key,
    ))
    mesh = create_mesh(jax.devices())
    out_mesh = np.asarray(sample_fn(
        replicate(variables, mesh), (B, L, D), shard_batch(cond, mesh), key,
    ))
    np.testing.assert_allclose(out_mesh, out_single, rtol=1e-5, atol=1e-5)
