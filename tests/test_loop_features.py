"""Tests for the train-loop input-path features: integer step seeds
(derived on device), half-precision wire casting, and the unused
geometry-field drop for encoder-only SceneMaps."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_train import tiny_cmdm, tiny_diffusion, tiny_batch, init_state
from afford_motion_tpu.train import make_train_step


def test_integer_seed_train_step_deterministic():
    """The train step accepts a plain uint32 seed (key derived inside jit)
    and is a deterministic function of it."""
    rng = np.random.default_rng(3)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)

    step = make_train_step(model, diffusion)
    s1, m1 = step(init_state(model, x, cond), x, cond, np.uint32(7))
    s2, m2 = step(init_state(model, x, cond), x, cond, np.uint32(7))
    assert float(m1["loss"]) == float(m2["loss"])
    _, m3 = step(init_state(model, x, cond), x, cond, np.uint32(8))
    assert float(m3["loss"]) != float(m1["loss"])
    # PRNGKey path still accepted
    _, m4 = step(init_state(model, x, cond), x, cond, jax.random.PRNGKey(7))
    assert np.isfinite(float(m4["loss"]))


def test_integer_seed_multi_step_dispatch():
    rng = np.random.default_rng(4)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)
    G = 2
    xs = jnp.stack([x] * G)
    conds = jax.tree_util.tree_map(lambda a: jnp.stack([a] * G), cond)
    step = make_train_step(model, diffusion, steps_per_dispatch=G)
    state, m = step(init_state(model, x, cond), xs, conds, np.uint32(11))
    assert int(state.step) == G and np.isfinite(float(m["loss"]))


def test_half_wire_casts_only_conditioning():
    from afford_motion_tpu.data.base import _half_wire

    d = {
        "x": np.ones((4, 3), np.float32),
        "x_mask": np.zeros((4,), bool),
        "c_pc_xyz": np.ones((8, 3), np.float32),
        "c_pc_contact": np.ones((8, 6), np.float32),
        "geo_sm_l0_up_weight": np.ones((8, 3), np.float32),
        "geo_sm_l0_idx": np.ones((8, 3), np.int32),
        "info_scene_trans": np.eye(4, dtype=np.float32),
        "c_text": "hello",
    }
    out = _half_wire(dict(d))
    assert out["x"].dtype == np.float32            # diffusion target untouched
    assert out["info_scene_trans"].dtype == np.float32  # metadata untouched
    assert out["c_pc_xyz"].dtype == np.float16
    assert out["c_pc_contact"].dtype == np.float16
    assert out["geo_sm_l0_up_weight"].dtype == np.float16
    assert out["geo_sm_l0_idx"].dtype == np.int32  # indices untouched
    assert out["c_text"] == "hello"


def test_half_wire_phase_gating():
    """half_wire applies in train phase only; eval keeps f32 inputs."""
    from afford_motion_tpu.data.base import BaseDataset
    from afford_motion_tpu.utils.config import DictConfig

    cfg = DictConfig({
        "half_wire": True,
        "train_transforms": ["NumpyToTensor"],
        "test_transforms": ["NumpyToTensor"],
    })
    sample = {"c_pc_xyz": np.ones((8, 3), np.float32)}

    ds = BaseDataset()
    ds._setup_transform(cfg, "train")
    assert ds.transform(dict(sample))["c_pc_xyz"].dtype == np.float16
    ds._setup_transform(cfg, "test")
    assert ds.transform(dict(sample))["c_pc_xyz"].dtype == np.float32


def test_train_step_accepts_f16_wire():
    """FPS/kNN distance math upcasts to f32 internally; an f16 conditioning
    wire must produce a finite loss."""
    rng = np.random.default_rng(5)
    model = tiny_cmdm()
    diffusion = tiny_diffusion()
    x, cond = tiny_batch(rng)
    cond = dict(cond)
    cond["c_pc_xyz"] = cond["c_pc_xyz"].astype(jnp.float16)
    cond["c_pc_contact"] = cond["c_pc_contact"].astype(jnp.float16)
    step = make_train_step(model, diffusion)
    _, m = step(init_state(model, x, cond), x, cond, np.uint32(1))
    assert np.isfinite(float(m["loss"]))


def test_drop_unused_geometry_fields():
    """host_prepare_cond cuts up-interpolation arrays when asked; the
    trans_enc CMDM reports it never reads them."""
    from afford_motion_tpu.models.conditioning import host_prepare_cond
    from afford_motion_tpu.models.text import TextEncoder

    model = tiny_cmdm()
    assert model.needs_up_interpolation is False  # arch == trans_enc

    class _TE(TextEncoder):
        def __init__(self):
            pass

        def encode(self, texts):
            return np.zeros((len(texts), 32), np.float32)

    batch = {
        "x": np.zeros((2, 4, 66), np.float32),
        "c_text": ["a", "b"],
        "geo_sm_l0_up_idx": np.zeros((2, 8, 3), np.int32),
        "geo_sm_l0_up_weight": np.zeros((2, 8, 3), np.float32),
        "geo_sm_l0_down_idx": np.zeros((2, 8, 8), np.int32),
    }
    _, cond = host_prepare_cond(batch, _TE(), ("_up_idx", "_up_weight"))
    assert "geo_sm_l0_up_idx" not in cond
    assert "geo_sm_l0_up_weight" not in cond
    assert "geo_sm_l0_down_idx" in cond
    _, cond_full = host_prepare_cond(batch, _TE())
    assert "geo_sm_l0_up_idx" in cond_full
