"""SMPL-X LBS + joints->SMPL-X fitting tests (synthetic body model)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from afford_motion_tpu.eval.smplx_lbs import (
    SMPLXModel,
    params_to_verts_joints,
    rodrigues,
    smplx_forward,
)


@pytest.fixture(scope="module")
def model():
    return SMPLXModel.synthetic(num_verts=64)


def test_rodrigues_against_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    aa = rng.normal(size=(10, 3)).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(aa)))
    want = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # zero angle -> identity
    got0 = np.asarray(rodrigues(jnp.zeros((1, 3))))
    np.testing.assert_allclose(got0[0], np.eye(3), atol=1e-6)


def test_rest_pose_is_template(model):
    B = 2
    transl = jnp.zeros((B, 3))
    verts, joints = smplx_forward(model, transl, jnp.zeros((B, 3)), jnp.zeros((B, 63)))
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(model.v_template), rtol=1e-4, atol=1e-5
    )
    want_joints = np.asarray(model.J_regressor @ model.v_template)
    np.testing.assert_allclose(np.asarray(joints[0]), want_joints, rtol=1e-4, atol=1e-5)


def test_translation_equivariance(model):
    rng = np.random.default_rng(1)
    B = 2
    orient = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 0.3)
    pose = jnp.asarray(rng.normal(size=(B, 63)).astype(np.float32) * 0.2)
    t = jnp.asarray([[1.0, -2.0, 0.5], [0.0, 3.0, 1.0]])
    v0, j0 = smplx_forward(model, jnp.zeros((B, 3)), orient, pose)
    v1, j1 = smplx_forward(model, t, orient, pose)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0 + t[:, None]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j0 + t[:, None]), rtol=1e-4, atol=1e-5)


def test_global_rotation_rotates_everything(model):
    """Pure global orientation = rigid rotation about the root joint."""
    B = 1
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    v0, j0 = smplx_forward(model, jnp.zeros((B, 3)), jnp.zeros((B, 3)), jnp.zeros((B, 63)))
    v1, j1 = smplx_forward(model, jnp.zeros((B, 3)), aa, jnp.zeros((B, 63)))
    R = np.asarray(rodrigues(aa))[0]
    root = np.asarray(j0[0, 0])
    want = (np.asarray(v0[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(v1[0]), want, rtol=1e-3, atol=1e-4)


def test_joints_only_forward_bit_identical(model):
    """smplx_joints must equal smplx_forward's joints EXACTLY: the
    refinement loop switched to it (round 4 — skips the vertex stack and
    the per-frame rest-joint regression, both dead at betas=0), so any
    numeric difference would silently change refined eval params."""
    from afford_motion_tpu.eval.smplx_lbs import params_to_joints, smplx_joints

    rng = np.random.default_rng(7)
    B = 5
    transl = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    orient = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 0.4)
    pose = jnp.asarray(rng.normal(size=(B, 63)).astype(np.float32) * 0.3)
    _, j_full = smplx_forward(model, transl, orient, pose)
    j_fast = smplx_joints(model, transl, orient, pose)
    assert np.array_equal(np.asarray(j_full), np.asarray(j_fast))
    # and through the 69-d param entry used by the refine loss
    params = jnp.concatenate([transl, orient, pose], axis=-1)
    assert np.array_equal(
        np.asarray(params_to_verts_joints(model, params)[1]),
        np.asarray(params_to_joints(model, params)),
    )
    # with explicit betas (the prepare/smplx_to_vec path)
    betas = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32) * 0.5)
    _, j_full_b = smplx_forward(model, transl, orient, pose, betas=betas)
    j_fast_b = smplx_joints(model, transl, orient, pose, betas=betas)
    assert np.array_equal(np.asarray(j_full_b), np.asarray(j_fast_b))


def test_refinement_reduces_joint_error(model):
    from afford_motion_tpu.eval.joints_to_smplx import PARAM_DIM, make_refine_fn
    from afford_motion_tpu.eval.smplx_lbs import params_to_verts_joints

    rng = np.random.default_rng(2)
    B, L = 1, 6
    gt_params = np.zeros((B, L, PARAM_DIM), dtype=np.float32)
    gt_params[..., :3] = rng.normal(size=(B, L, 3)) * 0.5
    gt_params[..., 3:] = rng.normal(size=(B, L, 66)) * 0.2
    flat = jnp.asarray(gt_params.reshape(B * L, PARAM_DIM))
    _, gt_joints = params_to_verts_joints(model, flat)
    gt_joints = np.asarray(gt_joints).reshape(B, L, 66)

    init = gt_params + rng.normal(size=gt_params.shape).astype(np.float32) * 0.1
    x_mask = np.zeros((B, L), dtype=bool)
    x_mask[0, 4:] = True  # padded tail must not matter

    refine = make_refine_fn(model, lr=0.02, steps=60)

    def joint_err(params):
        _, j = params_to_verts_joints(model, jnp.asarray(params.reshape(B * L, PARAM_DIM)))
        j = np.asarray(j).reshape(B, L, 66)
        return float(np.mean((j[~x_mask] - gt_joints[~x_mask]) ** 2))

    err0 = joint_err(init)
    out = np.asarray(refine(jnp.asarray(init), jnp.asarray(gt_joints), jnp.asarray(x_mask)))
    err1 = joint_err(out)
    assert err1 < 0.3 * err0, (err0, err1)


def test_regressor_matches_torch_checkpoint(tmp_path):
    """Build the reference's torch regressor, convert its state dict, and
    check output parity — validates both the converter and the post-LN
    TransformerEncoder implementation."""
    import torch
    import torch.nn as nn

    from afford_motion_tpu.eval.joints_to_smplx import (
        JointsToSMPLXRegressor,
        convert_torch_regressor,
    )

    torch.manual_seed(0)

    class TorchPE(nn.Module):
        def __init__(self, d, max_len=1000):
            super().__init__()
            import math
            pe = torch.zeros(max_len, d)
            position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
            div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
            pe[:, 0::2] = torch.sin(position * div)
            pe[:, 1::2] = torch.cos(position * div)
            self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))

        def forward(self, x):  # (L, B, D)
            return x + self.pe[: x.shape[0]]

    class TorchRegressor(nn.Module):
        def __init__(self, d=64, heads=4, ff=128, layers=2):
            super().__init__()
            self.positional_encoder = TorchPE(d)
            self.input_layer = nn.Sequential(
                nn.Linear(66, d // 2), nn.ReLU(), nn.Linear(d // 2, d), nn.ReLU()
            )
            self.output_layer = nn.Linear(d, 69)
            self.TransEncoder = nn.TransformerEncoder(
                nn.TransformerEncoderLayer(
                    d_model=d, nhead=heads, dim_feedforward=ff, dropout=0.1,
                    activation="relu", batch_first=True,
                ),
                num_layers=layers,
            )

        def forward(self, x, x_mask=None):
            x = self.input_layer(x)
            x = self.positional_encoder(x.permute(1, 0, 2)).permute(1, 0, 2)
            x = self.TransEncoder(x, src_key_padding_mask=x_mask)
            return self.output_layer(x)

    m = TorchRegressor().eval()
    path = str(tmp_path / "060.pt")
    torch.save(m.state_dict(), path)

    rng = np.random.default_rng(3)
    B, L = 2, 10
    x = rng.normal(size=(B, L, 66)).astype(np.float32)
    mask = np.zeros((B, L), dtype=bool)
    mask[1, 6:] = True
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    reg = JointsToSMPLXRegressor(latent_dim=64, num_heads=4, ff_size=128, num_layers=2)
    params = {"params": convert_torch_regressor(path)}
    got = np.asarray(reg.apply(params, jnp.asarray(x), jnp.asarray(mask), train=False))
    # padded positions differ (torch outputs NaN-ish there); compare valid
    np.testing.assert_allclose(got[~mask], want[~mask], rtol=2e-4, atol=1e-4)
