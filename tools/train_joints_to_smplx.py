"""Train the joints -> SMPL-X parameter regressor
(reference: utils/joints_to_smplx.py:216-402 own train/test CLI).

Data: SMPL-X parameter pkls from the prepare pipeline
(``{set}/motions/*.pkl`` -> (pose_seq (L, >=69), betas)); the 22-joint
inputs are produced by the JAX LBS, so (joints, params) pairs are exactly
consistent with the body model used at eval time. Loss: masked params MSE
+ joint reconstruction MSE through the (frozen) LBS.

    python tools/train_joints_to_smplx.py --data_dir ./data \
        --sets HUMANISE PROX --steps 60000 \
        --out ./utils/joints_to_smplx/regressor.npz
"""
import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pairs(data_dir, sets, model, max_len=196, min_len=24, max_files=None):
    import jax.numpy as jnp

    from afford_motion_tpu.eval.smplx_lbs import smplx_forward

    pairs = []
    for s in sets:
        files = sorted(glob.glob(os.path.join(data_dir, s, "motions", "*.pkl")))
        if max_files:
            files = files[:max_files]
        for f in files:
            with open(f, "rb") as fp:
                pose_seq, betas = pickle.load(fp)
            if not (min_len <= len(pose_seq) <= max_len):
                continue
            params = np.asarray(pose_seq[:, :69], dtype=np.float32)
            _, joints = smplx_forward(
                model,
                jnp.asarray(params[:, :3]), jnp.asarray(params[:, 3:6]),
                jnp.asarray(params[:, 6:69]),
            )
            joints = np.asarray(joints[:, :22, :]).reshape(len(params), 66)
            pairs.append((joints, params))
    return pairs


def pad_batch(pairs, idxs, max_len=196):
    B = len(idxs)
    joints = np.zeros((B, max_len, 66), dtype=np.float32)
    params = np.zeros((B, max_len, 69), dtype=np.float32)
    mask = np.ones((B, max_len), dtype=bool)
    for b, i in enumerate(idxs):
        j, p = pairs[i]
        L = len(j)
        joints[b, :L], params[b, :L], mask[b, :L] = j, p, False
    return joints, params, mask


def main():
    from afford_motion_tpu.utils.misc import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS=cpu under the TPU sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="./data")
    ap.add_argument("--sets", nargs="+", default=["HUMANISE", "PROX"])
    ap.add_argument("--steps", type=int, default=60000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--joint_loss_weight", type=float, default=1.0)
    ap.add_argument("--out", default="./utils/joints_to_smplx/regressor.npz")
    ap.add_argument("--max_files", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from afford_motion_tpu.eval.joints_to_smplx import (
        PARAM_DIM,
        JointsToSMPLXRegressor,
        save_regressor_npz,
    )
    from afford_motion_tpu.eval.smplx_lbs import SMPLXModel, params_to_verts_joints
    from afford_motion_tpu.utils.io import get_logger

    logger = get_logger()
    body = SMPLXModel.load_default()
    pairs = build_pairs(args.data_dir, args.sets, body, max_files=args.max_files)
    assert pairs, "no training sequences found"
    logger.info(f"{len(pairs)} sequences")

    reg = JointsToSMPLXRegressor()
    dummy_j = jnp.zeros((1, 196, 66))
    variables = reg.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                         dummy_j, jnp.zeros((1, 196), bool), train=False)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, joints, gt_params, mask, rng):
        def loss_fn(p):
            pred = reg.apply({"params": p}, joints, mask, train=True,
                             rngs={"dropout": rng})
            valid = (~mask).astype(jnp.float32)[..., None]
            p_loss = jnp.sum(((pred - gt_params) ** 2) * valid) / jnp.maximum(
                jnp.sum(valid) * PARAM_DIM, 1.0)
            B, L, _ = pred.shape
            _, j = params_to_verts_joints(body, pred.reshape(B * L, PARAM_DIM))
            j = j.reshape(B, L, 66)
            j_loss = jnp.sum(((j - joints) ** 2) * valid) / jnp.maximum(
                jnp.sum(valid) * 66, 1.0)
            return p_loss + args.joint_loss_weight * j_loss, (p_loss, j_loss)

        (loss, (pl, jl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, pl, jl

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = variables["params"]
    for it in range(args.steps):
        idxs = rng.integers(0, len(pairs), size=args.batch_size)
        joints, gt_params, mask = pad_batch(pairs, idxs)
        key, sub = jax.random.split(key)
        params, opt_state, loss, pl, jl = step(
            params, opt_state, jnp.asarray(joints), jnp.asarray(gt_params),
            jnp.asarray(mask), sub,
        )
        if it % 200 == 0:
            logger.info(f"step {it}: loss={float(loss):.5f} params={float(pl):.5f} joints={float(jl):.5f}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_regressor_npz(args.out, params)
    logger.info(f"saved regressor to {args.out}")


if __name__ == "__main__":
    main()
