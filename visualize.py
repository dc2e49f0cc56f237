"""Render generated motion results to meshes / videos
(reference: visualize.py:26-143 CLI).

Consumes the per-sequence pkl files written by Text2MotionInSceneEvaluator
(``joints/*.pkl`` with joints + optional SMPL-X params + scene pointers).
Without a pyrender/ffmpeg stack (headless TPU hosts) the same content is
exported as per-frame PLY/OBJ meshes — pass --save_mesh.
"""
import argparse
import glob
import os
import pickle

import numpy as np

from afford_motion_tpu.eval.visualize import (
    KINEMATIC_CHAIN,
    export_animation,
    skeleton_to_mesh,
)
from afford_motion_tpu.utils.io import get_logger
from afford_motion_tpu.utils.mesh import axis_marker
from afford_motion_tpu.utils.misc import natsorted

logger = get_logger()


def visualize_case(path: str, out_dir: str, render_joint: bool = True,
                   save_mesh: bool = False) -> None:
    with open(path, "rb") as f:
        data = pickle.load(f)
    joints = np.asarray(data["joints"]).reshape(-1, 22, 3)

    if not render_joint and "params" in data:
        try:
            from afford_motion_tpu.eval.smplx_lbs import SMPLXModel, params_to_verts_joints
            from afford_motion_tpu.utils.mesh import SimpleMesh

            model = SMPLXModel.load_default()
            params = np.asarray(data["params"]).reshape(-1, 69)[: len(joints)]
            import jax.numpy as jnp

            verts, _ = params_to_verts_joints(model, jnp.asarray(params))
            verts = np.asarray(verts)
            meshes = [SimpleMesh(verts[i], model.faces) for i in range(len(verts))]
        except FileNotFoundError:
            logger.warning("SMPL-X model unavailable; falling back to skeleton")
            meshes = skeleton_to_mesh(joints, KINEMATIC_CHAIN)
    else:
        meshes = skeleton_to_mesh(joints, KINEMATIC_CHAIN)

    base = os.path.splitext(os.path.basename(path))[0]
    case_dir = os.path.join(out_dir, base)
    if save_mesh:
        os.makedirs(case_dir, exist_ok=True)
        for i, m in enumerate(meshes):
            m.export(os.path.join(case_dir, f"sk_{i:03d}.ply"))
    export_animation(case_dir, meshes, [axis_marker(0.05)])
    logger.info(f"visualized {path} -> {case_dir}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", type=str, default="")
    parser.add_argument("--file", type=str, default="")
    parser.add_argument("--cnt", type=int, default=30)
    parser.add_argument("--save_mesh", action="store_true")
    parser.add_argument("--save_scene", action="store_true")
    parser.add_argument("--render_joint", action="store_true")
    parser.add_argument("--out_dir", type=str, default="")
    args = parser.parse_args()

    files = []
    if args.file:
        files = [args.file]
    elif args.folder:
        files = natsorted(glob.glob(os.path.join(args.folder, "*.pkl")))[: args.cnt]
    if not files:
        parser.error("provide --file or --folder")
    out_dir = args.out_dir or (args.folder or os.path.dirname(args.file)) + "_vis"
    for f in files:
        visualize_case(f, out_dir, render_joint=args.render_joint, save_mesh=args.save_mesh)


if __name__ == "__main__":
    main()
