"""Render HumanML3D (263-d) generation results
(reference: visualize_h3d.py:89-210 CLI).

Consumes the pkl files written by Text2MotionInSceneHumanML3DEvaluator
(``humanml/*.pkl`` with denormalized 263-d motions), recovers joint
positions via recover_from_ric, and exports skeleton animations.
"""
import argparse
import glob
import os
import pickle

import numpy as np

from afford_motion_tpu.eval.motion_repr import recover_from_ric
from afford_motion_tpu.eval.visualize import (
    KINEMATIC_CHAIN,
    export_animation,
    skeleton_to_mesh,
)
from afford_motion_tpu.utils.io import get_logger
from afford_motion_tpu.utils.mesh import axis_marker
from afford_motion_tpu.utils.misc import natsorted

logger = get_logger()


def visualize_case(path: str, out_dir: str, njoints: int = 22,
                   save_mesh: bool = False) -> None:
    with open(path, "rb") as f:
        data = pickle.load(f)
    motion = np.asarray(data["motion"], dtype=np.float32)
    m_len = int(data.get("m_len", len(motion)))
    if motion.ndim == 3:  # k-sample file: take the first sample
        motion = motion[0]
    joints = recover_from_ric(motion[:m_len], njoints)

    base = os.path.splitext(os.path.basename(path))[0]
    case_dir = os.path.join(out_dir, base)
    meshes = skeleton_to_mesh(joints, KINEMATIC_CHAIN, njoints)
    if save_mesh:
        os.makedirs(case_dir, exist_ok=True)
        for i, m in enumerate(meshes):
            m.export(os.path.join(case_dir, f"sk_{i:03d}.ply"))
    export_animation(case_dir, meshes, [axis_marker(0.05)])
    logger.info(f"visualized {path} ({data.get('text', '')!r}) -> {case_dir}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", type=str, default="")
    parser.add_argument("--file", type=str, default="")
    parser.add_argument("--cnt", type=int, default=30)
    parser.add_argument("--njoints", type=int, default=22)
    parser.add_argument("--save_mesh", action="store_true")
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
        visualize_case(f, out_dir, njoints=args.njoints, save_mesh=args.save_mesh)


if __name__ == "__main__":
    main()
