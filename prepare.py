"""Data preparation CLI (reference: prepare/process.py + the per-stage
scripts; see prepare/README.md pipeline in the reference).

Stages:
    python prepare.py process --dataset HumanML3D --data_dir <amass_smplx>
    python prepare.py smplx_to_vec --dataset HUMANISE
    python prepare.py process_scene
    python prepare.py contact_data --dataset HUMANISE
    python prepare.py split
    python prepare.py target_mask
"""
import argparse
import glob
import os
import pickle

import numpy as np

from afford_motion_tpu.prepare.raw_datasets import create_extractor
from afford_motion_tpu.utils.io import get_logger
from afford_motion_tpu.utils.misc import natsorted

logger = get_logger()


def cmd_process(args) -> None:
    create_extractor(args.dataset, args.data_dir).process()


def cmd_smplx_to_vec(args) -> None:
    from afford_motion_tpu.eval.smplx_lbs import SMPLXModel
    from afford_motion_tpu.prepare.smplx_to_vec import smplx_to_vec

    model = SMPLXModel.load_default()
    motion_dir = os.path.join(args.out_dir, args.dataset, "motions")
    save_dir = os.path.join(args.out_dir, args.dataset, "motions_pos")
    for pkl in natsorted(glob.glob(os.path.join(motion_dir, "*.pkl"))):
        with open(pkl, "rb") as f:
            smplx = pickle.load(f)
        name = os.path.basename(pkl).replace(".pkl", ".npy")
        smplx_to_vec(smplx, args.dataset, os.path.join(save_dir, name), model)
    logger.info(f"wrote joint vectors to {save_dir}")


def cmd_process_scene(args) -> None:
    from afford_motion_tpu.prepare.process_scene import process_all

    process_all(args.out_dir)


def cmd_contact_data(args) -> None:
    """Pair motions_pos with scene points and build contact_motion/
    (reference: generate_contact_data.py load_* + process)."""
    from afford_motion_tpu.prepare.contact_data import process

    base = os.path.join(args.out_dir, args.dataset)
    import pandas as pd

    anno = pd.read_csv(os.path.join(base, "annotations.csv"))
    scene_data = {}
    motions = []
    for i, path in enumerate(natsorted(glob.glob(os.path.join(base, "motions_pos", "*.npy")))):
        pose_seq = np.load(path)
        idx = int(os.path.basename(path).split(".")[0])
        scene_id = anno.loc[idx]["scene_id"]
        if scene_id not in scene_data:
            scene_data[scene_id] = {
                "pcd": np.load(os.path.join(base, "points", f"{scene_id}.npy"))
            }
        trans = np.eye(4, dtype=np.float32)
        trans[0:3, -1] = [anno.loc[idx][f"scene_trans_{a}"] for a in "xyz"]
        texts = [anno.loc[idx].get("text", "")]
        motions.append((pose_seq, texts, (scene_id, trans), {}))
    process(
        motions, scene_data, os.path.join(base, "contact_motion"),
        num_points=args.num_points, region_size=args.region_size,
        rng=np.random.default_rng(args.seed),
    )
    logger.info(f"wrote contact_motion data for {args.dataset}")


def cmd_geometry(args) -> None:
    """Precompute per-sample rigid-invariant FPS/kNN geometry on the
    accelerator (TPU-native replacement for per-step hierarchy builds).
    --kind sm (4-level SceneMap/PointTrans) or seg (5-level PT-Seg)."""
    import jax.numpy as jnp

    from afford_motion_tpu.models.pointtransformer import (
        SEG_NSAMPLES, SEG_STRIDES,
    )
    from afford_motion_tpu.models.scene_map import SCENEMAP_NSAMPLES, SCENEMAP_STRIDES
    from afford_motion_tpu.ops.hierarchy import build_point_hierarchy, geometry_to_arrays

    strides, nsamples = (
        (SCENEMAP_STRIDES, SCENEMAP_NSAMPLES) if args.kind == "sm"
        else (SEG_STRIDES, SEG_NSAMPLES)
    )
    base = os.path.join(args.out_dir, args.dataset)
    if args.dataset == "H3D":
        contact_files = natsorted(glob.glob(os.path.join(args.out_dir, "H3D", "contacts", "*.npz")))
        out_dir = os.path.join(args.out_dir, "H3D", f"geometry_{args.kind}")
        name_of = lambda f: os.path.basename(f).replace(".npz", "")
    else:
        contact_files = natsorted(
            glob.glob(os.path.join(base, "contact_motion", "contacts", "*.npz"))
        )
        out_dir = os.path.join(base, "contact_motion", f"geometry_{args.kind}")
        name_of = lambda f: os.path.basename(f).replace(".npz", "")
    os.makedirs(out_dir, exist_ok=True)

    B = args.batch_size
    for start in range(0, len(contact_files), B):
        chunk = contact_files[start: start + B]
        xyz = np.stack([np.load(f)["points"][:, :3].astype(np.float32) for f in chunk])
        # sort_fps: cached indices must keep Morton locality per level so
        # the fps-only wire can run the banded windowed kernels on them
        levels = build_point_hierarchy(jnp.asarray(xyz), strides, nsamples,
                                       sort_fps=True)
        arrays = {}
        for k, v in geometry_to_arrays(levels, prefix=f"geo_{args.kind}").items():
            v = np.asarray(v)
            if v.dtype.kind == "i" and v.max(initial=0) < 32768:
                v = v.astype(np.int16)  # halves wire/disk size; cast back on device
            arrays[k] = v
        for b, f in enumerate(chunk):
            # fingerprint of the exact point bytes the cache was built
            # from: `pack` verifies it so caches generated BEFORE a
            # `sort` re-run (stale row order -> wrong indices) are
            # detected instead of silently training on bad neighborhoods
            import zlib

            fp = np.uint32(zlib.crc32(xyz[b].tobytes()) & 0xFFFFFFFF)
            np.savez(os.path.join(out_dir, f"{name_of(f)}.npz"), fp=fp,
                     **{k: v[b] for k, v in arrays.items()})
        logger.info(f"geometry {start + len(chunk)}/{len(contact_files)}")
    logger.info(f"wrote geometry cache to {out_dir}")


def cmd_sort(args) -> None:
    """Rewrite per-item point rows (contacts npz + per-point sidecars) in
    space-filling-curve order (ops/curves.py; ``--curve hilbert`` default,
    ``--curve morton`` for Z-order) so the banded TPU kernels apply. Run
    BEFORE `geometry` and `pack` — their index caches reference row
    positions. Idempotent per curve."""
    from afford_motion_tpu.ops.curves import curve_order

    curve = getattr(args, "curve", "hilbert")

    if args.dataset == "H3D":
        base = os.path.join(args.out_dir, "H3D")
        files = natsorted(glob.glob(os.path.join(base, "contacts", "*.npz")))
        sidecars = lambda b: []
    else:
        base = os.path.join(args.out_dir, args.dataset, "contact_motion")
        files = natsorted(glob.glob(os.path.join(base, "contacts", "*.npz")))

        def sidecars(b):
            return [
                os.path.join(base, sub, b + ".npy")
                for sub in ("target_mask", "affordance")
            ]

    for n, f in enumerate(files):
        data = dict(np.load(f))
        order = curve_order(np.asarray(data["points"])[:, :3], curve)
        npts = len(order)
        for key, v in data.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == npts:
                data[key] = v[order]
        np.savez(f, **data)
        b = os.path.basename(f)[: -len(".npz")]
        for sc in sidecars(b):
            if os.path.exists(sc):
                v = np.load(sc)
                if v.ndim >= 1 and v.shape[0] == npts:
                    np.save(sc, v[order])
        if (n + 1) % 500 == 0 or n + 1 == len(files):
            logger.info(f"sort {n + 1}/{len(files)}")
    logger.info(f"{curve}-sorted {len(files)} items under {base}")


def cmd_pack(args) -> None:
    """Bake contacts + geometry caches into the packed memmap training
    store (afford_motion_tpu/data/packed.py) — the host fast path that
    removes per-epoch npz parsing / casting on 1-core hosts."""
    from afford_motion_tpu.data.packed import pack_h3d, pack_motionx

    joints = [int(j) for j in args.contact_joints.split(",") if j != ""]
    if args.dataset == "H3D":
        pack_h3d(args.out_dir, contact_type=args.contact_type,
                 contact_joints=joints)
    else:
        pack_motionx(args.out_dir, args.dataset,
                     contact_type=args.contact_type, contact_joints=joints)


def cmd_split(args) -> None:
    from afford_motion_tpu.prepare.split import split_all

    split_all(args.out_dir)


def cmd_target_mask(args) -> None:
    from afford_motion_tpu.prepare.target_object_mask import generate_target_object_masks

    generate_target_object_masks(args.out_dir)


def main() -> None:
    from afford_motion_tpu.utils.misc import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS + persistent compile cache
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", choices=[
        "process", "smplx_to_vec", "process_scene", "contact_data", "sort",
        "geometry", "pack", "split", "target_mask",
    ])
    parser.add_argument("--dataset", type=str, default="HumanML3D")
    parser.add_argument("--data_dir", type=str, default="./data/raw")
    parser.add_argument("--out_dir", type=str, default="./data")
    parser.add_argument("--num_points", type=int, default=8192)
    parser.add_argument("--region_size", type=float, default=4.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--kind", type=str, default="sm", choices=["sm", "seg"])
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--contact_type", type=str, default="contact_cont_joints")
    parser.add_argument("--contact_joints", type=str, default="0,10,11,12,20,21")
    parser.add_argument("--curve", type=str, default="hilbert",
                        choices=["hilbert", "morton"])
    args = parser.parse_args()
    {
        "process": cmd_process,
        "smplx_to_vec": cmd_smplx_to_vec,
        "process_scene": cmd_process_scene,
        "contact_data": cmd_contact_data,
        "geometry": cmd_geometry,
        "sort": cmd_sort,
        "pack": cmd_pack,
        "split": cmd_split,
        "target_mask": cmd_target_mask,
    }[args.stage](args)


if __name__ == "__main__":
    main()
