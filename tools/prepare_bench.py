"""Corpus-scale offline data-prep bench (VERDICT r4 item 6).

The reference's contact-map generation is a real offline cost: for every
motion/scene pair it crops a region, samples 8192 points and computes a
22-joint chamfer map on a host KDTree
(/root/reference/prepare/generate_contact_data.py:361-487, ~25k pairs for
the HUMANISE+PROX corpus). This tool times OUR `prepare.process` at
corpus scale on a synthetic reference-sized workload, on three paths:

  host      sklearn KDTree per pair (the reference's algorithm)
  per_pair  the round-1 jitted per-pair kernel (one dispatch + one
            compile per distinct trajectory length)
  batched   the round-5 chunked kernel (joint_distance_map_batch — padded
            L buckets, one device call per 16 pairs)

All paths run through the REAL `process()` (region crop + sampling +
recenter + npz/npy writes included). Emits one JSON line; archive to
docs/artifacts/r05_prepare_bench.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afford_motion_tpu.prepare import contact_data  # noqa: E402

N_SCENES = int(os.environ.get("PB_SCENES", 16))
SCENE_PTS = int(os.environ.get("PB_SCENE_PTS", 50000))
CORPUS = int(os.environ.get("PB_CORPUS", 25000))  # reference-scale pair count
N_HOST = int(os.environ.get("PB_N_HOST", 48))
N_PER_PAIR = int(os.environ.get("PB_N_PER_PAIR", 96))
N_BATCHED = int(os.environ.get("PB_N_BATCHED", 2048))
OUT = os.environ.get("PB_OUT", "/tmp/prepare_bench")


def make_pairs(rng, n):
    """(pose_seq (L,66), texts, (scene_id, 4x4), info) tuples over shared
    synthetic scenes — trajectory random-walks inside the scene extent."""
    pairs = []
    for _ in range(n):
        sid = f"scene{int(rng.integers(N_SCENES))}"
        L = int(rng.integers(24, 197))
        start = rng.uniform(-2, 2, size=3)
        steps = rng.normal(scale=0.03, size=(L, 3)).cumsum(axis=0)
        pelvis = start + steps
        pose = np.tile(pelvis[:, None, :], (1, 22, 1))
        pose += rng.normal(scale=0.3, size=(L, 22, 3))
        pairs.append((
            pose.reshape(L, 66).astype(np.float32),
            ["walk to the chair"],
            (sid, np.eye(4, dtype=np.float32)),
            {},
        ))
    return pairs


def run(path_name, pairs, scene_data, **kw):
    d = os.path.join(OUT, path_name)
    shutil.rmtree(d, ignore_errors=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    contact_data.process(pairs, scene_data, d, rng=rng, **kw)
    wall = time.perf_counter() - t0
    return {"pairs": len(pairs), "wall_s": round(wall, 2),
            "pairs_per_sec": round(len(pairs) / wall, 3),
            "corpus_%d_min" % CORPUS: round(CORPUS / (len(pairs) / wall) / 60, 1)}


if __name__ == "__main__":
    rng = np.random.default_rng(7)
    scene_data = {
        f"scene{i}": {"pcd": np.concatenate([
            rng.uniform(-4, 4, size=(SCENE_PTS, 3)).astype(np.float32),
            rng.random(size=(SCENE_PTS, 3)).astype(np.float32)], axis=1)}
        for i in range(N_SCENES)
    }

    results = {"scenes": N_SCENES, "scene_pts": SCENE_PTS}
    # batched first (warms the bucketed kernels), then the reference-era paths
    results["batched"] = run("batched", make_pairs(rng, N_BATCHED), scene_data,
                             device=True, chunk=16)
    results["per_pair"] = run("per_pair", make_pairs(rng, N_PER_PAIR),
                              scene_data, device=True, chunk=1)
    results["host_kdtree"] = run("host", make_pairs(rng, N_HOST), scene_data,
                                 device=False, chunk=1)
    results["batched_speedup_vs_host"] = round(
        results["batched"]["pairs_per_sec"]
        / results["host_kdtree"]["pairs_per_sec"], 2)
    print(json.dumps(results))
