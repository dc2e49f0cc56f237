"""Metric-level A/B of the shipped TPU approximations (VERDICT r1 #4).

The reference's acceptance criterion is *eval metrics*, not loss curves
(reference: utils/eval/eval_humanml.py:164-183). This harness measures what
the shipped deviations (near-exact Pallas kNN / approx_min_k, banded
windowed neighborhoods, bf16 activations) do to evaluator output, holding
everything else fixed:

- ONE synthetic two-stage pipeline (Morton-sorted clouds so the banded leg
  is well-posed), trained once on the exact/f32 path;
- test.py re-run per leg over the SAME checkpoint with the SAME sampling
  seed — the only difference between legs is compute-path numerics;
- metric deltas reported relative to the exact leg.

CI (CPU) runs the bf16 leg (approx_min_k is exact on CPU and the Pallas
kernels are TPU-only, so 'shipped' == 'bf16' there); the full stack is
measured on the real TPU via ``python tools/metric_ab.py`` and recorded in
docs/PARITY.md.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Legs: name -> model overrides applied to the stage-2 (CMDM) test run.
LEG_EXACT = ["model.dtype=float32", "model.knn_exact=true", "model.use_banded=false"]
LEG_BF16 = ["model.dtype=bfloat16", "model.knn_exact=true", "model.use_banded=false"]
LEG_SHIPPED = ["model.dtype=bfloat16", "model.knn_exact=false", "model.use_banded=false"]
LEG_BANDED = ["model.dtype=bfloat16", "model.knn_exact=false", "model.use_banded=true"]


def _curve_sort_dir(data_dir: str, curve: str = "hilbert") -> int:
    """Curve-sort every contacts npz under the synthetic tree (the banded
    kernels' window assumption; a pure relabeling for every other leg —
    models are permutation-equivariant over the cloud)."""
    from afford_motion_tpu.ops.morton import sort_contact_npz

    n = 0
    for p in Path(data_dir).rglob("*.npz"):
        try:
            n += bool(sort_contact_npz(str(p), curve=curve))
        except (KeyError, ValueError):
            continue
    return n


def _common(data_dir: str, out_dir: str, exp: str, num_points: int,
            steps: int, diffusion_steps: int) -> List[str]:
    return [
        f"exp_name={exp}",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/{exp}",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={num_points}",
        f"diffusion.steps={diffusion_steps}",
        f"task.train.max_steps={steps}",
        "task.train.batch_size=2",
        "task.train.log_every_step=8",
        f"task.train.save_every_step={steps}",
        "task.test.batch_size=2",
        "seed=2023",
    ]


def _cdm_overrides(base: List[str]) -> List[str]:
    return base + [
        "task=contact_gen",
        "model=cdm",
        "model.arch=Perceiver",
        "model.dtype=float32",
        "model.scene_model.use_scene_model=False",
        "model.arch_perceiver.encoder_q_input_channels=64",
        "model.arch_perceiver.encoder_kv_input_channels=32",
        "model.arch_perceiver.decoder_q_input_channels=32",
        "model.arch_perceiver.decoder_kv_input_channels=64",
        "model.arch_perceiver.encoder_num_heads=4",
        "model.arch_perceiver.decoder_num_heads=4",
        "model.arch_perceiver.encoder_self_attn_num_layers=1",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
    ]


def _cmdm_overrides(base: List[str], contact_dir: str) -> List[str]:
    return base + [
        "task=contact_motion_gen",
        "model=cmdm",
        "model.latent_dim=64",
        "model.time_emb_dim=64",
        "model.num_heads=4",
        "model.dim_feedforward=128",
        "model.num_layers=[1,1]",
        "model.contact_model.planes=[16,32,64,128]",
        "task.dataset.mix_train_ratio=0.0",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "task.evaluator.eval_metrics=['apd']",
        f"task.test.contact_folder={contact_dir}",
    ]


def _latest_metrics(exp_dir: str) -> Dict[str, list]:
    dirs = sorted(Path(exp_dir, "eval").glob("test-*"), key=lambda p: p.stat().st_mtime)
    return json.loads((dirs[-1] / "metrics.json").read_text())


def run_ab(
    root: str,
    legs: Dict[str, Sequence[str]],
    *,
    num_points: int = 256,
    n_items: int = 8,
    train_steps: int = 8,
    diffusion_steps: int = 8,
    curve: str = "hilbert",
) -> Dict[str, Dict[str, float]]:
    """Train once (exact path), then evaluate each leg over the same
    checkpoint. Returns {leg: {metric: mean_value}}."""
    from afford_motion_tpu.data.synthetic import make_synthetic_data_dir
    import test as test_entry
    import train as train_entry

    root_p = Path(root)
    data_dir = make_synthetic_data_dir(str(root_p / "data"), n_items=n_items,
                                       num_points=num_points)
    n_sorted = _curve_sort_dir(data_dir, curve)
    print(f"[ab] synthetic data at {data_dir} ({curve}-sorted {n_sorted} npz)")
    out_dir = str(root_p / "out")
    base = _common(data_dir, out_dir, "ab_cdm", num_points, train_steps,
                   diffusion_steps)

    # stage 1 once (hierarchy-free Perceiver): its pred_contact handoff is
    # identical input for every stage-2 leg
    cdm = _cdm_overrides(base)
    train_entry.main(cdm)
    test_entry.main(cdm)
    contact_dir = str(sorted(Path(out_dir, "ab_cdm", "eval").glob("test-*"))[-1])
    print(f"[ab] stage-1 handoff: {contact_dir}")

    # stage 2 trained ONCE on the exact/f32 path (neutral weights)
    base2 = _common(data_dir, out_dir, "ab_cmdm", num_points, train_steps,
                    diffusion_steps)
    cmdm = _cmdm_overrides(base2, contact_dir)
    train_entry.main(cmdm + list(legs.get("train", LEG_EXACT)))

    results: Dict[str, Dict[str, float]] = {}
    for name, ov in legs.items():
        if name == "train":
            continue
        test_entry.main(cmdm + list(ov))
        metrics = _latest_metrics(str(Path(out_dir, "ab_cmdm")))
        results[name] = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.size and np.issubdtype(arr.dtype, np.number):
                results[name][k] = float(arr.mean())
        print(f"[ab] leg {name}: {results[name]}")
    return results


def relative_deltas(
    results: Dict[str, Dict[str, float]], baseline: str = "exact"
) -> Dict[str, Dict[str, float]]:
    ref = results[baseline]
    out = {}
    for name, vals in results.items():
        if name == baseline:
            continue
        out[name] = {
            k: abs(v - ref[k]) / (abs(ref[k]) + 1e-12)
            for k, v in vals.items() if k in ref
        }
    return out


def main() -> None:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_points", type=int, default=8192,
                    help="8192 engages the Pallas kNN + banded kernels (TPU)")
    ap.add_argument("--train_steps", type=int, default=8)
    ap.add_argument("--diffusion_steps", type=int, default=8)
    ap.add_argument("--curve", default="hilbert", choices=["hilbert", "morton"],
                    help="cloud row order for the banded leg (prepare.py sort default)")
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="metric_ab_")
    legs = {
        "exact": LEG_EXACT,
        "bf16": LEG_BF16,
        "shipped": LEG_SHIPPED,
        "banded": LEG_BANDED,
    }
    results = run_ab(root, legs, num_points=args.num_points,
                     train_steps=args.train_steps,
                     diffusion_steps=args.diffusion_steps, curve=args.curve)
    deltas = relative_deltas(results)
    payload = {"results": results, "relative_deltas_vs_exact": deltas}
    print(json.dumps(payload, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
