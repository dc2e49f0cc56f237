"""Paired, variance-controlled A/B for the banded-window deviation
(VERDICT r3 #2 — replaces the round-2/3 proxy whose pipeline-instance
noise, 0.18-2.1%, was wider than the effects it had to resolve).

Design (the honest instrument the verdict asked for):

- ONE synthetic two-stage pipeline, built once; ONE stage-2 checkpoint,
  trained once on the exact/f32 path — never retrained per leg.
- Legs differ ONLY in the neighbor sets: full kNN vs banded windows at
  W=512/256/128, proportional vs adaptive starts — all through the
  round-4 config knobs (model.use_banded / banded_window /
  banded_adaptive), bf16 compute everywhere (the shipped dtype).
- K >= 5 repeats per leg with DIFFERENT sampling seeds, but the SAME seed
  set ACROSS legs (common random numbers): the per-seed paired delta
  vs the full-kNN leg cancels the sampling variance that drowned the old
  proxy; we report mean +- 95% CI of both the APD delta and the direct
  per-seed motion RMS deviation.
- A fixed-seed TRAIN-side check: loss curves of exact-vs-banded training
  from the same init/data order bound the train-side impact too.

Acceptance class: the reference's own eval protocol
(reference: utils/eval/eval_humanml.py:164-183); the APD here is the same
diversity statistic its scene protocol reports (utils/evaluate.py:373-386).

Run on the real TPU: ``python tools/banded_paired_ab.py --out
banded_paired_ab.json`` (~30 min). CPU smoke: ``--num_points 256
--repeats 2`` (banded kernels run in interpret mode there; the recorded
evidence must come from the chip).
"""
from __future__ import annotations

import json
import os
import pickle
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.metric_ab import (  # noqa: E402
    _cdm_overrides, _cmdm_overrides, _common, _curve_sort_dir,
)

# Legs: ONLY the neighbor sets differ (shared bf16 compute, shared ckpt).
LEGS: Dict[str, List[str]] = {
    "full": ["model.dtype=bfloat16", "model.use_banded=false"],
    "w512_prop": ["model.dtype=bfloat16", "model.use_banded=true",
                  "model.banded_window=512", "model.banded_adaptive=false"],
    "w512_adapt": ["model.dtype=bfloat16", "model.use_banded=true",
                   "model.banded_window=512", "model.banded_adaptive=true"],
    "w256_prop": ["model.dtype=bfloat16", "model.use_banded=true",
                  "model.banded_window=256", "model.banded_adaptive=false"],
    "w256_adapt": ["model.dtype=bfloat16", "model.use_banded=true",
                   "model.banded_window=256", "model.banded_adaptive=true"],
    "w128_prop": ["model.dtype=bfloat16", "model.use_banded=true",
                  "model.banded_window=128", "model.banded_adaptive=false"],
    "w128_adapt": ["model.dtype=bfloat16", "model.use_banded=true",
                   "model.banded_window=128", "model.banded_adaptive=true"],
}

# the shipped default recipe (docs/PERF.md round-3 verdict)
SHIPPED = "w128_adapt"


def _latest_eval_dir(exp_dir: str) -> Path:
    return sorted(Path(exp_dir, "eval").glob("test-*"),
                  key=lambda p: p.stat().st_mtime)[-1]


def _collect_run(eval_dir: Path) -> Dict:
    metrics = json.loads((eval_dir / "metrics.json").read_text())
    joints = {}
    jdir = eval_dir / "joints"
    if jdir.exists():
        for p in sorted(jdir.glob("*.pkl")):
            with open(p, "rb") as f:
                payload = pickle.load(f)
            joints[p.stem] = np.asarray(payload["joints"], dtype=np.float32)
    return {"metrics": metrics, "joints": joints}


def _apd(metrics: Dict) -> float:
    vals = metrics.get("apd", [])
    return float(np.mean(vals)) if vals else float("nan")


def _motion_rms_delta(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray]) -> float:
    """Mean per-sample relative RMS deviation between two legs' sampled
    joints (same seed => same noise stream; deviation == neighbor-set
    effect propagated through the denoiser chain)."""
    deltas = []
    for k in a:
        if k not in b or a[k].shape != b[k].shape:
            continue
        denom = float(np.sqrt(np.mean(a[k] ** 2))) + 1e-9
        deltas.append(float(np.sqrt(np.mean((a[k] - b[k]) ** 2))) / denom)
    return float(np.mean(deltas)) if deltas else float("nan")


def _ci95(x: Sequence[float]) -> Dict[str, float]:
    arr = np.asarray([v for v in x if np.isfinite(v)], dtype=np.float64)
    n = len(arr)
    if n == 0:
        return {"mean": float("nan"), "ci95": float("nan"), "n": 0}
    # two-sided t critical values for small n (df = n-1)
    t_tab = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
             6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}
    t = t_tab.get(n - 1, 2.0)
    sem = arr.std(ddof=1) / np.sqrt(n) if n > 1 else float("nan")
    return {"mean": float(arr.mean()), "ci95": float(t * sem) if n > 1 else float("nan"),
            "n": n}


def _parse_losses(log_path: Path) -> List[float]:
    pat = re.compile(r"step \d+/\d+ .*? loss ([0-9.eE+-]+)")
    out = []
    for line in log_path.read_text().splitlines():
        m = pat.search(line)
        if m:
            out.append(float(m.group(1)))
    return out


def run_paired_ab(root: str, *, num_points: int = 8192, n_items: int = 8,
                  train_steps: int = 8, diffusion_steps: int = 8,
                  repeats: int = 5, curve: str = "hilbert",
                  legs: Optional[Dict[str, List[str]]] = None,
                  train_parity: bool = True) -> Dict:
    from afford_motion_tpu.data.synthetic import make_synthetic_data_dir
    import test as test_entry
    import train as train_entry

    root_p = Path(root)
    data_dir = make_synthetic_data_dir(str(root_p / "data"), n_items=n_items,
                                       num_points=num_points)
    _curve_sort_dir(data_dir, curve)
    out_dir = str(root_p / "out")

    # stage 1 once: the handoff is identical input for every leg
    base1 = _common(data_dir, out_dir, "pab_cdm", num_points, train_steps,
                    diffusion_steps)
    cdm = _cdm_overrides(base1)
    train_entry.main(cdm)
    test_entry.main(cdm)
    contact_dir = str(_latest_eval_dir(str(Path(out_dir, "pab_cdm"))))
    print(f"[pab] stage-1 handoff: {contact_dir}")

    # ONE stage-2 checkpoint, exact/f32 train (never retrained per leg)
    base2 = _common(data_dir, out_dir, "pab_cmdm", num_points, train_steps,
                    diffusion_steps)
    cmdm = _cmdm_overrides(base2, contact_dir)
    train_entry.main(cmdm + ["model.dtype=float32", "model.knn_exact=true",
                             "model.use_banded=false"])

    # legs x paired seeds over the SAME checkpoint. ``seed`` drives the
    # sampling PRNGKey; ``shuffle_seed`` is pinned to the training seed so
    # the test-case set (and therefore the stage-1 pred_contact handoff
    # coverage) is IDENTICAL for every seed and leg — the config default
    # is shuffle_seed=${seed}, which would silently evaluate different
    # cases per repeat and break both the handoff and the pairing.
    legs = dict(legs) if legs else dict(LEGS)
    assert "full" in legs, "the paired design needs the full-kNN leg"
    runs: Dict[str, Dict[int, Dict]] = {}
    for leg, ov in legs.items():
        runs[leg] = {}
        for r in range(repeats):
            seed = 31000 + r
            test_entry.main(cmdm + list(ov) + [
                f"seed={seed}", "task.dataset.shuffle_seed=2023"])
            runs[leg][seed] = _collect_run(
                _latest_eval_dir(str(Path(out_dir, "pab_cmdm"))))
            print(f"[pab] leg={leg} seed={seed} "
                  f"apd={_apd(runs[leg][seed]['metrics']):.5f}")

    seeds = sorted(runs["full"].keys())
    report: Dict = {"legs": {}, "paired_vs_full": {}, "config": {
        "num_points": num_points, "repeats": repeats, "curve": curve,
        "train_steps": train_steps, "diffusion_steps": diffusion_steps,
    }}
    for leg in legs:
        apds = [_apd(runs[leg][s]["metrics"]) for s in seeds]
        report["legs"][leg] = {"apd": _ci95(apds), "apd_per_seed": apds}
        if leg == "full":
            continue
        # the paired statistics: per-seed deltas vs the full-kNN leg
        apd_delta = [
            abs(_apd(runs[leg][s]["metrics"]) - _apd(runs["full"][s]["metrics"]))
            / (abs(_apd(runs["full"][s]["metrics"])) + 1e-12)
            for s in seeds
        ]
        rms = [
            _motion_rms_delta(runs[leg][s]["joints"], runs["full"][s]["joints"])
            for s in seeds
        ]
        report["paired_vs_full"][leg] = {
            "apd_rel_delta": _ci95(apd_delta),
            "motion_rms_rel_delta": _ci95(rms),
        }

    # ---- train-side loss-curve parity (same init + data order)
    losses = {}
    shipped = SHIPPED if SHIPPED in legs else next(l for l in legs if l != "full")
    for leg, ov in (() if not train_parity else
                    (("full", legs["full"]), (shipped, legs[shipped]))):
        exp = f"pab_train_{leg}"
        baset = _common(data_dir, out_dir, exp, num_points,
                        max(train_steps, 8), diffusion_steps)
        ovr = _cmdm_overrides(baset, contact_dir)
        ovr = [o if not o.startswith("task.train.log_every_step")
               else "task.train.log_every_step=1" for o in ovr]
        train_entry.main(ovr + list(ov) + ["task.train.log_every_step=1",
                                           "task.train.steps_per_dispatch=1"])
        losses[leg] = _parse_losses(Path(out_dir, exp, "log", "runtime.log"))
    if losses:
        n = min(len(losses["full"]), len(losses[shipped]))
        if n:
            a = np.asarray(losses["full"][:n])
            b = np.asarray(losses[shipped][:n])
            report["train_loss_parity"] = {
                "steps": n, "leg": shipped,
                "max_rel_divergence": float(np.max(np.abs(a - b) / (np.abs(a) + 1e-9))),
                "full": a.tolist(), shipped: b.tolist(),
            }
    return report


def main() -> None:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_points", type=int, default=8192)
    ap.add_argument("--n_items", type=int, default=8)
    ap.add_argument("--train_steps", type=int, default=8)
    ap.add_argument("--diffusion_steps", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--curve", default="hilbert", choices=["hilbert", "morton"])
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="banded_pab_")
    report = run_paired_ab(
        root, num_points=args.num_points, n_items=args.n_items,
        train_steps=args.train_steps, diffusion_steps=args.diffusion_steps,
        repeats=args.repeats, curve=args.curve,
    )
    print(json.dumps(report, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
