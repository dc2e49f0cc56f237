"""On-chip endurance + crash-resume soak (VERDICT r4 item 2b).

Runs the PRODUCTION flagship training path (packed Morton-sorted store ->
device store -> megabatch TrainLoop, the bench.py recipe) for a sustained
wall-clock window through the real train.py CLI, kills it mid-run
(SIGKILL — a crash, not a graceful stop), relaunches with
``task.train.resume_ckpt``, and verifies:
  - the resumed run continues from the checkpoint step,
  - steps/s is stable across the whole soak (first vs second half),
  - the Board loss curve is continuous across the kill (the resumed
    stream replays the uninterrupted batch sequence — tests/test_resume.py
    proves bit-identity at small scale; here we check it at production
    scale and duration).

Reference semantics being exceeded: utils/training.py:55-82 (step-level
resume, data stream restarts). Artifact: docs/artifacts/r05_soak.json +
the archived Board scalars.

  python tools/soak.py --root /tmp/soak --minutes 30 --kill-after 12
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_data(root: Path, n_items: int, points: int) -> str:
    """Synthetic H3D tree -> sort -> geometry (TPU) -> pack: the production
    input pipeline (CLAUDE.md data-pipeline order)."""
    import argparse as ap

    data_dir = root / "data"
    if (data_dir / "H3D" / "packed" / "meta.json").exists():
        return str(data_dir)
    from afford_motion_tpu.data.synthetic import make_synthetic_h3d

    make_synthetic_h3d(str(data_dir), n_items=n_items, num_points=points)
    import prepare as prepare_cli

    prepare_cli.cmd_sort(ap.Namespace(out_dir=str(data_dir), dataset="H3D"))
    prepare_cli.cmd_geometry(ap.Namespace(
        out_dir=str(data_dir), dataset="H3D", kind="sm", batch_size=32))
    prepare_cli.cmd_pack(ap.Namespace(
        out_dir=str(data_dir), dataset="H3D",
        contact_type="contact_cont_joints",
        contact_joints="0,10,11,12,20,21"))
    return str(data_dir)


def train_cmd(root: Path, data_dir: str, max_steps: int, resume: str = "") -> list:
    ov = [
        "train.py",
        "exp_name=soak", f"output_dir={root}/out", f"exp_dir={root}/out/soak",
        "task=text_to_motion_contact_motion_gen", "model=cmdm",
        "model.arch=trans_enc", "model.data_repr=h3d",
        f"task.dataset.data_dir={data_dir}",
        "task.dataset.sigma=0.8", "task.dataset.mix_train_ratio=0.0",
        "task.train.batch_size=32", f"task.train.max_steps={max_steps}",
        "task.train.save_every_step=2000", "task.train.log_every_step=100",
        "task.train.lr_anneal_steps=0",
        "platform=jsonl", "seed=2023",
    ]
    if resume:
        ov.append(f"task.train.resume_ckpt={resume}")
    return [sys.executable] + ov


def parse_board(log_dir: Path) -> list:
    """scalars.jsonl is one line per scalar ({tag, value, step}, both runs
    append to the same file) -> ordered per-step rows."""
    per_step: dict = {}
    f = log_dir / "scalars.jsonl"
    if f.exists():
        for line in f.read_text().splitlines():
            try:
                r = json.loads(line)
                per_step.setdefault(int(r["step"]), {})[r["tag"]] = r["value"]
            except (json.JSONDecodeError, KeyError):
                pass
    rows = [{"step": s, **v} for s, v in sorted(per_step.items())]
    return [r for r in rows if "train/loss" in r]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/soak")
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--kill-after", type=float, default=12.0,
                    help="minutes before the SIGKILL crash")
    ap.add_argument("--n-items", type=int, default=256)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--max-steps", type=int, default=1000000)
    args = ap.parse_args()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    from afford_motion_tpu.utils.misc import apply_platform_env

    apply_platform_env()
    t0 = time.monotonic()
    data_dir = build_data(root, args.n_items, args.points)
    prep_s = time.monotonic() - t0

    log = open(root / "soak.log", "wb")
    report = {"prep_s": round(prep_s, 1), "minutes": args.minutes,
              "kill_after_min": args.kill_after}

    # ---- phase 1: run, then crash
    p = subprocess.Popen(train_cmd(root, data_dir, args.max_steps),
                         cwd=str(REPO), stdout=log, stderr=subprocess.STDOUT)
    time.sleep(args.kill_after * 60)
    p.send_signal(signal.SIGKILL)   # crash, not graceful shutdown
    p.wait()
    report["phase1_rc"] = p.returncode

    ckpt_dir = root / "out" / "soak" / "ckpt"
    from afford_motion_tpu.train.checkpoint import latest_ckpt, parse_step

    ck = latest_ckpt(str(ckpt_dir))
    assert ck, "no checkpoint survived the crash"
    report["resume_ckpt"] = ck
    report["resume_step"] = parse_step(ck)

    # ---- phase 2: resume for the remaining window
    p = subprocess.Popen(train_cmd(root, data_dir, args.max_steps, resume=ck),
                         cwd=str(REPO), stdout=log, stderr=subprocess.STDOUT)
    time.sleep(max(0.0, args.minutes - args.kill_after) * 60)
    p.send_signal(signal.SIGINT)
    try:
        p.wait(timeout=120)
    except subprocess.TimeoutExpired:
        p.kill()
        p.wait()
    log.close()

    # ---- analysis
    rows = parse_board(root / "out" / "soak" / "log")
    runtime = (root / "out" / "soak" / "log" / "runtime.log").read_text()
    assert f"Resumed from {ck}" in runtime, "resume line missing"
    steps = [r["step"] for r in rows]
    sps = [r["train/steps_per_sec"] for r in rows if r.get("train/steps_per_sec")]
    losses = [r["train/loss"] for r in rows]
    half = len(sps) // 2
    report.update({
        "board_points": len(rows),
        "first_step": steps[0] if steps else None,
        "last_step": steps[-1] if steps else None,
        "steps_per_sec_median_first_half": float(__import__("numpy").median(sps[:half])) if half else None,
        "steps_per_sec_median_second_half": float(__import__("numpy").median(sps[half:])) if half else None,
        "loss_first": losses[0] if losses else None,
        "loss_at_kill_boundary": None,
        "loss_last": losses[-1] if losses else None,
    })
    # continuity at the crash boundary: the loss right after resume should
    # be in family with the loss right before the kill
    before = [r for r in rows if r["step"] <= report["resume_step"]]
    after = [r for r in rows if r["step"] > report["resume_step"]]
    if before and after:
        report["loss_at_kill_boundary"] = {
            "before": before[-1]["train/loss"], "after": after[0]["train/loss"],
        }
    out = REPO / "docs" / "artifacts" / "r05_soak.json"
    out.write_text(json.dumps(report, indent=1))
    # archive the raw curve next to it
    import shutil

    board_dir = root / "out" / "soak" / "log"
    for f in sorted(board_dir.glob("*.jsonl")):
        shutil.copy(f, REPO / "docs" / "artifacts" / f"r05_soak_board_{f.name}")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
