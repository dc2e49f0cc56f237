"""Full-protocol evaluation rehearsal: run the REAL CLI surfaces at the
reference's protocol scale off synthetic checkpoints and MEASURE every
stage's wall-clock (VERDICT r4 item 1 — replaces PERF.md's arithmetic
projections with executed-pipeline numbers).

Reference protocol being rehearsed / beaten:
  - stage-1 contact generation: /root/reference/scripts/t2m_contact/test.sh
    (CDM Perceiver, diffusion.steps=500, b32; wo_mm: k=0 x 32 batches,
    w_mm: k=30 x 4 batches, num_k_samples=128)
  - stage-2 motion generation: scripts/t2m_contact_motion/test.sh
    (CMDM trans_enc, diffusion.steps=1000, b32, same eval-mode split)
  - offline MDM-protocol eval: h3d_eval/eval_h3d_offline.py:37-62
    (quotes ~12 h for wo_mm, ~15 h for mm_short on the reference rig)
  - scene protocol: utils/evaluate.py:237-427 (SMPL-X fit -> LBS -> SDF
    physics -> APD) over the full sample list.

Stages (each records wall-clock into <root>/ledger.json):
  setup    synthetic protocol-scale assets (H3D tree: 4384-item test split
           at 8192 points; T2M evaluator finest.tar; eval meta; SMPL-X
           regressor weights)
  ckpt     mint stage-1/stage-2 checkpoints through train.py (3 steps,
           production model configs)
  gen      test.py generation: --mode wo_mm|w_mm, --sampler ddpm|ddim50
  offline  python -m h3d_eval.eval_h3d_offline --eval_mode wo_mm|mm_short
  scene    Text2MotionInSceneEvaluator over --n sequences (fit+physics+
           apd+save), synthetic SMPL-X at the official 10475/20908 mesh
  report   compose docs/artifacts/r05_protocol_rehearsal.json

Typical full sequence (on the TPU host):
  python tools/protocol_rehearsal.py setup --root /tmp/r05
  python tools/protocol_rehearsal.py ckpt --root /tmp/r05
  python tools/protocol_rehearsal.py gen --root /tmp/r05 --mode wo_mm
  python tools/protocol_rehearsal.py gen --root /tmp/r05 --mode wo_mm --sampler ddim50
  python tools/protocol_rehearsal.py gen --root /tmp/r05 --mode w_mm
  python tools/protocol_rehearsal.py offline --root /tmp/r05 --eval_mode wo_mm
  python tools/protocol_rehearsal.py offline --root /tmp/r05 --eval_mode mm_short
  python tools/protocol_rehearsal.py scene --root /tmp/r05 --n 1024
  python tools/protocol_rehearsal.py report --root /tmp/r05
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------- ledger
def _ledger_path(root: str) -> Path:
    return Path(root) / "ledger.json"


def _ledger_update(root: str, key: str, entry: dict) -> None:
    p = _ledger_path(root)
    data = json.loads(p.read_text()) if p.exists() else {}
    data[key] = entry
    p.write_text(json.dumps(data, indent=1))
    print(f"[rehearsal] {key}: {json.dumps(entry)[:400]}")


def _run_cli(root: str, tag: str, argv: list, env_extra: dict | None = None) -> dict:
    """Spawn a real CLI subprocess, tee output to <root>/logs/<tag>.log,
    return {"wall_s", "rc"}."""
    logs = Path(root) / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.monotonic()
    with open(logs / f"{tag}.log", "wb") as f:
        rc = subprocess.run(
            [sys.executable] + argv, cwd=str(REPO), env=env,
            stdout=f, stderr=subprocess.STDOUT,
        ).returncode
    wall = time.monotonic() - t0
    if rc != 0:
        tail = (logs / f"{tag}.log").read_text(errors="replace")[-3000:]
        raise RuntimeError(f"{tag} failed (rc={rc}, {wall:.0f}s):\n{tail}")
    return {"wall_s": round(wall, 2), "rc": rc}


def _latest_test_dir(root: str, exp: str) -> Path:
    dirs = sorted((Path(root) / "outputs" / exp / "eval").glob("test-*"))
    assert dirs, f"no test dir under {exp}"
    return dirs[-1]


def _attach_timing(entry: dict, test_dir: Path) -> dict:
    tj = test_dir / "timing.json"
    if tj.exists():
        entry["timing"] = json.loads(tj.read_text())
    entry["test_dir"] = str(test_dir)
    return entry


# ---------------------------------------------------------------- setup
def cmd_setup(args) -> None:
    from afford_motion_tpu.data.synthetic import (
        make_synthetic_h3d_protocol,
        make_synthetic_t2m_ckpt,
    )

    root = Path(args.root)
    t0 = time.monotonic()
    data = root / "data"
    if not (data / "H3D" / "test.txt").exists():
        make_synthetic_h3d_protocol(
            str(data), n_train=args.n_train, n_test=args.n_test,
            num_points=args.points,
        )
    meta = root / "eval" / "meta"
    meta.mkdir(parents=True, exist_ok=True)
    import numpy as np

    np.savez(meta / "t2m_mean_std.npz",
             mean=np.zeros(263, np.float32), std=np.ones(263, np.float32))
    make_synthetic_t2m_ckpt(str(root / "finest.tar"))

    # SMPL-X regressor weights for the scene protocol (synthetic body model)
    os.environ.setdefault("SMPLX_USE_SYNTHETIC", "1")
    import jax
    import jax.numpy as jnp

    from afford_motion_tpu.eval.joints_to_smplx import (
        JointsToSMPLXRegressor,
        save_regressor_npz,
    )

    reg = JointsToSMPLXRegressor()
    variables = reg.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 8, 66)), jnp.zeros((1, 8), bool),
                         train=False)
    save_regressor_npz(str(root / "regressor.npz"), variables["params"])
    _ledger_update(args.root, "setup", {
        "wall_s": round(time.monotonic() - t0, 2),
        "n_train": args.n_train, "n_test": args.n_test, "points": args.points,
    })


# ---------------------------------------------------------------- ckpt
def _stage1_overrides(root: str, mode: str) -> list:
    k, nbatch = ("0", "32") if mode == "wo_mm" else ("30", "4")
    return [
        "exp_name=t2m_cdm", f"output_dir={root}/outputs",
        f"exp_dir={root}/outputs/t2m_cdm", "seed=2023",
        "diffusion.steps=500",
        "task=text_to_motion_contact_gen", "model=cdm",
        "model.arch=Perceiver", "model.scene_model.use_scene_model=False",
        "model.text_model.max_length=20", "task.dataset.sigma=0.8",
        f"task.dataset.data_dir={root}/data",
        f"task.evaluator.k_samples={k}",
        f"task.evaluator.eval_nbatch={nbatch}",
        "task.evaluator.num_k_samples=128",
    ]


def _stage2_overrides(root: str, mode: str, contact_folder: str,
                      sampler: str = "ddpm") -> list:
    k, nbatch = ("0", "32") if mode == "wo_mm" else ("30", "4")
    ov = [
        "exp_name=t2m_cmdm", f"output_dir={root}/outputs",
        f"exp_dir={root}/outputs/t2m_cmdm", "seed=2023",
        "diffusion.steps=1000",
        "task=text_to_motion_contact_motion_gen", "model=cmdm",
        "model.arch=trans_enc", "model.data_repr=h3d",
        "model.text_model.max_length=20", "task.dataset.sigma=0.8",
        f"task.dataset.data_dir={root}/data",
        "task.dataset.mix_train_ratio=0.0",
        f"task.evaluator.k_samples={k}",
        f"task.evaluator.eval_nbatch={nbatch}",
        "task.evaluator.num_k_samples=128",
        f"task.test.contact_folder={contact_folder}",
    ]
    if sampler == "ddim50":
        ov += ["task.test.sampler=ddim", "diffusion.timestep_respacing=ddim50"]
    return ov


def cmd_ckpt(args) -> None:
    root = args.root
    extra = args.extra.split() if args.extra else []
    train_ov = [
        "task.train.max_steps=3", "task.train.save_every_step=3",
        "task.train.log_every_step=1", "task.train.lr_anneal_steps=0",
    ] + extra
    e = _run_cli(root, "train_s1",
                 ["train.py"] + _stage1_overrides(root, "wo_mm") + train_ov)
    _ledger_update(root, "ckpt_stage1", e)
    e = _run_cli(root, "train_s2",
                 ["train.py"] + _stage2_overrides(root, "wo_mm", "unused") + train_ov)
    _ledger_update(root, "ckpt_stage2", e)


# ---------------------------------------------------------------- gen
def cmd_gen(args) -> None:
    root, mode, sampler = args.root, args.mode, args.sampler
    tag = f"_{args.tag}" if args.tag else ""
    extra = args.extra.split() if args.extra else []
    if not args.skip_stage1:
        e = _run_cli(root, f"gen_s1_{mode}",
                     ["test.py"] + _stage1_overrides(root, mode) + extra)
        td = _latest_test_dir(root, "t2m_cdm")
        n_pred = len(list((td / "H3D" / "pred_contact").glob("*.npy")))
        e["n_pred_contact"] = n_pred
        _ledger_update(root, f"gen_stage1_{mode}{tag}", _attach_timing(e, td))
        contact_folder = str(td)
    else:
        led = json.loads(_ledger_path(root).read_text())
        contact_folder = args.contact_folder or led[f"gen_stage1_{mode}"]["test_dir"]

    e = _run_cli(root, f"gen_s2_{mode}_{sampler}",
                 ["test.py"] + _stage2_overrides(root, mode, contact_folder, sampler)
                 + extra)
    td = _latest_test_dir(root, "t2m_cmdm")
    e["n_humanml_pkl"] = len(list((td / "humanml").glob("*.pkl")))
    e["contact_folder"] = contact_folder
    _ledger_update(root, f"gen_stage2_{mode}_{sampler}{tag}", _attach_timing(e, td))


# ---------------------------------------------------------------- offline
def cmd_offline(args) -> None:
    root = args.root
    led = json.loads(_ledger_path(root).read_text())

    def _dumps(key):
        assert key in led, f"run `gen` for {key} first"
        return str(Path(led[key]["test_dir"]) / "humanml")

    results = _dumps(f"gen_stage2_wo_mm_{args.sampler}")
    argv = ["-m", "h3d_eval.eval_h3d_offline",
            "--results_dir", results,
            "--eval_mode", args.eval_mode,
            "--data_dir", f"{root}/data",
            "--eval_meta_dir", f"{root}/eval",
            "--ckpt", f"{root}/finest.tar",
            "--batch_size", str(args.batch_size)]
    if args.eval_mode == "mm_short":
        argv += ["--mm_results_dir", _dumps("gen_stage2_w_mm_ddpm")]
    tag = f"_{args.tag}" if getattr(args, "tag", "") else ""
    e = _run_cli(root, f"offline_{args.eval_mode}_{args.sampler}{tag}", argv)
    out = Path(results) / f"eval_humanml_{args.eval_mode}.json"
    e["metrics_file"] = str(out)
    e["metrics_ok"] = out.exists()
    _ledger_update(root, f"offline_{args.eval_mode}_{args.sampler}{tag}", e)


# ---------------------------------------------------------------- scene
def cmd_scene(args) -> None:
    """Scene protocol through Text2MotionInSceneEvaluator itself
    (reference: utils/evaluate.py:237-427): batched SMPL-X fit -> LBS ->
    SDF physics (+dist) -> APD -> per-sequence result pickles, over --n
    protocol-shaped sequences (196 frames x 66-d joints, 8192-point
    scenes, official SMPL-X mesh resolution)."""
    import numpy as np

    os.environ["SMPLX_USE_SYNTHETIC"] = "1"
    os.environ["SMPLX_SYNTHETIC_VERTS"] = str(args.verts)
    os.environ["SMPLX_SYNTHETIC_FACES"] = str(args.faces)

    from afford_motion_tpu.eval.evaluate import Text2MotionInSceneEvaluator
    from afford_motion_tpu.utils.config import DictConfig

    root = Path(args.root)
    cfg = DictConfig({"evaluator": {
        "name": "Text2MotionInSceneEvaluator", "njoints": 22,
        "k_samples": args.apd_k, "num_k_samples": args.apd_items,
        "eval_nbatch": 1,
        "eval_metrics": ["apd", "non_collision", "contact", "dist"],
        "save_results": True, "opt_rate": 0.02, "opt_steps": 200,
        "joints_to_smplx_model_weights": str(root / "regressor.npz"),
        "sdf_kernel": args.sdf_kernel,
    }})
    ev = Text2MotionInSceneEvaluator(cfg)
    assert ev._fitter is not None

    rng = np.random.default_rng(0)
    L, N = 196, 8192
    samples, k_samples = [], []
    for i in range(args.n):
        m_len = int(rng.integers(40, 197))
        x_mask = np.arange(L) >= m_len
        samples.append({
            "sample": rng.normal(size=(L, 66)).astype(np.float32) * 0.1,
            "x_mask": x_mask,
            "c_pc_xyz": (rng.normal(size=(N, 3)) * 2).astype(np.float32),
            "c_text": "walk to the chair", "info_tokens": ["walk/VERB"],
            "info_set": "HUMANISE", "info_index": i,
            "info_scene_trans": np.eye(4, dtype=np.float32),
            "info_scene_mesh": "",
            "info_obj_mask": rng.random(N) < 0.05,
        })
    for i in range(args.apd_items):
        m_len = 120
        k_samples.append({
            "k_samples": rng.normal(
                size=(args.apd_k, L, 66)).astype(np.float32),
            "x_mask": np.arange(L) >= m_len,
            "info_set": "HUMANISE", "info_index": i,
        })

    # time the evaluator's own internal stages without changing its code
    # path: wrap the bound methods with timers
    stage_t: dict = {}

    def _timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.monotonic()
            out = fn(*a, **kw)
            stage_t[name] = round(time.monotonic() - t0, 2)
            return out
        return wrap

    ev._fit_all = _timed("fit_s", ev._fit_all)
    ev.eval_physics = _timed("physics_s", ev.eval_physics)
    ev.eval_apd = _timed("apd_s", ev.eval_apd)

    class _DS:
        def denormalize(self, x, clip=False):
            return x

    class _DL:
        dataset = _DS()

    save_dir = root / "scene_protocol"
    save_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.monotonic()
    ev.evaluate(samples, k_samples, str(save_dir), _DL())
    ev.report(str(save_dir))
    wall = time.monotonic() - t0
    entry = {
        "wall_s": round(wall, 2), "n": args.n,
        "seqs_per_sec": round(args.n / wall, 3),
        "sdf_kernel": args.sdf_kernel,
        **stage_t,
        "metrics": {k: float(np.mean(v)) for k, v in ev.metrics.items()
                    if isinstance(v, list) and v
                    and isinstance(v[0], (int, float))},
    }
    _ledger_update(args.root, f"scene_protocol_n{args.n}", entry)


# ---------------------------------------------------------------- report
def cmd_report(args) -> None:
    led = json.loads(_ledger_path(args.root).read_text())
    ref = {
        # the reference's own quotes (h3d_eval/eval_h3d_offline.py:37-62
        # docstring + README protocol notes): full wo_mm replication ~12 h,
        # mm_short ~15 h on its 4xA100 rig incl. the GPU generation loop
        "reference_wo_mm_hours": 12.0,
        "reference_mm_short_hours": 15.0,
    }
    out = {
        "what": "round-5 full-protocol rehearsal: measured wall-clock of the "
                "real CLI chain at protocol scale (synthetic ckpts/assets, "
                "production shapes)",
        "host": "one v5e chip via axon tunnel, 1-core host",
        "reference_quotes": ref,
        "stages": led,
    }

    def tot(keys):
        return round(sum(led[k]["wall_s"] for k in keys if k in led), 1)

    wo_mm_keys = ["gen_stage1_wo_mm", "gen_stage2_wo_mm_ddpm", "offline_wo_mm_ddpm"]
    mm_keys = ["gen_stage1_wo_mm", "gen_stage2_wo_mm_ddpm", "gen_stage1_w_mm",
               "gen_stage2_w_mm_ddpm", "offline_mm_short_ddpm"]
    if all(k in led for k in wo_mm_keys):
        s = tot(wo_mm_keys)
        out["wo_mm_total_s"] = s
        out["wo_mm_speedup_vs_reference"] = round(ref["reference_wo_mm_hours"] * 3600 / s, 1)
    if all(k in led for k in mm_keys):
        s = tot(mm_keys)
        out["mm_short_total_s"] = s
        out["mm_short_speedup_vs_reference"] = round(ref["reference_mm_short_hours"] * 3600 / s, 1)
    # warm repeat (persistent compile cache + round-5 fixes): best
    # available warm entry per stage
    warm_keys = [
        ("gen_stage1_wo_mm_warm", "gen_stage1_wo_mm"),
        ("gen_stage2_wo_mm_ddpm_warm3", "gen_stage2_wo_mm_ddpm_warm"),
        ("offline_wo_mm_ddpm_warm", "offline_wo_mm_ddpm"),
    ]
    if all(a in led or b in led for a, b in warm_keys):
        s = round(sum(led.get(a, led.get(b))["wall_s"] for a, b in warm_keys), 1)
        out["wo_mm_total_warm_s"] = s
        out["wo_mm_warm_speedup_vs_reference"] = round(
            ref["reference_wo_mm_hours"] * 3600 / s, 1)
    dst = REPO / "docs" / "artifacts" / args.out
    dst.write_text(json.dumps(out, indent=1))
    print(f"wrote {dst}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("setup")
    p.add_argument("--root", required=True)
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-test", type=int, default=4384)
    p.add_argument("--points", type=int, default=8192)
    p.set_defaults(fn=cmd_setup)

    p = sub.add_parser("ckpt")
    p.add_argument("--root", required=True)
    p.add_argument("--extra", default="", help="extra CLI overrides (space-sep)")
    p.set_defaults(fn=cmd_ckpt)

    p = sub.add_parser("gen")
    p.add_argument("--root", required=True)
    p.add_argument("--mode", choices=["wo_mm", "w_mm"], default="wo_mm")
    p.add_argument("--sampler", choices=["ddpm", "ddim50"], default="ddpm")
    p.add_argument("--skip-stage1", action="store_true")
    p.add_argument("--contact_folder", default=None)
    p.add_argument("--tag", default="", help="ledger key suffix (e.g. warm)")
    p.add_argument("--extra", default="", help="extra CLI overrides (space-sep)")
    p.set_defaults(fn=cmd_gen)

    p = sub.add_parser("offline")
    p.add_argument("--root", required=True)
    p.add_argument("--eval_mode", choices=["wo_mm", "mm_short"], default="wo_mm")
    p.add_argument("--sampler", choices=["ddpm", "ddim50"], default="ddpm",
                   help="which stage-2 generation run feeds the main pools")
    p.add_argument("--batch-size", type=int, default=32,
                   help="32 is the protocol (R-precision pools)")
    p.add_argument("--tag", default="", help="ledger key suffix (e.g. warm)")
    p.set_defaults(fn=cmd_offline)

    p = sub.add_parser("scene")
    p.add_argument("--root", required=True)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--apd-k", type=int, default=10)
    p.add_argument("--apd-items", type=int, default=32)
    p.add_argument("--sdf-kernel", default="auto")
    p.add_argument("--verts", type=int, default=10475)
    p.add_argument("--faces", type=int, default=20908)
    p.set_defaults(fn=cmd_scene)

    p = sub.add_parser("report")
    p.add_argument("--root", required=True)
    p.add_argument("--out", default="r05_protocol_rehearsal.json")
    p.set_defaults(fn=cmd_report)

    args = ap.parse_args()
    sys.path.insert(0, str(REPO))
    from afford_motion_tpu.utils.misc import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS=cpu + compile cache in-process
    args.fn(args)


if __name__ == "__main__":
    main()
