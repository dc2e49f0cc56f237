"""End-to-end reference-vs-rebuild METRIC parity (VERDICT r2 item #1).

Runs the LIVE torch reference pipeline (read-only import from
/root/reference via tests/ref_harness.load_reference_pipeline) end-to-end
on CPU — reference dataset classes -> reference ``SpacedDiffusion.
p_sample_loop`` (test.py:57,94-101) -> reference evaluator
(utils/evaluate.py:409-427) -> metrics.txt — then runs OUR test.py off the
SAME weights (converted with utils/torch_convert.py) on the SAME synthetic
data with the SAME injected noise stream, and diffs the metrics files.

This upgrades the golden single-forward parity (tests/test_golden_parity.py)
to PIPELINE parity: dataset file protocol, eval ordering, the full
500/1000-step-chain numerics, denormalize/σ-kernel handoff math, and the
evaluator stack all have to agree for the metrics to match.

Matched-everything protocol:
- weights: one randomized reference checkpoint, converted torch->flax;
- text: both sides use the deterministic HashTextEncoder embedding of the
  caption string (the text encoder is an external frozen model in both
  frameworks — the parity target is the pipeline, not CLIP itself);
- captions: the synthetic annos are rewritten to a single utterance per
  item so the reference's ``random.choice(desc)`` (motionx.py:612-616)
  cannot diverge from ours;
- noise: both samplers consume ``parity_noise(seed, chain_idx)`` —
  torch's ``randn_like`` is intercepted per chain, our sampler takes the
  stream via the ``noise_seq`` argument (task.test.noise_inject_seed);
- eval order: both sides seed the test-shuffle with the same
  ``shuffle_seed`` (reference motionx.py:117-119).

Two stages:
  A. CDM-Perceiver + ContactEvaluator (dist_to_target metrics) — the
     reference side's pred_contact handoff files are then fed to BOTH
     stage-B runs, so our ContactMotionDataset provably reads
     reference-written handoff files.
  B. CMDM trans_enc + Text2MotionInSceneEvaluator (APD).

Usage: python tools/ref_e2e_ab.py [--root DIR] [--out results.json]
(pytest wrapper: tests/test_ref_e2e.py)
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NOISE_SEED = 777
SEED = 2023
B = 2
N_POINTS = 256
DIFF_STEPS = 8
N_ITEMS = 8


# --------------------------------------------------------------------- data
def make_ab_data(root: str) -> str:
    """Synthetic HUMANISE + H3D trees in the reference layout. HUMANISE
    annos are rewritten single-caption (the reference picks captions with
    ``random.choice``, motionx.py:612-616 — H3D needs no rewrite because
    its test phase always takes ``text_list[0]``, humanml3d.py:530-535)."""
    from afford_motion_tpu.data.synthetic import (
        make_synthetic_h3d, make_synthetic_motionx_set,
    )

    make_synthetic_motionx_set(root, "HUMANISE", n_items=N_ITEMS,
                               num_points=N_POINTS, seed=1)
    anno = Path(root, "HUMANISE", "contact_motion", "anno.csv")
    lines = anno.read_text().strip().split("\n")
    fixed = [lines[0]]
    for ln in lines[1:]:
        head, utter = ln.rsplit(",", 1)
        fixed.append(f"{head},{utter.split('$$')[0]}")
    anno.write_text("\n".join(fixed) + "\n")
    make_synthetic_h3d(root, n_items=N_ITEMS, num_points=N_POINTS)
    return root


# ------------------------------------------------------------------- config
def _stage_a_overrides(data_dir: str, out_dir: str) -> List[str]:
    return [
        "exp_name=ref_ab_cdm",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/ref_ab_cdm",
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
        "model.arch_perceiver.last_dim=32",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={N_POINTS}",
        "task.dataset.sets=['HUMANISE']",
        f"diffusion.steps={DIFF_STEPS}",
        f"task.test.batch_size={B}",
        f"task.test.noise_inject_seed={NOISE_SEED}",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "task.evaluator.save_results=true",
        f"seed={SEED}",
    ]


def _stage_b_overrides(data_dir: str, out_dir: str, contact_dir: str) -> List[str]:
    return [
        "exp_name=ref_ab_cmdm",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/ref_ab_cmdm",
        "task=contact_motion_gen",
        "model=cmdm",
        "model.dtype=float32",
        "model.latent_dim=64",
        "model.time_emb_dim=64",
        "model.num_heads=4",
        "model.dim_feedforward=128",
        "model.num_layers=[1,1]",
        "model.contact_model.planes=[16,32,64,128]",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={N_POINTS}",
        "task.dataset.sets=['HUMANISE']",
        "task.dataset.mix_train_ratio=0.0",
        f"diffusion.steps={DIFF_STEPS}",
        f"task.test.batch_size={B}",
        f"task.test.noise_inject_seed={NOISE_SEED}",
        f"task.test.contact_folder={contact_dir}",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "task.evaluator.eval_metrics=['apd']",
        "task.evaluator.save_results=false",
        f"seed={SEED}",
    ]


def _plain(obj):
    """Our DictConfig tree -> plain nested dicts (for the reference's
    omegaconf stand-in, tests/ref_harness.Cfg)."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def load_our_cfg(overrides: Sequence[str]):
    from afford_motion_tpu.utils.config import load_config
    from afford_motion_tpu.utils.misc import compute_repr_dimension

    cfg = load_config(os.path.join(REPO, "configs"), list(overrides))
    cfg.model.input_feats = compute_repr_dimension(cfg.model.data_repr)
    return cfg


# ---------------------------------------------------------- reference side
def _patch_text_encoders(pipe, dim: int = 512) -> None:
    """Both reference model families encode captions through
    encode_text_clip (cdm.py:489-494, cmdm.py:133-137); route them to the
    deterministic hash embedding OUR pipeline uses when no CLIP table is
    configured (afford_motion_tpu/models/text.py HashTextEncoder)."""
    import torch

    from afford_motion_tpu.models.text import HashTextEncoder

    enc = HashTextEncoder(dim)

    def encode(clip_model, texts, max_length=32, device="cpu"):
        return torch.from_numpy(enc.encode(list(texts)))

    pipe.models.cdm.encode_text_clip = encode
    pipe.models.cmdm.encode_text_clip = encode


def run_reference_test(pipe, cfg, model_t, diffusion_t, test_dir: str) -> Dict:
    """Mirror of the reference test loop (test.py:30-138) driving the LIVE
    reference dataset/diffusion/evaluator objects, with the parity noise
    stream injected through torch.randn_like."""
    import torch

    from afford_motion_tpu.train.sampling import parity_noise

    Cfg = __import__("tests.ref_harness", fromlist=["Cfg"]).Cfg
    task = Cfg(_plain(cfg.task))

    test_kwargs = {k: v for k, v in cfg.task.test.items()
                   if k not in ("batch_size", "num_workers")}
    dataset = pipe.dbase.create_dataset(task.dataset, "test", **_plain(test_kwargs))
    loader = dataset.get_dataloader(
        batch_size=B, collate_fn=pipe.dmisc.collate_fn_general,
        num_workers=0, shuffle=False,
    )
    evaluator = pipe.evaluate.create_evaluator(task, device="cpu")

    model_t.eval()
    is_cmdm = str(cfg.model.name).startswith("CMDM")
    # the same stream seed our test.py reads (task.test.noise_inject_seed)
    noise_seed = int(cfg.task.test.get("noise_inject_seed", NOISE_SEED))
    sample_list, k_samples_list = [], []
    k_idxs = (list(range(evaluator.num_k_samples // B))
              if evaluator.k_samples > 0 else [])
    chain = 0
    orig_randn_like = torch.randn_like
    try:
        for i, data in enumerate(loader):
            x = data["x"]
            x_kwargs = {}
            if "x_mask" in data:
                x_kwargs["x_mask"] = data["x_mask"]
            for key in data:
                if key.startswith("c_") or key.startswith("info_"):
                    x_kwargs[key] = data[key]

            use_k = i in k_idxs
            reps = evaluator.k_samples if use_k else 1
            s_np, k_np = [], []
            for k in range(reps):
                if is_cmdm:
                    x_kwargs["c_pc_contact"] = data["c_pc_contact"][:, k]
                init, seq = parity_noise(noise_seed, chain,
                                         tuple(x.shape),
                                         diffusion_t.num_timesteps)
                chain += 1
                seq_t = iter(torch.from_numpy(seq))

                def injected(t, *a, _it=seq_t, **kw):
                    return next(_it).to(t.dtype)

                torch.randn_like = injected
                with torch.no_grad():
                    sample = diffusion_t.p_sample_loop(
                        model_t, tuple(x.shape), clip_denoised=False,
                        noise=torch.from_numpy(init),
                        model_kwargs=x_kwargs, progress=False,
                    )
                torch.randn_like = orig_randn_like
                assert next(seq_t, None) is None, "noise stream not drained"

                if k == 0:
                    for bsi in range(B):
                        s_np.append(sample[bsi].cpu().numpy())
                if use_k:
                    for bsi in range(B):
                        k_np.append(sample[bsi].cpu().numpy())

            for bsi in range(B):
                res = {"sample": s_np[bsi]}
                for key in data:
                    v = data[key]
                    res[key] = (v[bsi].cpu().numpy()
                                if torch.is_tensor(v) else v[bsi])
                sample_list.append(res)
            if use_k:
                for bsi in range(B):
                    res = {"k_samples": np.stack(k_np[bsi::B])}
                    for key in data:
                        v = data[key]
                        res[key] = (v[bsi].cpu().numpy()
                                    if torch.is_tensor(v) else v[bsi])
                    k_samples_list.append(res)
            if i + 1 >= evaluator.eval_nbatch:
                break
    finally:
        torch.randn_like = orig_randn_like

    os.makedirs(test_dir, exist_ok=True)
    evaluator.evaluate(sample_list, k_samples_list, test_dir, loader, device="cpu")
    try:
        evaluator.report(test_dir)
    except TypeError:
        # upstream quirk: Text2MotionInSceneEvaluator.report json.dumps
        # np.float32 APD values (utils/evaluate.py:425-427) — metrics.txt
        # is fully written before the json dump starts, which is all the
        # A/B reads
        pass
    return parse_metrics_txt(os.path.join(test_dir, "metrics.txt"))


# --------------------------------------------------------------- our side
def save_converted_ckpt(cfg, variables, ckpt_dir: str) -> None:
    """Write converted torch weights as the Orbax checkpoint our test.py
    loads (step-named dir, natsort-latest — reference test.py:47-49)."""
    import jax

    from afford_motion_tpu.train import TrainState, make_optimizer
    from afford_motion_tpu.train.checkpoint import save_ckpt

    params = variables["params"]
    tx = make_optimizer(1e-4, params=params)
    state = TrainState.create(
        params=params, batch_stats=variables.get("batch_stats", {}), tx=tx
    )
    state = state.replace(step=jax.numpy.asarray(1))
    save_ckpt(state, os.path.join(ckpt_dir, "model000001"))


def run_our_test(overrides: Sequence[str], exp_dir: str) -> Dict:
    import test as test_entry

    test_entry.main(list(overrides))
    test_dirs = sorted(Path(exp_dir, "eval").glob("test-*"),
                       key=lambda p: p.stat().st_mtime)
    return parse_metrics_txt(str(test_dirs[-1] / "metrics.txt")), str(test_dirs[-1])


# ---------------------------------------------------------------- compare
def parse_metrics_txt(path: str) -> Dict[str, float]:
    out = {}
    if not Path(path).exists():
        # the H3D evaluators are save-only (Eval.report is a no-op,
        # reference utils/evaluate.py:20-28) — stage C compares files
        return out
    for line in Path(path).read_text().strip().split("\n"):
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        try:
            out[k.strip()] = float(v.strip())
        except ValueError:
            pass
    return out


def compare(name: str, ref: Dict[str, float], ours: Dict[str, float],
            rtol: float, atol: float) -> List[str]:
    errs = []
    missing = sorted(set(ref) - set(ours))
    if missing:
        errs.append(f"{name}: metrics missing on our side: {missing}")
    for k in sorted(set(ref) & set(ours)):
        if not np.isclose(ours[k], ref[k], rtol=rtol, atol=atol):
            errs.append(f"{name}: {k}: ref={ref[k]:.6f} ours={ours[k]:.6f}")
        print(f"[ab] {name} {k}: ref={ref[k]:.6f} ours={ours[k]:.6f} "
              f"delta={abs(ours[k]-ref[k]):.2e}")
    return errs


# ------------------------------------------------------------------ stages
def run_stage_a(root: str, rtol: float, atol: float):
    """CDM-Perceiver + ContactEvaluator. Returns (errors, ref_test_dir)."""
    import torch

    from tests.ref_harness import load_reference_pipeline, randomize_module, state_dict_numpy
    from afford_motion_tpu.utils.torch_convert import convert_cdm_checkpoint

    pipe = load_reference_pipeline()
    _patch_text_encoders(pipe)

    data_dir = make_ab_data(os.path.join(root, "data"))
    out_dir = os.path.join(root, "out")
    overrides = _stage_a_overrides(data_dir, out_dir)
    cfg = load_our_cfg(overrides)

    Cfg = __import__("tests.ref_harness", fromlist=["Cfg"]).Cfg
    model_t = pipe.models.cdm.CDM(Cfg(_plain(cfg.model)))
    randomize_module(model_t, seed=51)
    diffusion_t = pipe.mbase.create_gaussian_diffusion(Cfg(_plain(cfg)))

    # reference leg (also writes the pred_contact handoff for stage B)
    ref_dir = os.path.join(root, "ref_s1")
    torch.manual_seed(SEED)
    ref_metrics = run_reference_test(pipe, cfg, model_t, diffusion_t, ref_dir)

    # our leg: converted weights -> our test.py CLI
    converted = convert_cdm_checkpoint(state_dict_numpy(model_t),
                                       self_attn_layers=1)
    exp_dir = os.path.join(out_dir, "ref_ab_cdm")
    save_converted_ckpt(cfg, converted, os.path.join(exp_dir, "ckpt"))
    our_metrics, our_dir = run_our_test(overrides, exp_dir)

    errs = compare("stage-A(ContactEvaluator)", ref_metrics, our_metrics,
                   rtol, atol)
    return errs, ref_dir, data_dir, out_dir


def run_stage_b(root: str, data_dir: str, out_dir: str, contact_dir: str,
                rtol: float, atol: float):
    """CMDM trans_enc + Text2MotionInSceneEvaluator (APD), both sides
    reading the REFERENCE-written pred_contact handoff."""
    import torch

    from tests.ref_harness import load_reference_pipeline, randomize_module, state_dict_numpy
    from afford_motion_tpu.utils.torch_convert import convert_cmdm_checkpoint

    pipe = load_reference_pipeline()
    _patch_text_encoders(pipe)
    # evaluator init loads the JointsToSMPLX regressor weights (absent in
    # this box) — APD never touches it; skip the load, keep the module
    pipe.evaluate.JointsToSMPLX.load_and_freeze = lambda self, p: None

    overrides = _stage_b_overrides(data_dir, out_dir, contact_dir)
    cfg = load_our_cfg(overrides)

    Cfg = __import__("tests.ref_harness", fromlist=["Cfg"]).Cfg
    model_t = pipe.models.cmdm.CMDM(Cfg(_plain(cfg.model)))
    randomize_module(model_t, seed=61)
    model_t.eval()
    diffusion_t = pipe.mbase.create_gaussian_diffusion(Cfg(_plain(cfg)))

    ref_dir = os.path.join(root, "ref_s2")
    torch.manual_seed(SEED)
    ref_metrics = run_reference_test(pipe, cfg, model_t, diffusion_t, ref_dir)

    converted = convert_cmdm_checkpoint(
        state_dict_numpy(model_t), num_layers=(1, 1), blocks=(2, 2, 2, 2),
        arch="trans_enc",
    )
    exp_dir = os.path.join(out_dir, "ref_ab_cmdm")
    save_converted_ckpt(cfg, converted, os.path.join(exp_dir, "ckpt"))
    our_metrics, _ = run_our_test(overrides, exp_dir)

    return compare("stage-B(Text2MotionInScene/apd)", ref_metrics,
                   our_metrics, rtol, atol)


# ------------------------------------------------- stage C: H3D (flagship)
def _stage_c1_overrides(data_dir: str, out_dir: str) -> List[str]:
    return [
        "exp_name=ref_ab_h3d_cdm",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/ref_ab_h3d_cdm",
        "task=text_to_motion_contact_gen",
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
        "model.arch_perceiver.last_dim=32",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={N_POINTS}",
        f"diffusion.steps={DIFF_STEPS}",
        f"task.test.batch_size={B}",
        f"task.test.noise_inject_seed={NOISE_SEED + 1}",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "task.evaluator.save_results=true",
        f"seed={SEED}",
    ]


def _stage_c2_overrides(data_dir: str, out_dir: str, contact_dir: str) -> List[str]:
    return [
        "exp_name=ref_ab_h3d_cmdm",
        f"output_dir={out_dir}",
        f"exp_dir={out_dir}/ref_ab_h3d_cmdm",
        "task=text_to_motion_contact_motion_gen",
        "model=cmdm",
        "model.data_repr=h3d",   # 263-d HumanML3D vectors (reference scripts/t2m_contact_motion/train.sh)
        "model.dtype=float32",
        "model.latent_dim=64",
        "model.time_emb_dim=64",
        "model.num_heads=4",
        "model.dim_feedforward=128",
        "model.num_layers=[1,1]",
        "model.contact_model.planes=[16,32,64,128]",
        f"task.dataset.data_dir={data_dir}",
        f"task.dataset.num_points={N_POINTS}",
        "task.dataset.mix_train_ratio=0.0",
        f"diffusion.steps={DIFF_STEPS}",
        f"task.test.batch_size={B}",
        f"task.test.noise_inject_seed={NOISE_SEED + 2}",
        f"task.test.contact_folder={contact_dir}",
        "task.evaluator.eval_nbatch=1",
        "task.evaluator.k_samples=2",
        "task.evaluator.num_k_samples=2",
        "task.evaluator.save_results=true",
        f"seed={SEED}",
    ]


def _compare_npy_tree(name: str, ref_dir: str, our_dir: str, pattern: str,
                      rtol: float, sigma: float = 0.0) -> List[str]:
    """Compare every saved artifact under ``pattern`` between the two test
    dirs (the H3D evaluators are save-only — the OUTPUT FILES are the
    parity surface: pred_contact handoff npys / MDM-protocol pkls).

    ``sigma`` > 0: the npys hold σ-kernel DISTANCES
    (d = σ√(-2 ln c), evaluate.py:60) whose relative error blows up near
    the clip extremes (c→1: d→0; c clipped at 1e-20: d≈9.6σ) — compare in
    CONTACT space, the representation the downstream CMDM actually
    consumes (humanml3d.py:775-777 re-kernels the loaded dists)."""
    import pickle

    errs = []
    ref_files = sorted(Path(ref_dir).glob(pattern))
    our_files = {p.name: p for p in Path(our_dir).glob(pattern)}
    if not ref_files:
        return [f"{name}: reference produced no files for {pattern}"]
    for rf in ref_files:
        of = our_files.get(rf.name)
        if of is None:
            errs.append(f"{name}: our side missing {rf.name}")
            continue
        if rf.suffix == ".npy":
            a, b = np.load(rf), np.load(of)
            if sigma > 0 and a.shape == b.shape:
                a = np.exp(-0.5 * a ** 2 / sigma ** 2)
                b = np.exp(-0.5 * b ** 2 / sigma ** 2)
            pairs = [("array", a, b)]
        else:
            with open(rf, "rb") as f:
                ra = pickle.load(f)
            with open(of, "rb") as f:
                oa = pickle.load(f)
            if int(ra["m_len"]) != int(oa["m_len"]) or ra["text"] != oa["text"]:
                errs.append(f"{name}: {rf.name}: m_len/text mismatch")
                continue
            pairs = [("motion", np.asarray(ra["motion"]),
                      np.asarray(oa["motion"]))]
        for tag, a, b in pairs:
            if a.shape != b.shape:
                errs.append(f"{name}: {rf.name}: shape {b.shape} vs {a.shape}")
                continue
            rel = float(np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12))
            print(f"[ab] {name} {rf.name} ({tag}): rel={rel:.2e}")
            if rel > rtol:
                errs.append(f"{name}: {rf.name}: rel err {rel:.3e} > {rtol}")
    return errs


def run_stage_c(root: str, data_dir: str, out_dir: str, rtol: float):
    """Flagship H3D family: ContactHumanML3DDataset -> CDM ->
    ContactHumanML3DEvaluator handoff files, then
    ContactMotionHumanML3DDataset (reading the REFERENCE handoff) -> CMDM
    -> Text2MotionInSceneHumanML3DEvaluator MDM-protocol pkls. Both
    evaluators are save-only (reference utils/evaluate.py:30-139), so
    parity is asserted on the files themselves."""
    import torch

    from tests.ref_harness import load_reference_pipeline, randomize_module, state_dict_numpy
    from afford_motion_tpu.utils.torch_convert import (
        convert_cdm_checkpoint, convert_cmdm_checkpoint,
    )

    pipe = load_reference_pipeline()
    _patch_text_encoders(pipe)
    Cfg = __import__("tests.ref_harness", fromlist=["Cfg"]).Cfg

    # ---- C1: stage-1 CDM on H3D contacts
    overrides = _stage_c1_overrides(data_dir, out_dir)
    cfg = load_our_cfg(overrides)
    model_t = pipe.models.cdm.CDM(Cfg(_plain(cfg.model)))
    randomize_module(model_t, seed=81)
    diffusion_t = pipe.mbase.create_gaussian_diffusion(Cfg(_plain(cfg)))
    ref_dir = os.path.join(root, "ref_c1")
    torch.manual_seed(SEED)
    run_reference_test(pipe, cfg, model_t, diffusion_t, ref_dir)

    converted = convert_cdm_checkpoint(state_dict_numpy(model_t),
                                       self_attn_layers=1)
    exp_dir = os.path.join(out_dir, "ref_ab_h3d_cdm")
    save_converted_ckpt(cfg, converted, os.path.join(exp_dir, "ckpt"))
    _, our_dir = run_our_test(overrides, exp_dir)
    errs = _compare_npy_tree("stage-C1(H3D pred_contact)", ref_dir, our_dir,
                             "H3D/pred_contact/*.npy", rtol,
                             sigma=float(cfg.task.dataset.sigma))

    # ---- C2: stage-2 CMDM reading the REFERENCE C1 handoff
    overrides2 = _stage_c2_overrides(data_dir, out_dir, ref_dir)
    cfg2 = load_our_cfg(overrides2)
    model_t2 = pipe.models.cmdm.CMDM(Cfg(_plain(cfg2.model)))
    randomize_module(model_t2, seed=82)
    model_t2.eval()
    diffusion_t2 = pipe.mbase.create_gaussian_diffusion(Cfg(_plain(cfg2)))
    ref_dir2 = os.path.join(root, "ref_c2")
    torch.manual_seed(SEED)
    run_reference_test(pipe, cfg2, model_t2, diffusion_t2, ref_dir2)

    converted2 = convert_cmdm_checkpoint(
        state_dict_numpy(model_t2), num_layers=(1, 1), blocks=(2, 2, 2, 2),
        arch="trans_enc",
    )
    exp_dir2 = os.path.join(out_dir, "ref_ab_h3d_cmdm")
    save_converted_ckpt(cfg2, converted2, os.path.join(exp_dir2, "ckpt"))
    _, our_dir2 = run_our_test(overrides2, exp_dir2)
    errs += _compare_npy_tree("stage-C2(H3D MDM-protocol pkl)", ref_dir2,
                              our_dir2, "humanml/*.pkl", rtol)
    return errs


def run_ab(root: str, rtol: float = 0.05, atol: float = 0.02) -> Dict:
    errs_a, ref_s1_dir, data_dir, out_dir = run_stage_a(root, rtol, atol)
    errs_b = run_stage_b(root, data_dir, out_dir, ref_s1_dir, rtol, atol)
    errs_c = run_stage_c(root, data_dir, out_dir, rtol)
    return {"errors": errs_a + errs_b + errs_c}


def main() -> None:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--rtol", type=float, default=0.05)
    ap.add_argument("--atol", type=float, default=0.02)
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="ref_e2e_ab_")
    res = run_ab(root, rtol=args.rtol, atol=args.atol)
    print(json.dumps(res, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=2))
    if res["errors"]:
        raise SystemExit(f"metric parity FAILED: {len(res['errors'])} mismatches")
    print("[ab] end-to-end metric parity OK")


if __name__ == "__main__":
    main()
