"""In-repo HumanML3D metric protocol
(reference: utils/eval/eval_humanml.py:1-183 + utils/eval/get_data.py).

Computes Matching Score / R-Precision@3 / FID / Diversity / MultiModality
of generated motions against the ground-truth corpus through the frozen
text-motion matching evaluator. Batch size and diversity/mm times follow
the reference protocol (batch 32-as-configured groups define R-precision's
candidate pool)."""
from __future__ import annotations

import os
import random
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.loader import DataLoader
from ..utils.io import get_logger
from .evaluator_wrapper import EvaluatorWrapper
from .metrics import (
    calculate_activation_statistics,
    calculate_diversity,
    calculate_frechet_distance,
    calculate_multimodality,
    calculate_top_k,
    euclidean_distance_matrix,
)
from .word_vectorizer import create_word_vectorizer

logger = get_logger()

MAX_TEXT_LEN = 20


def tokenize(tokens, w_vectorizer, max_text_len: int = MAX_TEXT_LEN):
    """'word/POS' token list -> (word_embs, pos_onehots, sent_len)
    (reference: get_data.py:104-126)."""
    if isinstance(tokens, str):
        tokens = tokens.split(" ")
    tokens = [t for t in tokens if t]
    if len(tokens) < max_text_len:
        tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
        sent_len = len(tokens)
        tokens = tokens + ["unk/OTHER"] * (max_text_len + 2 - sent_len)
    else:
        tokens = ["sos/OTHER"] + tokens[:max_text_len] + ["eos/OTHER"]
        sent_len = len(tokens)
    embs, ohs = zip(*(w_vectorizer[t] for t in tokens))
    return (
        np.stack(embs).astype(np.float32),
        np.stack(ohs).astype(np.float32),
        sent_len,
    )


class EvalGTDataset:
    """Ground-truth eval corpus (reference: get_data.py:17-131):
    motions + captions from the HumanML3D contact_motion set, normalized by
    the eval-time mean/std."""

    def __init__(self, data_dir: str, eval_meta_dir: str, split: str = "test",
                 min_motion_len: int = 24, max_motion_len: int = 196):
        import pandas as pd

        self.max_motion_len = max_motion_len
        ms = np.load(os.path.join(eval_meta_dir, "meta", "mean_std.npz"))
        self.mean, self.std = ms["mean"], ms["std"]
        self.w_vectorizer = create_word_vectorizer(os.path.join(eval_meta_dir, "glove"))

        with open(os.path.join(eval_meta_dir, "meta", f"{split}.txt")) as f:
            id_list = {int(line.strip()) for line in f if line.strip()}

        anno = pd.read_csv(os.path.join(data_dir, "HumanML3D", "contact_motion", "anno.csv"))
        self.all_data = []
        for i in range(len(anno)):
            if i not in id_list:
                continue
            desc = anno.loc[i]["utterance"]
            desc = [] if not isinstance(desc, str) or desc == "" else desc.split("$$")
            token = anno.loc[i].get("others", "")
            token = [] if not isinstance(token, str) or token == "" else token.split("$$")
            token = [t.split(" ") for t in token]
            if len(desc) != len(token):
                token = [[] for _ in desc]
            motion = np.load(
                os.path.join(data_dir, "HumanML3D", "contact_motion", "motions", f"{i:05d}.npy")
            )
            motion = motion.reshape(motion.shape[0], -1)
            if not (min_motion_len <= motion.shape[0] <= max_motion_len):
                continue
            self.all_data.append((i, motion, len(motion), list(zip(desc, token))))

        self.indices = list(range(len(self.all_data)))
        if split == "test":
            random.Random(0).shuffle(self.indices)
        else:
            random.shuffle(self.indices)

    def normalize(self, x):
        return (x - self.mean) / self.std

    def __len__(self):
        return len(self.all_data)

    def __getitem__(self, idx):
        i, motion, m_len, text_list = self.all_data[self.indices[idx]]
        desc, tokens = random.choice(text_list)
        word_embs, pos_ohs, sent_len = tokenize(tokens, self.w_vectorizer)
        motion = self.normalize(motion)
        if m_len < self.max_motion_len:
            motion = np.concatenate(
                [motion, np.zeros((self.max_motion_len - m_len, motion.shape[1]))], axis=0
            )
        return {
            "word_embs": word_embs, "pos_ohot": pos_ohs, "caption": desc,
            "sent_len": np.int32(sent_len), "motion": motion.astype(np.float32),
            "m_len": np.int32(m_len), "tokens": "_".join(tokens) if tokens else "",
        }


class EvalGenDataset:
    """Generated-sample wrapper (reference: get_data.py:134-174)."""

    def __init__(self, sample_list: List[Dict], w_vectorizer):
        self.samples = sample_list
        self.w_vectorizer = w_vectorizer

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        data = self.samples[idx]
        motion, x_mask = data["sample"], data["x_mask"]
        tokens = data.get("info_tokens", "")
        word_embs, pos_ohs, sent_len = tokenize(tokens, self.w_vectorizer)
        return {
            "word_embs": word_embs, "pos_ohot": pos_ohs, "caption": data["c_text"],
            "sent_len": np.int32(sent_len), "motion": motion.astype(np.float32),
            "m_len": np.int32((~x_mask).sum()),
            "tokens": "_".join(tokens) if isinstance(tokens, list) else str(tokens),
        }


def _batches(dataset, batch_size: int, drop_last: bool = True):
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        drop_last=drop_last, prefetch=0)
    return loader


_CAT_KEYS = ("word_embs", "pos_ohot", "sent_len", "motion", "m_len")
_DEVICE_KEYS = ("word_embs", "pos_ohot", "motion")  # the >99% of pool bytes


class DeviceResidentPool:
    """HBM-staged protocol pool: upload once, slice per extraction chunk.

    The reference protocol re-reads every pool from host memory on every
    pass (utils/eval/eval_humanml.py:8-50 iterates torch DataLoaders; FID
    then re-extracts the WHOLE ground-truth pool a second time,
    eval_humanml.py:53-74). On TPU the pool bytes (GT motions alone are
    ~900 MB at protocol scale) dominate host->device traffic, so this
    stages the concatenated pool in HBM once; matching and FID share the
    staged arrays, and per-chunk extraction slices on device.

    Bit-identical to the host path: pool DEFINITIONS (the loader's
    batch-32 grouping, drop_last) are unchanged, the same concatenated
    chunk arrays feed the same jitted encoders, and the length-sort is
    applied as an on-device gather of the same align_idx
    (EvaluatorWrapper device-input fast path). Lengths stay host-side so
    the sort permutation is computed exactly as before.

    ``motions`` overrides the staged motion column with an already
    device-resident array (e.g. sampler output that never left HBM).
    """

    def __init__(self, batches, motions=None):
        import jax.numpy as jnp

        batches = list(batches)
        self.sizes = [len(np.asarray(b["m_len"])) for b in batches]
        self.host = {
            k: np.concatenate([np.asarray(b[k]) for b in batches], axis=0)
            for k in ("sent_len", "m_len")
        }
        self.dev = {}
        for k in _DEVICE_KEYS:
            if k == "motion" and motions is not None:
                total = int(sum(self.sizes))
                if len(motions) != total:
                    raise ValueError(
                        f"device motions rows {len(motions)} != pool rows {total}")
                self.dev[k] = motions
            else:
                self.dev[k] = jnp.asarray(
                    np.concatenate([np.asarray(b[k]) for b in batches], axis=0),
                    dtype=jnp.float32,
                )
        self.bounds = np.concatenate([[0], np.cumsum(self.sizes)]).astype(int)

    def chunks(self, extract_pools: int, keys: Sequence[str] = _CAT_KEYS):
        """Yield ``(cat, sizes)`` per extraction chunk, with the host
        path's exact grouping: full groups of ``extract_pools`` pools,
        then tail pools singly (two compiled shapes)."""
        n = len(self.sizes)
        groups = [
            list(range(a, a + extract_pools))
            for a in range(0, n - n % extract_pools, extract_pools)
        ] + [[i] for i in range(n - n % extract_pools, n)]
        for g in groups:
            a, b = int(self.bounds[g[0]]), int(self.bounds[g[-1] + 1])
            cat = {}
            for k in keys:
                src = self.dev.get(k, self.host.get(k))
                cat[k] = src[a:b]
            yield cat, [self.sizes[i] for i in g]


def _iter_chunks(loader, extract_pools: int, keys: Sequence[str] = _CAT_KEYS):
    """Extraction chunks from either a host loader or a staged pool."""
    if isinstance(loader, DeviceResidentPool):
        yield from loader.chunks(extract_pools, keys)
        return
    buf = []

    def cat(group):
        return (
            {k: np.concatenate([np.asarray(b[k]) for b in group], axis=0)
             for k in keys},
            [len(np.asarray(b["m_len"])) for b in group],
        )

    for batch in loader:
        buf.append(batch)
        if len(buf) == extract_pools:
            yield cat(buf)
            buf = []
    for b in buf:               # tail pools keep the single-pool shape
        yield cat([b])


def evaluate_matching_score(wrapper: EvaluatorWrapper, loaders: Dict[str, DataLoader],
                            extract_pools: int = 8):
    """(reference: eval_humanml.py:8-50).

    Pooled extraction: one device call covers ``extract_pools`` protocol
    pools (loader batches), then each pool's statistics are computed on
    its own slice. Bit-identical to per-pool extraction — embedding
    values are per-item (``unsort=True`` returns input row order) and
    matching score / R-precision are per-pool / per-row statistics. Pool
    DEFINITIONS (the loader's batch grouping) are unchanged; only full
    groups of ``extract_pools`` are merged so exactly two device shapes
    compile (the big chunk and the single pool).

    ``loaders`` values may be host loaders (re-uploaded per pass) or
    :class:`DeviceResidentPool` (HBM-staged once; bit-identical —
    tests/test_eval_stack.py::test_device_resident_pool_bit_identical)."""
    import jax.numpy as jnp

    match_score, r_precision, activations = OrderedDict(), OrderedDict(), OrderedDict()
    for name, loader in loaders.items():
        # extraction pass: embeddings stay ON DEVICE per chunk; one
        # blocking device->host pull per loader (vs one per chunk — per-
        # chunk pulls cost a full round-trip each on a remote TPU host)
        chunk_embs, chunk_sizes = [], []
        for cat, sizes in _iter_chunks(loader, extract_pools):
            chunk_embs.append(wrapper.get_co_embeddings(
                cat["word_embs"], cat["pos_ohot"], cat["sent_len"],
                cat["motion"], cat["m_len"], unsort=True, device_out=True,
            ))
            chunk_sizes.append(sizes)
        text_all = np.asarray(jnp.concatenate([te for te, _ in chunk_embs], axis=0))
        motion_all = np.asarray(jnp.concatenate([me for _, me in chunk_embs], axis=0))
        # stats pass: identical per-pool slices and accumulation order as
        # the per-chunk path — bit-identical results
        score_sum, top_k_count, size, o = 0.0, np.zeros(3), 0, 0
        for sizes in chunk_sizes:
            for n in sizes:
                te, me = text_all[o: o + n], motion_all[o: o + n]
                dist = euclidean_distance_matrix(te, me)
                score_sum += dist.trace()
                top_k_count += calculate_top_k(np.argsort(dist, axis=1), 3).sum(axis=0)
                size += n
                o += n
        match_score[name] = score_sum / max(size, 1)
        r_precision[name] = top_k_count / max(size, 1)
        activations[name] = motion_all
    return match_score, r_precision, activations


def evaluate_fid(wrapper, gt_loader, activations, extract_pools: int = 8):
    import jax.numpy as jnp

    gt_emb = []
    for cat, _ in _iter_chunks(loader=gt_loader, extract_pools=extract_pools,
                               keys=("motion", "m_len")):
        # unsort so the concatenated embedding ORDER (and therefore the
        # fp summation order inside the FID statistics) is independent of
        # the extraction grouping; chunks stay on device, one pull below
        gt_emb.append(wrapper.get_motion_embeddings(
            cat["motion"], cat["m_len"], unsort=True, device_out=True))
    gt_mu, gt_cov = calculate_activation_statistics(
        np.asarray(jnp.concatenate(gt_emb, axis=0)))
    return OrderedDict(
        (name, calculate_frechet_distance(gt_mu, gt_cov, *calculate_activation_statistics(emb)))
        for name, emb in activations.items()
    )


def evaluate_multimodality_metric(wrapper, k_samples_list, mm_num_times,
                                  extract_groups: int = 8):
    """(reference: eval_humanml.py:53-74 multimodality path).

    Extraction batches ``extract_groups`` k-sample groups per device call
    (was one call per group — 100 round-trips at protocol scale).
    ``unsort=True`` keeps each group's rows in input order; the MM
    statistic pairs rows randomly (unseeded, by reference design), so
    within-group order carries no meaning."""
    if not k_samples_list:
        return 0.0
    groups = []
    for ks in k_samples_list:
        m_len = int((~ks["x_mask"]).sum())
        k_motions = ks["k_samples"].astype(np.float32)
        groups.append((k_motions, m_len))
    embs = []
    for a in range(0, len(groups), extract_groups):
        chunk = groups[a: a + extract_groups]
        cat = np.concatenate([g[0] for g in chunk], axis=0)
        lens = np.concatenate([
            np.full((len(g[0]),), g[1], dtype=np.int32) for g in chunk])
        emb = wrapper.get_motion_embeddings(cat, lens, unsort=True)
        o = 0
        for g in chunk:
            embs.append(emb[o: o + len(g[0])][None])
            o += len(g[0])
    embs = np.concatenate(embs, axis=0)
    if embs.shape[1] <= mm_num_times:
        mm_num_times = max(embs.shape[1] - 1, 1)
    return calculate_multimodality(embs, mm_num_times)


def eval_humanml(
    sample_list: List[Dict],
    k_samples_list: List[Dict],
    dataloader,
    *,
    data_dir: Optional[str] = None,
    eval_meta_dir: str = "./data/eval",
    ckpt_path: str = "./data/eval/text_motion_match/text_mot_match_scenediff2_ckpt/finest.tar",
    batch_size: int = 16,
    diversity_times: int = 32,
    mm_num_times: int = 10,
) -> Dict[str, Dict[str, List]]:
    """Full in-repo protocol (reference: eval_humanml.py:164-183).

    Requires the frozen evaluator checkpoint + eval meta (mean/std, splits,
    GloVe) on disk; callers gate on those existing."""
    wrapper = EvaluatorWrapper(ckpt_path, variant="ours")
    data_dir = data_dir or getattr(dataloader.dataset, "data_dir", "./data")

    gt = EvalGTDataset(data_dir, eval_meta_dir)
    gen = EvalGenDataset(sample_list, gt.w_vectorizer)

    loaders = OrderedDict()
    if os.environ.get("AM_EVAL_HOST_POOLS", "0") == "1":
        loaders["ground truth"] = _batches(gt, batch_size)
        loaders["vald"] = _batches(gen, batch_size)
        gt_for_fid = _batches(gt, batch_size)
    else:
        # HBM-staged pools (DeviceResidentPool): upload each pool once;
        # FID reuses matching's staged GT motions instead of a second
        # full-pool upload. Metric values are bit-identical (FID reads
        # only motions, which are deterministic across passes).
        loaders["ground truth"] = DeviceResidentPool(_batches(gt, batch_size))
        loaders["vald"] = DeviceResidentPool(_batches(gen, batch_size))
        gt_for_fid = loaders["ground truth"]

    match_score, r_precision, activations = evaluate_matching_score(wrapper, loaders)
    fid = evaluate_fid(wrapper, gt_for_fid, activations)
    diversity = OrderedDict(
        (name, calculate_diversity(emb, min(diversity_times, emb.shape[0] - 1)))
        for name, emb in activations.items()
    )
    mm = evaluate_multimodality_metric(wrapper, k_samples_list, mm_num_times)

    all_metrics = OrderedDict()
    all_metrics["Matching Score"] = {k: [v] for k, v in match_score.items()}
    all_metrics["R_precision"] = {k: [v] for k, v in r_precision.items()}
    all_metrics["FID"] = {k: [v] for k, v in fid.items()}
    all_metrics["Diversity"] = {k: [v] for k, v in diversity.items()}
    all_metrics["MultiModality"] = {"vald": [mm]}
    return all_metrics
