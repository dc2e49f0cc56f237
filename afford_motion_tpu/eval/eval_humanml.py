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
    compile (the big chunk and the single pool)."""
    match_score, r_precision, activations = OrderedDict(), OrderedDict(), OrderedDict()
    for name, loader in loaders.items():
        all_emb, score_sum, top_k_count, size = [], 0.0, np.zeros(3), 0

        def flush(pool_group):
            nonlocal score_sum, top_k_count, size
            cat = {k: np.concatenate([np.asarray(b[k]) for b in pool_group], axis=0)
                   for k in _CAT_KEYS}
            text_emb, motion_emb = wrapper.get_co_embeddings(
                cat["word_embs"], cat["pos_ohot"], cat["sent_len"],
                cat["motion"], cat["m_len"], unsort=True,
            )
            o = 0
            for b in pool_group:
                n = len(np.asarray(b["m_len"]))
                te, me = text_emb[o: o + n], motion_emb[o: o + n]
                dist = euclidean_distance_matrix(te, me)
                score_sum += dist.trace()
                top_k_count += calculate_top_k(np.argsort(dist, axis=1), 3).sum(axis=0)
                size += n
                all_emb.append(me)
                o += n

        buf = []
        for batch in loader:
            buf.append(batch)
            if len(buf) == extract_pools:
                flush(buf)
                buf = []
        for b in buf:               # tail pools keep the single-pool shape
            flush([b])
        match_score[name] = score_sum / max(size, 1)
        r_precision[name] = top_k_count / max(size, 1)
        activations[name] = np.concatenate(all_emb, axis=0)
    return match_score, r_precision, activations


def evaluate_fid(wrapper, gt_loader, activations, extract_pools: int = 8):
    gt_emb, buf = [], []

    def flush(group):
        cat_m = np.concatenate([np.asarray(b["motion"]) for b in group], axis=0)
        cat_l = np.concatenate([np.asarray(b["m_len"]) for b in group], axis=0)
        # unsort so the concatenated embedding ORDER (and therefore the
        # fp summation order inside the FID statistics) is independent of
        # the extraction grouping
        gt_emb.append(wrapper.get_motion_embeddings(cat_m, cat_l, unsort=True))

    for batch in gt_loader:
        buf.append(batch)
        if len(buf) == extract_pools:
            flush(buf)
            buf = []
    for b in buf:
        flush([b])
    gt_mu, gt_cov = calculate_activation_statistics(np.concatenate(gt_emb, axis=0))
    return OrderedDict(
        (name, calculate_frechet_distance(gt_mu, gt_cov, *calculate_activation_statistics(emb)))
        for name, emb in activations.items()
    )


def evaluate_multimodality_metric(wrapper, k_samples_list, mm_num_times):
    if not k_samples_list:
        return 0.0
    embs = []
    for ks in k_samples_list:
        m_len = int((~ks["x_mask"]).sum())
        k_motions = ks["k_samples"].astype(np.float32)
        m_lens = np.full((len(k_motions),), m_len, dtype=np.int32)
        embs.append(wrapper.get_motion_embeddings(k_motions, m_lens)[None])
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
    loaders["ground truth"] = _batches(gt, batch_size)
    loaders["vald"] = _batches(gen, batch_size)

    match_score, r_precision, activations = evaluate_matching_score(wrapper, loaders)
    fid = evaluate_fid(wrapper, _batches(gt, batch_size), activations)
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
