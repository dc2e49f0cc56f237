"""Frozen text encoders (reference: models/functions.py:6-94).

The reference loads frozen CLIP/BERT and re-encodes captions every forward,
detaching the result (models/cdm.py:489-494) — i.e. text embeddings are
pure frozen features of the caption string. The TPU-first design therefore
encodes text on the HOST, outside jit, and feeds plain arrays to the
denoiser. Caption sets are finite and known at dataset-load time, so
embeddings are precomputed/cached (SURVEY.md §7 hard-part 3).

Three interchangeable providers:

- ``TableTextEncoder``: lookup of precomputed embeddings from an ``.npz``
  (export one with tools/export_clip_embeddings.py from any torch+clip
  machine). This is the production path — numerically identical to the
  reference's frozen CLIP.
- ``ClipTextEncoder``: runs HuggingFace CLIPTextModel locally if a weights
  directory exists (zero-egress container: gated on local files).
- ``BertTextEncoder``: runs a local HuggingFace BertModel, mirroring the
  reference's ``load_and_freeze_bert_model``/``encode_text_bert``
  (reference: models/functions.py:6-44): pooled ``pooler_output`` for the
  CDM (s_feat=True, cdm.py:491) or per-token ``last_hidden_state`` + pad
  mask for the CMDM (cmdm.py:138-140).
- ``HashTextEncoder``: deterministic pseudo-embeddings for tests/benches
  where real CLIP weights are unavailable. The empty string maps to the
  zero vector (the reference's CFG 'null' text is '' —
  datasets/transforms.py:31-43).
"""
from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.io import get_logger

logger = get_logger()


def get_lang_feat_dim_type(version: str) -> Tuple[int, str]:
    """Model version -> (feature dim, family) (reference: functions.py:86-94)."""
    if version in ("ViT-B/32", "ViT-B/16"):
        return 512, "clip"
    if version in ("ViT-L/14", "ViT-L/14@336px"):
        return 768, "clip"
    if "bert" in version.lower():
        return 768, "bert"
    raise NotImplementedError(f"unknown text model version: {version}")


class TextEncoder:
    """Host-side frozen caption -> embedding provider with a memo cache."""

    # per_token=True providers (BERT for the CMDM) emit (B, L, dim) token
    # features + a pad mask instead of one pooled vector per caption
    per_token: bool = False

    def __init__(self, dim: int):
        self.dim = dim
        self._cache: Dict[str, np.ndarray] = {}

    def _encode_one(self, text: str) -> np.ndarray:
        raise NotImplementedError

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """(B,) strings -> (B, dim) float32."""
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            e = self._cache.get(t)
            if e is None:
                e = self._encode_one(t).astype(np.float32)
                self._cache[t] = e
            out[i] = e
        return out

    def encode_tokens(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """(B,) strings -> ((B, L, dim) f32, (B, L) bool pad mask — True
        marks an INVALID/padding token, the reference's inverted attention
        mask (cmdm.py:140)). Pooled providers return L=1 all-valid."""
        emb = self.encode(texts)[:, None, :]
        return emb, np.zeros((len(texts), 1), dtype=bool)


class HashTextEncoder(TextEncoder):
    """Deterministic pseudo-embeddings (unit-norm gaussian seeded by the
    caption hash). '' -> zeros, matching CFG null-text semantics."""

    def _encode_one(self, text: str) -> np.ndarray:
        if text == "":
            return np.zeros(self.dim, dtype=np.float32)
        seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / (np.linalg.norm(v) + 1e-8)


class TableTextEncoder(TextEncoder):
    """Precomputed embedding table from .npz with arrays 'texts' (unicode)
    and 'embeddings' (N, dim).

    Unknown captions: with ``strict=True`` (the TRAIN default) they raise —
    a stale table would otherwise silently train on noise embeddings; with
    ``strict=False`` they fall back to the given fallback encoder (default:
    hash) with a one-time warning. Escape hatch:
    ``text_encoder.allow_fallback: true``."""

    def __init__(self, path: str, fallback: Optional[TextEncoder] = None,
                 strict: bool = False):
        data = np.load(path, allow_pickle=False)
        texts = [str(t) for t in data["texts"]]
        emb = np.asarray(data["embeddings"], dtype=np.float32)
        super().__init__(emb.shape[1])
        self._cache = dict(zip(texts, emb))
        self._fallback = fallback or HashTextEncoder(self.dim)
        self.strict = bool(strict)
        self._warned = False

    def _encode_one(self, text: str) -> np.ndarray:
        if self.strict:
            raise KeyError(
                f"caption not in embedding table: {text!r} — the table is "
                "stale for this dataset. Re-export it "
                "(tools/export_clip_embeddings.py) or set "
                "text_encoder.allow_fallback=true to train on hash "
                "embeddings for unknown captions."
            )
        if not self._warned:
            logger.warning(
                f"caption not in embedding table, falling back to hash "
                f"encoder: {text!r}"
            )
            self._warned = True
        return self._fallback._encode_one(text)


class ClipTextEncoder(TextEncoder):
    """HuggingFace CLIP text tower run locally on CPU (weights must already
    be on disk — this container has no network). Produces the pooled,
    projected embedding like the reference's clip.encode_text
    (functions.py:62-84)."""

    def __init__(self, weights_dir: str, max_length: int = 32):
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer  # local import

        self.tokenizer = CLIPTokenizer.from_pretrained(weights_dir)
        self.model = CLIPTextModelWithProjection.from_pretrained(weights_dir)
        self.model.eval()
        self.max_length = max_length
        super().__init__(self.model.config.projection_dim)

    def _encode_one(self, text: str) -> np.ndarray:
        import torch

        with torch.no_grad():
            # reference truncates to max_length+2 then pads to CLIP's 77
            tok = self.tokenizer(
                [text], padding="max_length", truncation=True,
                max_length=min(self.max_length + 2, 77), return_tensors="pt",
            )
            pad = 77 - tok["input_ids"].shape[1]
            if pad > 0:
                import torch.nn.functional as F
                tok["input_ids"] = F.pad(tok["input_ids"], (0, pad))
                tok["attention_mask"] = F.pad(tok["attention_mask"], (0, pad))
            out = self.model(**tok)
            return out.text_embeds[0].numpy()


class BertTextEncoder(TextEncoder):
    """HuggingFace BERT run locally on CPU (local weights only — this
    container has no network). Mirrors the reference's
    ``encode_text_bert`` (functions.py:24-44): ``pooled=True`` returns the
    ``pooler_output`` sentence feature (the CDM's s_feat=True path,
    cdm.py:491); ``pooled=False`` returns per-token ``last_hidden_state``
    padded/truncated to ``max_length`` plus the inverted attention mask
    (the CMDM path, cmdm.py:138-140)."""

    def __init__(self, weights_dir: str, max_length: int = 32,
                 pooled: bool = True):
        from transformers import AutoTokenizer, BertModel  # local import

        self.tokenizer = AutoTokenizer.from_pretrained(weights_dir, use_fast=False)
        self.model = BertModel.from_pretrained(weights_dir)
        self.model.eval()
        self.max_length = int(max_length)
        self.per_token = not pooled
        super().__init__(int(self.model.config.hidden_size))
        # token-feature memo: caption -> (tokens (L, dim), pad (L,) bool)
        self._tok_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def _run(self, text: str):
        import torch

        with torch.no_grad():
            tok = self.tokenizer(
                [text], return_tensors="pt", padding="max_length",
                truncation=True, max_length=self.max_length,
            )
            return tok, self.model(**tok)

    def _encode_one(self, text: str) -> np.ndarray:
        _, out = self._run(text)
        return out.pooler_output[0].numpy()

    def encode_tokens(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        if not self.per_token:
            return super().encode_tokens(texts)
        emb = np.empty((len(texts), self.max_length, self.dim), dtype=np.float32)
        pad = np.empty((len(texts), self.max_length), dtype=bool)
        for i, t in enumerate(texts):
            hit = self._tok_cache.get(t)
            if hit is None:
                tok, out = self._run(t)
                hit = (
                    out.last_hidden_state[0].numpy().astype(np.float32),
                    ~tok["attention_mask"][0].numpy().astype(bool),
                )
                self._tok_cache[t] = hit
            emb[i], pad[i] = hit
        return emb, pad


def create_text_encoder(
    version: str,
    *,
    table_path: Optional[str] = None,
    weights_dir: Optional[str] = None,
    max_length: int = 32,
    strict_table: bool = False,
    per_token: bool = False,
) -> TextEncoder:
    """Pick the best available provider for this machine.

    ``strict_table``: unknown captions raise instead of hash-falling-back
    (the TRAIN default via text_encoder.allow_fallback=false).
    ``per_token``: BERT family only — emit (B, L, dim) token features for
    the CMDM instead of the pooled sentence vector (reference cmdm.py:138)."""
    dim, family = get_lang_feat_dim_type(version)
    if family == "bert":
        if weights_dir and Path(weights_dir).exists():
            return BertTextEncoder(
                weights_dir, max_length=max_length, pooled=not per_token
            )
        # a pooled table can still serve the CDM's s_feat path
        if not per_token and table_path and Path(table_path).exists():
            return TableTextEncoder(table_path, strict=strict_table)
        if strict_table:
            raise FileNotFoundError(
                f"text_model.version={version!r} needs local BERT weights "
                f"(text_encoder.weights_dir={weights_dir!r} not found"
                + ("" if per_token else f"; table_path={table_path!r} not found")
                + "). Set text_encoder.allow_fallback=true to use hash "
                "embeddings (tests only)."
            )
        logger.warning(
            f"no BERT weights at {weights_dir!r}; using HASH text "
            "embeddings — test/bench use only"
        )
        return HashTextEncoder(dim)
    if table_path and Path(table_path).exists():
        return TableTextEncoder(table_path, strict=strict_table)
    if weights_dir and Path(weights_dir).exists():
        try:
            return ClipTextEncoder(weights_dir, max_length=max_length)
        except Exception as e:
            logger.warning(f"local CLIP weights unusable ({e}); falling through")
    # no provider at all: loud warning, not an error — synthetic/e2e tests
    # run without any table by design (a *stale* table is the dangerous
    # case, handled by TableTextEncoder.strict above)
    logger.warning(
        f"no embedding table at {table_path!r} and no local CLIP weights at "
        f"{weights_dir!r}; using HASH text embeddings — test/bench use only"
    )
    return HashTextEncoder(dim)
