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
    and 'embeddings' (N, dim). Unknown captions fall back to the given
    fallback encoder (default: hash) with a one-time warning."""

    def __init__(self, path: str, fallback: Optional[TextEncoder] = None):
        data = np.load(path, allow_pickle=False)
        texts = [str(t) for t in data["texts"]]
        emb = np.asarray(data["embeddings"], dtype=np.float32)
        super().__init__(emb.shape[1])
        self._cache = dict(zip(texts, emb))
        self._fallback = fallback or HashTextEncoder(self.dim)
        self._warned = False

    def _encode_one(self, text: str) -> np.ndarray:
        if not self._warned:
            import logging
            logging.getLogger("afford_motion_tpu").warning(
                "caption not in embedding table, falling back to hash encoder: %r", text
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


def create_text_encoder(
    version: str,
    *,
    table_path: Optional[str] = None,
    weights_dir: Optional[str] = None,
    max_length: int = 32,
) -> TextEncoder:
    """Pick the best available provider for this machine."""
    dim, _family = get_lang_feat_dim_type(version)
    if table_path and Path(table_path).exists():
        return TableTextEncoder(table_path)
    if weights_dir and Path(weights_dir).exists():
        try:
            return ClipTextEncoder(weights_dir, max_length=max_length)
        except Exception:
            pass
    return HashTextEncoder(dim)
