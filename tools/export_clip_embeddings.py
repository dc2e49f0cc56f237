"""Export a precomputed CLIP text-embedding table for the TPU framework.

Run this ON A MACHINE WITH the `clip` package (or HF transformers) and
network access; copy the resulting .npz to `data/text_embeddings.npz` on
the TPU host. The table covers every caption the datasets can produce
(the caption sets are finite and known at dataset-load time — SURVEY.md §7
hard-part 3), including the empty string used by classifier-free guidance.

    python tools/export_clip_embeddings.py --data_dir ./data \
        --out ./data/text_embeddings.npz --version ViT-B/32 --max_length 20
"""
import argparse
import glob
import os
import sys

import numpy as np


def collect_captions(data_dir: str) -> list:
    captions = {""}
    # MotionX-style anno.csv utterances
    try:
        import pandas as pd

        for anno_path in glob.glob(os.path.join(data_dir, "*", "contact_motion", "anno.csv")):
            anno = pd.read_csv(anno_path)
            for u in anno.get("utterance", []):
                if isinstance(u, str) and u:
                    captions.update(u.split("$$"))
        custom = os.path.join(data_dir, "custom", "anno.csv")
        if os.path.exists(custom):
            for u in pd.read_csv(custom).get("utterance", []):
                if isinstance(u, str):
                    captions.add(u)
    except Exception as e:
        print(f"anno scan failed: {e}", file=sys.stderr)
    # H3D caption files
    for txt in glob.glob(os.path.join(data_dir, "H3D", "texts", "*.txt")):
        with open(txt) as f:
            for line in f:
                cap = line.split("#")[0].strip()
                if cap:
                    captions.add(cap)
    return sorted(captions)


def encode_clip(captions, version: str, max_length: int) -> np.ndarray:
    import clip  # openai/CLIP
    import torch

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model, _ = clip.load(version, device=device, jit=False)
    model.eval()
    out = []
    B = 256
    with torch.no_grad():
        for i in range(0, len(captions), B):
            batch = captions[i: i + B]
            # reference truncation: max_length + 2 tokens, padded to 77
            # (models/functions.py:62-84)
            toks = clip.tokenize(batch, truncate=True).to(device)
            if max_length + 2 < 77:
                toks[:, max_length + 2:] = 0
            emb = model.encode_text(toks).float().cpu().numpy()
            out.append(emb)
    return np.concatenate(out, axis=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--out", default="./data/text_embeddings.npz")
    p.add_argument("--version", default="ViT-B/32")
    p.add_argument("--max_length", type=int, default=20)
    args = p.parse_args()

    captions = collect_captions(args.data_dir)
    print(f"{len(captions)} unique captions")
    emb = encode_clip(captions, args.version, args.max_length)
    np.savez(args.out, texts=np.array(captions, dtype=object).astype(str),
             embeddings=emb.astype(np.float32))
    print(f"wrote {args.out}: {emb.shape}")


if __name__ == "__main__":
    main()
