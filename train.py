"""Training entry point (reference: train.py:15-88 + train_ddp.py:17-94).

CLI-compatible with the reference's Hydra grammar:

    python train.py task=contact_gen model=cdm exp_name=myexp \
        task.train.batch_size=64 diffusion.steps=500 ...

There is no separate DDP entry — data parallelism is a property of the jit
compilation over the device mesh, so the single entry covers 1..N chips
(the reference's torchrun/NCCL path maps to plain `python train.py`).
"""
import os
import random
import sys

import numpy as np

from afford_motion_tpu.data import create_dataset
from afford_motion_tpu.models import create_model_and_diffusion, create_text_encoder
from afford_motion_tpu.train import TrainLoop
from afford_motion_tpu.utils.config import DictConfig, load_config, save_config
from afford_motion_tpu.utils.io import Board, add_file_handler, get_logger, mkdir_if_not_exists
from afford_motion_tpu.utils.misc import apply_platform_env, compute_repr_dimension

logger = get_logger()


def train(cfg: DictConfig) -> None:
    """(reference: train.py:15-51)."""
    phase = cfg.task.train.get("phase", "train")
    dataset = create_dataset(cfg.task.dataset, phase)
    logger.info(f"Load train dataset size: {len(dataset)}")

    dataloader = dataset.get_dataloader(
        batch_size=cfg.task.train.batch_size,
        num_workers=cfg.task.train.get("num_workers", 0),
        shuffle=True,
        drop_last=True,
        seed=cfg.seed,
    )

    model, diffusion = create_model_and_diffusion(cfg)
    te_cfg = cfg.get("text_encoder", DictConfig({}))
    text_encoder = create_text_encoder(
        cfg.model.text_model.version,
        table_path=te_cfg.get("table_path"),
        weights_dir=te_cfg.get("weights_dir"),
        max_length=cfg.model.text_model.max_length,
        # TRAIN is strict: a stale table must not silently train on hash
        # embeddings (escape hatch: text_encoder.allow_fallback=true)
        strict_table=not bool(te_cfg.get("allow_fallback", False)),
        # CMDM+BERT consumes per-token features (reference cmdm.py:138-140)
        per_token=str(cfg.model.name) == "CMDM",
    )

    TrainLoop(
        cfg, model, diffusion, dataloader, text_encoder,
        exp_dir=cfg.exp_dir, seed=cfg.seed,
    ).run_loop()


def main(argv=None) -> None:
    apply_platform_env()  # honor JAX_PLATFORMS=cpu under the TPU sitecustomize
    cfg = load_config("configs", argv if argv is not None else sys.argv[1:])

    # fixed seeds (reference: train.py:81-88)
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    # modeling dimension from the data representation (reference: train.py:60)
    cfg.model.input_feats = compute_repr_dimension(cfg.model.data_repr)

    mkdir_if_not_exists(cfg.log_dir)
    mkdir_if_not_exists(cfg.ckpt_dir)
    mkdir_if_not_exists(cfg.eval_dir)
    add_file_handler(os.path.join(cfg.log_dir, "runtime.log"))
    save_config(cfg, os.path.join(cfg.exp_dir, "config.yaml"))

    Board().create_board(cfg.platform, log_dir=cfg.log_dir)
    logger.info(f"[Train] experiment dir: {cfg.exp_dir}")
    try:
        train(cfg)
    finally:
        Board().close()


if __name__ == "__main__":
    main()
