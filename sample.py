"""Sampling / demo entry point.

Drives the ``sample:`` config section (configs/task/*.yaml) that the
reference defines for its Example datasets: generate from a prompt file
(``data/examples/*.txt``) with the latest checkpoint and hand results to
the task's visualizer. For the two-stage demo chain, stage-1
ContactVisualizer writes ``<case>/contact.npy`` which stage-2's
ContactMotionExampleDataset consumes via ``task.sample.contact_folder``
(reference: datasets/motionx.py:984-992).

    python sample.py exp_dir=outputs/<ts>_<exp> task=contact_gen model=cdm ...
    python sample.py exp_dir=... task=contact_motion_gen model=cmdm \
        task.sample.contact_folder=<stage-1 sample dir> ...
"""
import os
import random
import sys

import numpy as np

from afford_motion_tpu.data import create_dataset
from afford_motion_tpu.eval.visualize import create_visualizer
from afford_motion_tpu.models import create_model_and_diffusion, create_text_encoder
from afford_motion_tpu.models.conditioning import host_prepare_cond
from afford_motion_tpu.train import latest_ckpt, load_params, make_sample_fn
from afford_motion_tpu.utils.config import DictConfig, load_config
from afford_motion_tpu.utils.io import add_file_handler, get_logger, mkdir_if_not_exists, time_str
from afford_motion_tpu.utils.misc import apply_platform_env, compute_repr_dimension

logger = get_logger()


def sample(cfg: DictConfig) -> None:
    import jax
    import jax.numpy as jnp

    from test import _init_variables

    sample_dir = os.path.join(cfg.exp_dir, "sample-" + time_str())
    mkdir_if_not_exists(sample_dir)
    add_file_handler(os.path.join(sample_dir, "sample.log"))

    scfg = cfg.task.sample
    ds_cfg = DictConfig(dict(cfg.task.dataset))
    ds_cfg["name"] = scfg.dataset_name
    kwargs = {k: v for k, v in scfg.items()
              if k not in ("batch_size", "num_workers", "dataset_name")}
    dataset = create_dataset(ds_cfg, "test", **kwargs)
    logger.info(f"Load sample dataset size: {len(dataset)}")
    dataloader = dataset.get_dataloader(
        batch_size=min(int(scfg.batch_size), len(dataset)),
        shuffle=False, drop_last=True,
    )

    model, diffusion = create_model_and_diffusion(cfg)
    te_cfg = cfg.get("text_encoder", DictConfig({}))
    text_encoder = create_text_encoder(
        cfg.model.text_model.version,
        table_path=te_cfg.get("table_path"),
        weights_dir=te_cfg.get("weights_dir"),
        max_length=cfg.model.text_model.max_length,
        per_token=str(cfg.model.name) == "CMDM",
    )

    ckpt = latest_ckpt(os.path.join(cfg.exp_dir, "ckpt"))
    assert ckpt is not None, "No checkpoint found."
    # template-free restore (see test.py — skips minutes of init tracing)
    try:
        from afford_motion_tpu.train.checkpoint import load_raw

        params, batch_stats = load_raw(ckpt)
    except Exception as e:
        logger.warning(f"raw restore failed ({e}); building init template")
        first = next(iter(dataloader))
        variables = _init_variables(model, diffusion, first, text_encoder)
        params, batch_stats = load_params(
            ckpt, variables["params"], variables.get("batch_stats", {})
        )
    variables = {"params": params, "batch_stats": batch_stats}
    logger.info(f"Load checkpoint from {ckpt}")

    visualizer = create_visualizer(cfg.task)
    sample_fn = make_sample_fn(
        model, diffusion, clip_denoised=False,
        sampler=str(cfg.task.sample.get("sampler", "ddpm")),
        eta=float(cfg.task.sample.get("ddim_eta", 0.0)),
    )
    rng = jax.random.PRNGKey(cfg.seed)

    for i, data in enumerate(dataloader):
        x, cond = host_prepare_cond(data, text_encoder)
        cond = {k: jnp.asarray(v) for k, v in cond.items()}
        if "c_pc_contact" in cond and cond["c_pc_contact"].ndim == 4:
            cond["c_pc_contact"] = cond["c_pc_contact"][:, 0]
        rng, sub = jax.random.split(rng)
        out = np.asarray(sample_fn(variables, tuple(x.shape), cond, sub))
        visualizer.visualize(out, sample_dir, i, dataloader, **data)
        logger.info(f"batch {i} visualized")
    logger.info(f"[Sample] results in {sample_dir}")


def main(argv=None) -> None:
    apply_platform_env()  # honor JAX_PLATFORMS=cpu under the TPU sitecustomize
    cfg = load_config("configs", argv if argv is not None else sys.argv[1:])
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    cfg.model.input_feats = compute_repr_dimension(cfg.model.data_repr)
    sample(cfg)


if __name__ == "__main__":
    main()
