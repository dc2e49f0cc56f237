"""Orbax checkpointing with the reference's step-naming semantics
(reference: utils/training.py:92-109 saves ``model{step:06d}.pt``;
test.py:47-49 loads the natsort-latest). Checkpoints are directories
``model{step:06d}/`` containing params / batch_stats / opt_state / step.
Unlike the reference we persist the frozen scene-model weights too (no
re-download path in a zero-egress deployment)."""
from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.misc import natsorted


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_ckpt(state, path: str) -> None:
    """Save {params, batch_stats, opt_state, step} to ``path``."""
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
    }
    ckptr.save(_abs(path), payload, force=True)
    ckptr.wait_until_finished()


def load_ckpt(state, path: str):
    """Restore into an existing TrainState (shape/dtype template)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
    }
    restored = ckptr.restore(_abs(path), template)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def load_raw(path: str):
    """Restore (params, batch_stats) WITHOUT a shape template.

    Inference entries (test.py/sample.py) used to build the template via a
    jitted ``model.init`` — whose host-side trace/lowering of the flagship
    graph costs ~2-3 min per process on a 1-core host and is NOT covered
    by the persistent XLA cache (round-5 rehearsal measurement:
    stage-2 init_restore ~170 s warm). The checkpoint already knows every
    shape; restoring raw skips the init entirely."""
    ckptr = ocp.StandardCheckpointer()
    full = ckptr.restore(_abs(path))
    return full["params"], full.get("batch_stats", {}) or {}


def load_params(path: str, template_params: Any, template_bs: Any):
    """Restore only (params, batch_stats) for inference (test.py usage)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(template_params),
        "batch_stats": jax.device_get(template_bs),
    }
    # partial restore: read the full tree, take what we need
    full_template = dict(template)
    try:
        restored = ckptr.restore(_abs(path), full_template)
    except BaseException:
        # checkpoint also contains opt_state/step
        full = ckptr.restore(_abs(path))
        restored = {"params": full["params"], "batch_stats": full["batch_stats"]}
    return restored["params"], restored["batch_stats"]


def latest_ckpt(ckpt_dir: str) -> Optional[str]:
    """natsort-latest model* checkpoint (reference: test.py:47-49)."""
    cands = [p for p in glob.glob(os.path.join(ckpt_dir, "model*")) if os.path.isdir(p)]
    if not cands:
        return None
    return natsorted(cands)[-1]


def parse_step(ckpt_path: str) -> int:
    """Extract the step from 'model{step:06d}' (reference: training.py:55-68)."""
    name = Path(ckpt_path).name
    digits = "".join(ch for ch in name if ch.isdigit())
    return int(digits) if digits else 0
