"""Training state pytree + optimizer construction
(reference: utils/training.py:36-50 for the optimizer surface)."""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jnp.ndarray                    # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, *, params, batch_stats, tx) -> "TrainState":
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def frozen_param_mask(params: Any, frozen_prefixes=("scene_model",)) -> Any:
    """True = trainable. Masks out frozen submodules (the reference's
    requires_grad filter, utils/training.py:36-50 — frozen scene/text
    encoders get no optimizer state)."""

    def mask_path(path, _leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return not any(n in frozen_prefixes for n in names)

    return jax.tree_util.tree_map_with_path(mask_path, params)


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    lr_anneal_steps: int = 0,
    params: Optional[Any] = None,
    frozen_prefixes=("scene_model",),
) -> optax.GradientTransformation:
    """AdamW + linear LR anneal (reference: utils/training.py:36-50, 84-90:
    lr scales by (1 - step/lr_anneal_steps) when lr_anneal_steps > 0)."""
    if lr_anneal_steps and lr_anneal_steps > 0:
        schedule = optax.linear_schedule(lr, 0.0, lr_anneal_steps)
    else:
        schedule = lr
    tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    if params is not None:
        mask = frozen_param_mask(params, frozen_prefixes)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask),
        )
    return tx
