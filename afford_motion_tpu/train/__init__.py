from .checkpoint import latest_ckpt, load_ckpt, load_params, parse_step, save_ckpt
from .loop import TrainLoop, make_train_step
from .sampling import make_sample_fn
from .state import TrainState, make_optimizer

__all__ = [
    "TrainLoop",
    "make_train_step",
    "make_sample_fn",
    "TrainState",
    "make_optimizer",
    "save_ckpt",
    "load_ckpt",
    "load_params",
    "latest_ckpt",
    "parse_step",
]
