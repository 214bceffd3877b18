"""Training stack: optimizers, schedules, state, jitted step functions."""

from cross_scale_mae_tpu.train.schedule import warmup_half_cosine
from cross_scale_mae_tpu.train.optim import (
    build_optimizer,
    lars,
    layer_decay_scales,
    wd_mask,
)
from cross_scale_mae_tpu.train.state import TrainState

__all__ = [
    "warmup_half_cosine",
    "build_optimizer",
    "lars",
    "layer_decay_scales",
    "wd_mask",
    "TrainState",
]
