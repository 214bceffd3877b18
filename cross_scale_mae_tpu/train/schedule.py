"""Learning-rate schedule: per-iteration linear warmup + half-cosine decay.

Same curve as ``util/lr_sched.py:9-27`` — the reference adjusts the lr every
iteration using a *fractional* epoch (``engine_pretrain.py:45-48``), which is
exactly an iteration-indexed schedule here. The schedule is a pure function
of the step, so it lives inside the compiled update instead of mutating
optimizer state from the host.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_half_cosine(
    base_lr: float,
    min_lr: float,
    warmup_epochs: float,
    total_epochs: float,
    steps_per_epoch: int,
):
    """Returns schedule(step) -> lr, matching util/lr_sched.py:9-27."""

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        epoch = step / steps_per_epoch
        warm = base_lr * epoch / jnp.maximum(warmup_epochs, 1e-8)
        denom = max(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / denom)
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
