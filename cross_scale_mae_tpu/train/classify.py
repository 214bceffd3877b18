"""Finetune / linear-probe / eval steps for the downstream classifier.

Replaces ``engine_finetune.py:24-123`` (train with mixup + clip) and
``:127-236`` (evaluate). Linear probing differs only in config: frozen
backbone via an ``optax.masked`` optimizer, BN head, LARS — the step function
is shared.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import TrainConfig, ViTClassifierConfig
from cross_scale_mae_tpu.models.vit import vit_apply
from cross_scale_mae_tpu.train.mixup import (
    mixup_cutmix,
    smooth_one_hot,
    soft_cross_entropy,
)
from cross_scale_mae_tpu.train.state import TrainState, global_norm


def make_classify_train_step(
    cfg: ViTClassifierConfig,
    tcfg: TrainConfig,
    schedule: Callable,
    donate: bool = True,
    augment: Callable | None = None,
) -> Callable:
    """step(state, imgs, labels, rng) -> (state, metrics). ``augment`` (from
    ops/augment.py) moves the dataset transform chain on device; imgs are
    then raw uint8."""

    use_mix = tcfg.mixup > 0 or tcfg.cutmix > 0

    def loss_fn(params, model_state, imgs, targets, rng):
        logits, new_model_state = vit_apply(
            params, model_state, cfg, imgs, train=True, rng=rng
        )
        loss = soft_cross_entropy(logits, targets)
        return loss, (logits, new_model_state)

    def step(state: TrainState, imgs, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        k_aug, k_mix, k_model = jax.random.split(rng, 3)
        if augment is not None:
            imgs = augment(k_aug, imgs)
        if use_mix:
            imgs, targets = mixup_cutmix(
                k_mix, imgs, labels, cfg.num_classes,
                mixup_alpha=tcfg.mixup, cutmix_alpha=tcfg.cutmix,
                prob=tcfg.mixup_prob, switch_prob=tcfg.mixup_switch_prob,
                smoothing=tcfg.label_smoothing,
            )
        else:
            targets = smooth_one_hot(labels, cfg.num_classes, tcfg.label_smoothing)
        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.model_state, imgs, targets, k_model)
        gnorm = global_norm(grads)
        new_state = state.apply_gradients(grads, new_model_state)
        acc1 = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        )
        metrics = dict(loss=loss, grad_norm=gnorm, lr=schedule(state.step), acc1=acc1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: ViTClassifierConfig, preprocess: Callable | None = None) -> Callable:
    """step(params, model_state, imgs, labels) -> metrics + logits.

    Mirrors engine_finetune.evaluate's per-batch work (:127-160); top-5 and
    F1/mIoU aggregation happen host-side over the epoch (utils/metrics.py).
    ``preprocess`` (ops/augment.make_eval_preprocess) runs on device.
    """

    def step(params, model_state, imgs, labels):
        if preprocess is not None:
            imgs = preprocess(imgs)
        logits, _ = vit_apply(params, model_state, cfg, imgs, train=False)
        loss = jnp.mean(
            -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1
            )
        )
        top1 = jnp.argmax(logits, axis=-1)
        k = min(5, cfg.num_classes)
        _, topk = jax.lax.top_k(logits, k)
        correct1 = (top1 == labels).astype(jnp.float32)
        correctk = jnp.any(topk == labels[:, None], axis=1).astype(jnp.float32)
        return dict(
            loss=loss,
            acc1=jnp.mean(correct1),
            acc5=jnp.mean(correctk),
            pred=top1,
            logits=logits,
        )

    return jax.jit(step)
