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
    freeze_backbone: bool = False,
    mesh=None,
) -> Callable:
    """step(state, imgs, labels, rng) -> (state, metrics). ``augment`` (from
    ops/augment.py) moves the dataset transform chain on device; imgs are
    then raw uint8.

    With ``tcfg.accum_iter > 1`` the batch holds accum_iter loader batches
    (reference semantics, engine_finetune.py accum path) consumed as a
    lax.scan of microbatches — mixup and augmentation are keyed per
    microbatch, matching accum_iter separate reference iterations.

    ``mesh``: required iff ``cfg.sequence_parallel`` (see
    train/pretrain.make_pretrain_step).
    """
    import contextlib

    use_mix = (tcfg.mixup > 0 or tcfg.cutmix > 0
               or tcfg.cutmix_minmax is not None)
    if cfg.sequence_parallel and mesh is None:
        raise ValueError(
            "cfg.sequence_parallel=True needs the mesh at trace time: "
            "make_classify_train_step(..., mesh=mesh)"
        )
    trace_ctx = lambda: (mesh if mesh is not None else contextlib.nullcontext())

    def loss_fn(params, model_state, imgs, labels, rng):
        k_aug, k_mix, k_model = jax.random.split(rng, 3)
        if augment is not None:
            imgs = augment(k_aug, imgs)
        if use_mix:
            imgs, targets = mixup_cutmix(
                k_mix, imgs, labels, cfg.num_classes,
                mixup_alpha=tcfg.mixup, cutmix_alpha=tcfg.cutmix,
                prob=tcfg.mixup_prob, switch_prob=tcfg.mixup_switch_prob,
                smoothing=tcfg.label_smoothing, mode=tcfg.mixup_mode,
                cutmix_minmax=tcfg.cutmix_minmax,
            )
        else:
            targets = smooth_one_hot(labels, cfg.num_classes, tcfg.label_smoothing)
        logits, new_model_state = vit_apply(
            params, model_state, cfg, imgs, train=True, rng=k_model,
            freeze_backbone=freeze_backbone,
        )
        loss = soft_cross_entropy(logits, targets)
        acc1 = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        )
        return loss, (acc1, new_model_state)

    def step(state: TrainState, imgs, labels, rng):
      with trace_ctx():
        rng = jax.random.fold_in(rng, state.step)
        accum = tcfg.accum_iter
        if accum == 1:
            (loss, (acc1, new_model_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.model_state, imgs, labels, rng)
        else:
            b = imgs.shape[0]
            micro = b // accum
            imgs_m = imgs.reshape((accum, micro) + imgs.shape[1:])
            labels_m = labels.reshape((accum, micro))

            def body(carry, xs):
                grads_acc, loss_acc, acc_acc, model_state = carry
                mb, lb, key = xs
                (loss, (acc1, new_ms)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, model_state, mb, lb, key)
                return (
                    jax.tree.map(jnp.add, grads_acc, grads),
                    loss_acc + loss, acc_acc + acc1, new_ms,
                ), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            keys = jax.random.split(rng, accum)
            (grads, loss, acc1, new_model_state), _ = jax.lax.scan(
                body,
                (zeros_g, jnp.zeros((), jnp.float32),
                 jnp.zeros((), jnp.float32), state.model_state),
                (imgs_m, labels_m, keys),
            )
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, acc1 = loss * inv, acc1 * inv
        gnorm = global_norm(grads)
        new_state = state.apply_gradients(grads, new_model_state)
        metrics = dict(loss=loss, grad_norm=gnorm, lr=schedule(state.step), acc1=acc1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    cfg: ViTClassifierConfig,
    preprocess: Callable | None = None,
    mesh=None,
) -> Callable:
    """step(params, model_state, imgs, labels[, valid]) -> metrics + logits.

    Mirrors engine_finetune.evaluate's per-batch work (:127-160); top-5 and
    F1/mIoU aggregation happen host-side over the epoch (utils/metrics.py).
    ``preprocess`` (ops/augment.make_eval_preprocess) runs on device.

    ``valid`` is a boolean (B,) mask marking real samples: the host pads the
    ragged final eval batch to a static shape so the whole eval epoch is ONE
    compile (vs. a fresh jit per distinct ragged size — expensive with this
    environment's slow remote compiles). loss/acc are means over valid rows;
    ``n`` is the valid count.
    """

    import contextlib

    if cfg.sequence_parallel and mesh is None:
        raise ValueError(
            "cfg.sequence_parallel=True needs the mesh at trace time: "
            "make_eval_step(..., mesh=mesh)"
        )

    def step(params, model_state, imgs, labels, valid=None):
      with (mesh if mesh is not None else contextlib.nullcontext()):
        if preprocess is not None:
            imgs = preprocess(imgs)
        logits, _ = vit_apply(params, model_state, cfg, imgs, train=False)
        v = (
            jnp.ones(labels.shape, jnp.float32)
            if valid is None else valid.astype(jnp.float32)
        )
        n = jnp.maximum(jnp.sum(v), 1.0)
        per_loss = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1
        )[:, 0]
        top1 = jnp.argmax(logits, axis=-1)
        k = min(5, cfg.num_classes)
        _, topk = jax.lax.top_k(logits, k)
        correct1 = (top1 == labels).astype(jnp.float32)
        correctk = jnp.any(topk == labels[:, None], axis=1).astype(jnp.float32)
        # In-graph GLOBAL confusion matrix (rows=true, cols=pred): the
        # batch-dim contraction makes XLA insert the cross-device psum, so
        # every host sees the full-batch counts — unlike the reference's
        # per-rank sklearn F1 (engine_finetune.py:177-181, a defect to beat)
        # and without reading batch-sharded rows host-side (whose sharding
        # jit does not guarantee).
        oh_true = jax.nn.one_hot(labels, cfg.num_classes, dtype=jnp.float32)
        oh_pred = jax.nn.one_hot(top1, cfg.num_classes, dtype=jnp.float32)
        cm = jnp.einsum("bt,bp->tp", oh_true * v[:, None], oh_pred)
        # No per-row outputs besides logits (one test consumer): returning
        # batch-sharded rows invites host-side reads whose sharding jit
        # does not pin — the exact multi-host hazard the in-graph cm fixed.
        return dict(
            loss=jnp.sum(per_loss * v) / n,
            acc1=jnp.sum(correct1 * v) / n,
            acc5=jnp.sum(correctk * v) / n,
            n=jnp.sum(v),
            cm=cm,
            logits=logits,
        )

    return jax.jit(step, static_argnames=())

