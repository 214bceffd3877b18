"""Pretraining step: forward(two views) + every loss + backward + AdamW,
one XLA program.

Replaces ``engine_pretrain.py:18-101``. The reference's per-step host work
(``loss.item()``, ``cuda.synchronize()``, eager metric all-reduce —
engine_pretrain.py:55,72,79) disappears: the step returns a small metrics
dict that the host fetches asynchronously.

Gradient accumulation (``accum_iter``, main_pretrain.py:53-61) is a
``lax.scan`` over microbatches inside the same program — the step receives
``accum_iter`` loader batches concatenated (reference semantics:
engine_pretrain.py:62-70 accumulates distinct loader batches), and is
available in both the GSPMD and shard_map DDP modes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import MAEConfig, TrainConfig
from cross_scale_mae_tpu.models.mae import mae_loss_fn
from cross_scale_mae_tpu.train.state import TrainState, global_norm


def make_pretrain_loss_fn(cfg: MAEConfig, tcfg: TrainConfig,
                          augment: Callable | None):
    """The exact per-batch objective the step builders differentiate:
    (params, model_state, imgs, rng) -> (loss, MAEOutput). Public so the
    driver's shard_map certification leg (__graft_entry__.py) can compute a
    per-shard ground truth with the same augmentation + rng handling."""
    # mask_seed reproduces the reference's torch.manual_seed(mask_seed)
    # inside EACH per-view forward (MAE_ViT_Baseline.py:301-302): identical
    # mask noise for both scale views => consistent_mask is implied.
    consistent = tcfg.consistent_mask or tcfg.mask_seed is not None

    def loss_fn(params, model_state, imgs, rng):
        if augment is not None:
            k_aug, rng = jax.random.split(rng)
            if imgs.ndim == 5:
                # Temporal pair (B, T, H, W, C): flatten frames so each gets
                # independent augmentation params, then restore the pair axis.
                b, t = imgs.shape[:2]
                flat = augment(k_aug, imgs.reshape((b * t,) + imgs.shape[2:]))
                imgs = flat.reshape((b, t) + flat.shape[1:])
            else:
                imgs = augment(k_aug, imgs)
        out = mae_loss_fn(
            params, model_state, cfg, imgs, rng,
            train=True, consistent_mask=consistent,
        )
        return out.loss, out

    return loss_fn


def _accum_value_and_grads(loss_fn, params, model_state, batch, rng, accum):
    """(grads, loss, losses, model_state) averaged over ``accum``
    microbatches. accum == 1 is a plain value_and_grad; otherwise a
    lax.scan so the program size stays O(1) in accum."""
    if accum == 1:
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, batch, rng
        )
        return grads, loss, out.losses, out.state

    b = batch.shape[0]
    assert b % accum == 0, (b, accum)
    micro = b // accum
    batches = batch.reshape((accum, micro) + batch.shape[1:])

    def body(carry, xs):
        grads_acc, loss_acc, losses_acc, model_state = carry
        mb, key = xs
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, mb, key
        )
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        losses_acc = jax.tree.map(jnp.add, losses_acc, out.losses)
        # loss is accumulated directly (NOT re-derived from the per-term
        # dict, which stores unweighted terms — e.g. perceptual_weight).
        return (grads_acc, loss_acc + loss, losses_acc, out.state), None

    zeros_g = jax.tree.map(jnp.zeros_like, params)
    struct = jax.eval_shape(
        lambda p, s: loss_fn(p, s, batches[0], rng)[1].losses,
        params, model_state,
    )
    zeros_l = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), struct)
    keys = jax.random.split(rng, accum)
    (grads, loss, losses, new_model_state), _ = jax.lax.scan(
        body,
        (zeros_g, jnp.zeros((), jnp.float32), zeros_l, model_state),
        (batches, keys),
    )
    inv = 1.0 / accum
    grads = jax.tree.map(lambda g: g * inv, grads)
    losses = jax.tree.map(lambda l: l * inv, losses)
    return grads, loss * inv, losses, new_model_state


def _step_rng(tcfg: TrainConfig, rng: jax.Array, step) -> jax.Array:
    # Fold in the step so one host key covers the whole run (replaces
    # per-rank seeding at main_pretrain.py:368-370). mask_seed pins the key
    # instead — the reference's torch.manual_seed path
    # (MAE_ViT_Baseline.py:301-302) makes the crop AND mask deterministic
    # every step; same semantics here.
    if tcfg.mask_seed is not None:
        return jax.random.key(tcfg.mask_seed)
    return jax.random.fold_in(rng, step)


def make_pretrain_step_shard_map(
    cfg: MAEConfig,
    tcfg: TrainConfig,
    schedule: Callable[[jnp.ndarray], jnp.ndarray],
    mesh,
    donate: bool = True,
    augment: Callable | None = None,
) -> Callable:
    """DDP-semantics step via shard_map (manual SPMD over the 'data' axis).

    Two reasons to use this instead of the GSPMD path:

    * **Pallas on multi-chip**: pallas_call is opaque to the GSPMD
      partitioner; under shard_map each shard invokes the kernel on its
      local batch.
    * **Exact reference DDP semantics**: per-device NT-Xent negatives and
      per-device BatchNorm statistics (torch DDP behavior,
      MAE_ViT_MsLdCeCd.py:62 / SURVEY.md §7), vs. the GSPMD path's
      global-batch versions.

    Gradients/losses are pmean'd over 'data' (= the NCCL all-reduce). Params
    and optimizer state must be replicated (no TP/ZeRO in this mode).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    loss_fn = make_pretrain_loss_fn(cfg, tcfg, augment)

    def local_grads(params, model_state, batch, rng):
        # Per-shard rng: decorrelate augmentation across shards (the
        # reference seeds per rank, main_pretrain.py:368-370) — EXCEPT when
        # mask_seed pins the key: the reference re-seeds identically on
        # every rank, so crop+mask must match across shards too.
        if tcfg.mask_seed is None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, loss, losses, new_model_state = _accum_value_and_grads(
            loss_fn, params, model_state, batch, rng, tcfg.accum_iter
        )
        grads = jax.lax.pmean(grads, "data")
        losses = jax.lax.pmean(losses, "data")
        # BN running stats averaged across shards (torch SyncBN-free DDP
        # keeps local stats; averaging is strictly better and cheap).
        new_model_state = jax.lax.pmean(new_model_state, "data")
        return grads, jax.lax.pmean(loss, "data"), losses, new_model_state

    sharded = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    def step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        rng = _step_rng(tcfg, rng, state.step)
        grads, loss, losses, new_model_state = sharded(
            state.params, state.model_state, batch, rng
        )
        gnorm = global_norm(grads)
        new_state = state.apply_gradients(grads, new_model_state)
        metrics = dict(losses)
        metrics.update(loss=loss, grad_norm=gnorm, lr=schedule(state.step))
        if tcfg.watch_gradients:
            # wandb.watch equivalent — same per-subtree gradient norms as
            # the gspmd step (grads are already pmean'd here).
            for name, sub in grads.items():
                metrics[f"gnorm/{name}"] = global_norm(sub)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pretrain_step(
    cfg: MAEConfig,
    tcfg: TrainConfig,
    schedule: Callable[[jnp.ndarray], jnp.ndarray],
    donate: bool = True,
    augment: Callable | None = None,
    mesh=None,
) -> Callable:
    """Returns jit-compiled ``step(state, batch, rng) -> (state, metrics)``.

    batch: (B, H, W, C) normalized images — or raw uint8 when ``augment``
    (ops/augment.py) is given, in which case the whole dataset transform
    chain runs on device inside this same XLA program.
    With ``tcfg.accum_iter > 1``, B = accum_iter * batch_size (the loader
    delivers accum_iter batches per optimizer step, reference semantics).

    ``mesh``: only needed when ``cfg.sequence_parallel`` — the in-model
    sharding constraints (layers.sp_constrain) name mesh axes, so tracing
    must happen inside ``with mesh:``; harmless otherwise.
    """
    import contextlib

    loss_fn = make_pretrain_loss_fn(cfg, tcfg, augment)
    if cfg.sequence_parallel and mesh is None:
        raise ValueError(
            "cfg.sequence_parallel=True needs the mesh at trace time: "
            "make_pretrain_step(..., mesh=mesh)"
        )

    def step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
      with (mesh if mesh is not None else contextlib.nullcontext()):
        rng = _step_rng(tcfg, rng, state.step)
        grads, loss, losses, new_model_state = _accum_value_and_grads(
            loss_fn, state.params, state.model_state, batch, rng,
            tcfg.accum_iter,
        )
        gnorm = global_norm(grads)
        new_state = state.apply_gradients(grads, new_model_state)
        metrics = dict(losses)
        metrics.update(
            loss=loss, grad_norm=gnorm, lr=schedule(state.step),
        )
        if tcfg.watch_gradients:
            # wandb.watch equivalent (main_pretrain.py:537): per-subtree
            # gradient norms, in-graph (see TrainConfig.watch_gradients).
            for name, sub in grads.items():
                metrics[f"gnorm/{name}"] = global_norm(sub)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
