"""Component ablation timing for the flagship pretrain step.

Times progressively smaller pieces of the step to locate the cost:
full step / fwd+bwd only / forward only / encoder only / augment only /
optimizer only. One process, one json line each.

Run: python benchmarks/ablate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, sync, n=20, warm=3):
    for _ in range(warm):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import (
        mae_forward_decoder,
        mae_forward_encoder,
        mae_loss_fn,
    )
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.train import TrainState, build_optimizer, warmup_half_cosine
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg = get_mae_config(
        "mae_vit_base_MsLdCeCd", input_size=128, patch_size=16, mask_ratio=0.75
    )
    B = 128
    tcfg = TrainConfig(epochs=400, warmup_epochs=40, batch_size=B, blr=5e-5)
    schedule = warmup_half_cosine(1e-4, 0.0, 40, 400, 1000)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, schedule, weight_decay=0.05)
    state = TrainState.create(params, mstate, tx)
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, 128, dtype=cfg.compute_dtype
    )
    rng = jax.random.key(1)
    u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (B, 128, 128, 3), np.uint8)
    )
    imgs = augment(rng, u8)
    sync = lambda out: float(jax.tree.leaves(out)[0].ravel()[0])

    results = {}

    # full step (augment included)
    step = make_pretrain_step(cfg, tcfg, schedule, donate=False, augment=augment)
    results["full_step"] = timed(
        lambda: step(state, u8, rng)[1]["loss"], lambda o: float(o)
    )

    # fwd+bwd (no optimizer)
    @jax.jit
    def fwd_bwd(params, mstate, imgs, rng):
        def loss(p):
            return mae_loss_fn(p, mstate, cfg, imgs, rng, train=True).loss

        return jax.grad(loss)(params)

    results["fwd_bwd"] = timed(
        lambda: fwd_bwd(state.params, mstate, imgs, rng), sync
    )

    # forward only (loss value)
    @jax.jit
    def fwd(params, mstate, imgs, rng):
        return mae_loss_fn(params, mstate, cfg, imgs, rng, train=True).loss

    results["forward"] = timed(
        lambda: fwd(state.params, mstate, imgs, rng), lambda o: float(o)
    )

    # encoder only, two views (2B batch, masked)
    both = jnp.concatenate([imgs, imgs], axis=0)

    @jax.jit
    def enc_only(params, both, rng):
        enc, mask, ids = mae_forward_encoder(params, cfg, both, rng=rng)
        return enc.sum()

    results["encoder_2views"] = timed(
        lambda: enc_only(state.params, both, rng), lambda o: float(o)
    )

    # encoder+decoder, two views
    @jax.jit
    def encdec(params, both, rng):
        enc, mask, ids = mae_forward_encoder(params, cfg, both, rng=rng)
        pred, dec = mae_forward_decoder(params, cfg, enc, ids)
        return pred.sum()

    results["encdec_2views"] = timed(
        lambda: encdec(state.params, both, rng), lambda o: float(o)
    )

    # augment only
    aug_j = jax.jit(lambda rng, u8: augment(rng, u8))
    results["augment"] = timed(
        lambda: aug_j(rng, u8), lambda o: float(o.ravel()[0])
    )

    # optimizer only (apply fixed grads)
    grads = fwd_bwd(state.params, mstate, imgs, rng)

    @jax.jit
    def opt_only(state, grads):
        return state.apply_gradients(grads)

    results["optimizer"] = timed(
        lambda: opt_only(state, grads).params["cls_token"],
        lambda o: float(o.ravel()[0]),
    )

    for k, v in results.items():
        print(json.dumps({"component": k, "ms": round(v * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()
