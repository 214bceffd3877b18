"""Benchmark harness: flagship pretrain throughput on the real chip.

Measures imgs/sec/chip for the BASELINE.json headline config — full
Cross-Scale MAE (MsLdCeCd: dual-scale views + cross-decoder predictor +
NT-Xent) on ViT-B/16 at 128 px, mask ratio 0.75, bf16, with the entire
augmentation + two-view forward + losses + backward + AdamW fused into one
XLA program, fed raw uint8 (the production input path).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against an *estimated* reference throughput — the
repo publishes no numbers (SURVEY.md §6), so the denominator is derived from
public MAE-torch measurements: facebook MAE ViT-B/16 @224px trains at ~340
imgs/s per A100; at 128px (65 vs 197 tokens) the encoder/decoder cost drops
~2.5x -> ~850; the dual-scale second view halves it -> ~425; the predictor +
NT-Xent terms cost ~10% -> ~380 imgs/sec/chip estimated for the reference
config on its native stack. Target from BASELINE.json: >=3x.
"""

from __future__ import annotations

import json
import time

BASELINE_REF_IMGS_PER_SEC_PER_CHIP = 380.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import batch_sharding, make_mesh, shard_train_state
    from cross_scale_mae_tpu.train import TrainState, build_optimizer, warmup_half_cosine
    from cross_scale_mae_tpu.utils.logging import rank0_print

    n_chips = jax.device_count()
    cfg = get_mae_config(
        "mae_vit_base_MsLdCeCd", input_size=128, patch_size=16,
        mask_ratio=0.75, compute_dtype="bfloat16",
        # Fastest measured plan (benchmarks/sweep.py, round 1): unrolled
        # layer loop (kills scan residual-stacking copies) + Pallas fused
        # attention with recompute backward. 1222 -> 1522 imgs/s/chip.
        scan_blocks=False, attention_impl="pallas",
    )
    batch_per_chip = 128
    batch = batch_per_chip * n_chips
    tcfg = TrainConfig(epochs=400, warmup_epochs=40, batch_size=batch, blr=5e-5)

    mesh = make_mesh(model_parallel=1)
    schedule = warmup_half_cosine(
        tcfg.resolved_lr(batch), 0.0, 40, 400, 1000
    )
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, schedule, weight_decay=0.05)
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(mesh, state, tensor_parallel=False)

    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype
    )
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    step = make_pretrain_step(cfg, tcfg, schedule, donate=True, augment=augment)

    rng_np = np.random.default_rng(0)
    imgs = rng_np.integers(0, 256, (batch, 128, 128, 3), np.uint8)
    data_sharding = batch_sharding(mesh)
    batch_dev = jax.device_put(jnp.asarray(imgs), data_sharding)
    rng = jax.random.key(1)

    # Warmup (compile + 2 steady steps). Sync via a host value fetch —
    # device-to-host readback is the only reliable barrier on the
    # experimental axon platform (block_until_ready returns early there).
    for _ in range(3):
        state, metrics = step(state, batch_dev, rng)
    float(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch_dev, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_steps / dt
    per_chip = imgs_per_sec / n_chips
    result = {
        "metric": "pretrain_imgs_per_sec_per_chip_vitb_msldcecd_128px",
        "value": round(per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_REF_IMGS_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
