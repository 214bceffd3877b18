"""imgs/sec/chip for ALL FIVE BASELINE.json configs on the real chip.

BASELINE.md: "the first benchmarking milestone is to establish imgs/sec/chip
for the five BASELINE.json configs". bench.py covers config #3 (the
flagship full MsLdCeCd) with baseline comparisons; this harness measures
the other four too and prints one json line per config (plus a markdown
table on stderr for docs/VALIDATION.md).

Configs (BASELINE.json "configs"):
  1. baseline_224   MAE_ViT_Baseline ViT-B/16 @224 single-scale pretrain
  2. msld_128       MAE_ViT_MsLd dual-scale (ViT-B/16 @128)
  3. msldcecd_128   full Cross-Scale MAE (bench.py's flagship config)
  3b. +perceptual   same + VGG-perceptual term (random trunk; BASELINE.json
                    lists the perceptual loss in the full config)
  4. linprobe_128   LARS linear probe, frozen backbone, bs 1024 (linprobe.sh)
  5. finetune_vitl_64  ViT-L @64px/patch 8, layer-wise lr decay + mixup
                    (finetune.sh)

Run: python benchmarks/all_configs.py [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(metrics):
    return float(next(iter(metrics.values())) if isinstance(metrics, dict)
                 else metrics)


def _time_steps(step, state, args_fn, steps):
    import jax

    state, metrics = step(state, *args_fn())
    _sync(metrics)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, *args_fn())
    _sync(metrics)
    return (time.perf_counter() - t0) / steps


def bench_pretrain(name, model, input_size, patch, batch, steps, **cfg_kw):
    import jax
    import jax.numpy as jnp

    from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import (
        batch_sharding, make_mesh, shard_train_state,
    )
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg = get_mae_config(
        model, input_size=input_size, patch_size=patch, mask_ratio=0.75,
        compute_dtype="bfloat16", scan_blocks=False,
        attention_impl="pallas_v3", **cfg_kw,
    )
    tcfg = TrainConfig(epochs=400, warmup_epochs=40, batch_size=batch,
                       blr=5e-5)
    mesh = make_mesh(model_parallel=1)
    schedule = warmup_half_cosine(tcfg.resolved_lr(batch), 0.0, 40, 400, 1000)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, schedule, weight_decay=0.05)
    state = shard_train_state(
        mesh, TrainState.create(params, mstate, tx), tensor_parallel=False
    )
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype
    )
    step = make_pretrain_step(cfg, tcfg, schedule, donate=True,
                              augment=augment)
    imgs = np.random.default_rng(0).integers(
        0, 256, (batch, input_size, input_size, 3), np.uint8
    )
    batch_dev = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    rng = jax.random.key(1)
    dt = _time_steps(step, state, lambda: (batch_dev, rng), steps)
    return dict(config=name, imgs_per_sec_per_chip=round(batch / dt, 1),
                ms_per_step=round(dt * 1e3, 2), batch_per_chip=batch)


def bench_classify(name, model, input_size, patch, batch, steps,
                   linprobe=False, **kw):
    import jax
    import jax.numpy as jnp

    from cross_scale_mae_tpu.configs import TrainConfig, get_vit_config
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import vit_init
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import (
        batch_sharding, make_mesh, shard_train_state,
    )
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.classify import make_classify_train_step

    vcfg = get_vit_config(
        model, input_size=input_size, patch_size=patch, num_classes=62,
        global_pool=True, compute_dtype="bfloat16", scan_blocks=False,
        attention_impl="pallas_v3", use_bn_head=linprobe, **kw,
    )
    tcfg = TrainConfig(
        epochs=100, warmup_epochs=5, batch_size=batch,
        blr=0.1 if linprobe else 1e-3,
        mixup=0.0 if linprobe else 0.8, cutmix=0.0 if linprobe else 1.0,
        label_smoothing=0.0 if linprobe else 0.1,
    )
    mesh = make_mesh(model_parallel=1)
    schedule = warmup_half_cosine(tcfg.resolved_lr(batch), 0.0, 5, 100, 1000)
    params, mstate = vit_init(jax.random.key(0), vcfg)
    if linprobe:
        trainable = jax.tree_util.tree_map_with_path(
            lambda path, leaf: str(getattr(path[0], "key", "")) == "head",
            params,
        )
        tx = build_optimizer(params, schedule, optimizer="lars",
                             weight_decay=0.0, frozen_mask=trainable)
    else:
        tx = build_optimizer(params, schedule, weight_decay=0.05,
                             layer_decay=0.75, depth=vcfg.depth)
    state = shard_train_state(
        mesh, TrainState.create(params, mstate, tx), tensor_parallel=False
    )
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, input_size, dtype="bfloat16"
    )
    step = make_classify_train_step(vcfg, tcfg, schedule, augment=augment,
                                    freeze_backbone=linprobe)
    rng_np = np.random.default_rng(0)
    imgs = rng_np.integers(0, 256, (batch, input_size, input_size, 3),
                           np.uint8)
    labels = rng_np.integers(0, 62, (batch,), np.int32)
    sh = batch_sharding(mesh)
    batch_dev = jax.device_put(jnp.asarray(imgs), sh)
    labels_dev = jax.device_put(jnp.asarray(labels), sh)
    rng = jax.random.key(1)
    dt = _time_steps(step, state, lambda: (batch_dev, labels_dev, rng), steps)
    return dict(config=name, imgs_per_sec_per_chip=round(batch / dt, 1),
                ms_per_step=round(dt * 1e3, 2), batch_per_chip=batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    rows = []
    runs = [
        lambda: bench_pretrain("baseline_vitb16_224px", "mae_vit_base",
                               224, 16, 64, args.steps),
        lambda: bench_pretrain("msld_vitb16_128px", "mae_vit_base_MsLd",
                               128, 16, 256, args.steps),
        lambda: bench_pretrain("msldcecd_vitb16_128px",
                               "mae_vit_base_MsLdCeCd", 128, 16, 256,
                               args.steps),
        lambda: bench_pretrain("msldcecd_perceptual_vitb16_128px",
                               "mae_vit_base_MsLdCeCd", 128, 16, 256,
                               args.steps, use_perceptual=True),
        lambda: bench_pretrain("msldcecd_vitl16_128px",
                               "mae_vit_large_MsLdCeCd", 128, 16, 256,
                               args.steps),
        lambda: bench_pretrain("msldcecd_vith16_128px",
                               "mae_vit_huge_MsLdCeCd", 128, 16, 128,
                               args.steps),
        lambda: bench_classify("linprobe_vitb16_128px_lars",
                               "vit_base_patch16", 128, 16, 1024,
                               args.steps, linprobe=True),
        lambda: bench_classify("finetune_vitl16_64px_layerdecay",
                               "vit_large_patch16", 64, 8, 256, args.steps),
    ]
    for run in runs:
        try:
            row = run()
        except Exception as e:  # keep measuring the rest
            row = dict(config="<failed>", error=str(e)[:200])
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| config | imgs/s/chip | ms/step | batch/chip |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"| {r['config']} | ERROR | | |", file=sys.stderr)
        else:
            print(f"| {r['config']} | {r['imgs_per_sec_per_chip']} | "
                  f"{r['ms_per_step']} | {r['batch_per_chip']} |",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
