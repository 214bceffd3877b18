"""Throughput sweep: find the fastest flagship-config execution plan.

Compiles several variants in one process (compile cache amortized) and
prints a json line per variant. Used to pick bench.py's configuration.

Run: python benchmarks/sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, cfg, batch_per_chip, n_steps=20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_scale_mae_tpu.configs import TrainConfig
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_train_state,
    )
    from cross_scale_mae_tpu.train import (
        TrainState,
        build_optimizer,
        warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    n_chips = jax.device_count()
    batch = batch_per_chip * n_chips
    tcfg = TrainConfig(epochs=400, warmup_epochs=40, batch_size=batch, blr=5e-5)
    mesh = make_mesh(model_parallel=1)
    schedule = warmup_half_cosine(tcfg.resolved_lr(batch), 0.0, 40, 400, 1000)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, schedule, weight_decay=0.05)
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(mesh, state, tensor_parallel=False)
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype
    )
    step = make_pretrain_step(cfg, tcfg, schedule, donate=True, augment=augment)

    imgs = np.random.default_rng(0).integers(
        0, 256, (batch, cfg.input_size, cfg.input_size, 3), np.uint8
    )
    batch_dev = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    rng = jax.random.key(1)

    try:
        t_c0 = time.perf_counter()
        for _ in range(3):
            state, metrics = step(state, batch_dev, rng)
        float(metrics["loss"])  # axon-safe barrier
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch_dev, rng)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
    except Exception as e:  # OOM etc.
        print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)
        return None
    per_chip = batch * n_steps / dt / n_chips
    out = {
        "variant": name,
        "imgs_per_sec_per_chip": round(per_chip, 1),
        "step_ms": round(1000 * dt / n_steps, 2),
        "batch_per_chip": batch_per_chip,
        "warm3_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    return per_chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--variants", default=None, nargs="+")
    args = ap.parse_args()

    from cross_scale_mae_tpu.configs import get_mae_config

    base = get_mae_config(
        "mae_vit_base_MsLdCeCd", input_size=128, patch_size=16, mask_ratio=0.75
    )
    variants = {
        "b128": (base, 128),
        "b128_steps40": (base, 128),   # dispatch-overhead check (n_steps=40)
        "b192": (base, 192),
        "b256_remat": (base.replace(remat=True), 256),
        "b128_pallas": (base.replace(attention_impl="pallas"), 128),
        "b128_f32aug": (base, 128),
        "b128_flat": (base.replace(flat_blocks=True), 128),
        "b128_flat_pallas": (base.replace(flat_blocks=True, attention_impl="pallas"), 128),
        "b128_unroll": (base.replace(scan_blocks=False), 128),
        "b128_unroll_pallas": (base.replace(scan_blocks=False, attention_impl="pallas"), 128),
        "b256_unroll_remat": (base.replace(scan_blocks=False, remat=True), 256),
        "b160_unroll_pallas": (base.replace(scan_blocks=False, attention_impl="pallas"), 160),
        "b192_unroll_pallas": (base.replace(scan_blocks=False, attention_impl="pallas"), 192),
        "b128_unroll_pallas_t": (base.replace(scan_blocks=False, attention_impl="pallas_t"), 128),
        "b128_unroll_pallas3": (base.replace(scan_blocks=False, attention_impl="pallas_v3"), 128),
        "b128_scan_pallas3": (base.replace(attention_impl="pallas_v3"), 128),
        "b192_unroll_pallas3": (base.replace(scan_blocks=False, attention_impl="pallas_v3"), 192),
        "b256_unroll_pallas3": (base.replace(scan_blocks=False, attention_impl="pallas_v3"), 256),
        "b384_unroll_pallas3": (base.replace(scan_blocks=False, attention_impl="pallas_v3"), 384),
        "b512_unroll_pallas3": (base.replace(scan_blocks=False, attention_impl="pallas_v3"), 512),
        # flat+v3 (round 5): the two fastest layouts combined — flat (N*L,D)
        # carry for LN/residual/MLP, natural-layout kernel for attention.
        # (No unroll twin: run_blocks_flat always lax.scans — scan_blocks
        # has no effect on the flat path, a second variant would re-measure
        # the identical program.) Measured: loses 29% at b64, compiler
        # crash at b384 — VALIDATION §2 negative results.
        "b384_flat_pallas3": (base.replace(flat_blocks=True, attention_impl="pallas_v3"), 384),
    }
    if args.variants:
        variants = {k: v for k, v in variants.items() if k in args.variants}
    if args.quick:
        variants = {k: variants[k] for k in list(variants)[:2]}
    for name, (cfg, bpc) in variants.items():
        n_steps = 40 if name.endswith("steps40") else 20
        run_variant(name, cfg, bpc, n_steps)


if __name__ == "__main__":
    main()
