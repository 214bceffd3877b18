"""Benchmark harness: flagship pretrain throughput on the real chip.

Measures imgs/sec/chip for the BASELINE.json headline config — full
Cross-Scale MAE (MsLdCeCd: dual-scale views + cross-decoder predictor +
NT-Xent) on ViT-B/16 at 128 px, mask ratio 0.75, bf16, with the entire
augmentation + two-view forward + losses + backward + AdamW fused into one
XLA program, fed raw uint8 (the production input path).

Prints ONE json line with the headline number plus BOTH baselines:

* ``baseline_estimated`` — the repo publishes no numbers (SURVEY.md §6), so
  this is derived from public MAE-torch measurements: facebook MAE ViT-B/16
  @224px trains at ~340 imgs/s per A100; at 128px (65 vs 197 tokens) the
  encoder/decoder cost drops ~2.5x -> ~850; the dual-scale second view
  halves it -> ~425; the predictor + NT-Xent terms cost ~10% -> ~380
  imgs/sec/chip for the reference config on its native stack.
  ``vs_baseline`` keeps this denominator (it is the BASELINE.json target:
  >=3x the *PyTorch-DDP* number).
* ``baseline_measured_proxy`` — a reference-semantics mode measured on this
  same chip: the reference's program structure with the de-optimizations
  SURVEY.md §3 lists — batch-shared crop (MAE_ViT_MsLd.py:29-35),
  augmentation as a separate dispatch from the train step (CPU transform
  chain, util/datasets.py:123-138), three host syncs per step
  (loss.item() / cuda.synchronize() / eager metric all-reduce,
  engine_pretrain.py:55,72,79), and no buffer donation. NOTE this proxy
  still benefits from XLA fusing each dispatch internally, so it is an
  UPPER bound on the reference's achievable throughput here and
  ``vs_ref_proxy`` a LOWER bound on the structural speedup.
"""

from __future__ import annotations

import json
import time

BASELINE_REF_IMGS_PER_SEC_PER_CHIP = 380.0


def _setup(scan_blocks=False, attention_impl="pallas_v3", batch_crop=False,
           batch_per_chip=None, gelu="tanh", adam_mu_dtype=None,
           adam_nu_dtype=None):
    import jax
    import numpy as np

    from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.parallel import make_mesh, shard_train_state
    from cross_scale_mae_tpu.train import (
        TrainState,
        build_optimizer,
        warmup_half_cosine,
    )

    n_chips = jax.device_count()
    cfg = get_mae_config(
        "mae_vit_base_MsLdCeCd", input_size=128, patch_size=16,
        mask_ratio=0.75, compute_dtype="bfloat16",
        # Fastest measured plan (benchmarks/sweep.py): unrolled layer loop
        # (kills scan residual-stacking copies; round 1, 1222 -> 1522) +
        # the v3 natural-layout Pallas attention (consumes the qkv matmul
        # output directly; kills the head fold/unfold HBM transposes;
        # round 2, 1520 -> 1945 @ b128, 2004 @ b256) + tanh GELU (exact-erf
        # GELU cost ~18.6 ms/step in fp32 erfc + sign-predicate bit-packing;
        # round 2, 1978 -> ~2320; gelu='exact' measured separately as
        # value_exact_gelu — strict reference/timm numerics) + the 24 MB
        # scoped-VMEM limit set at package import (decoder attention bwd
        # G=16; ~2320 -> ~2380; benchmarks/profile_step.py evidence).
        scan_blocks=scan_blocks, attention_impl=attention_impl,
        ms_per_sample_crop=not batch_crop, gelu=gelu,
    )
    if batch_per_chip is None:
        # Round-3 batch sweep (b256 2378 / b384 2410-2430 / b512 2399):
        # 384 is the measured knee — larger batches stop paying once the
        # fixed per-step overheads (pallas dispatch, AdamW, formatting)
        # are amortized, and b512's extra activation pressure costs more
        # than it buys.
        batch_per_chip = 384 if attention_impl == "pallas_v3" else 128
    batch = batch_per_chip * n_chips
    tcfg = TrainConfig(epochs=400, warmup_epochs=40, batch_size=batch, blr=5e-5)
    mesh = make_mesh(model_parallel=1)
    schedule = warmup_half_cosine(tcfg.resolved_lr(batch), 0.0, 40, 400, 1000)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, schedule, weight_decay=0.05,
                         mu_dtype=adam_mu_dtype, nu_dtype=adam_nu_dtype)
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(mesh, state, tensor_parallel=False)
    imgs = np.random.default_rng(0).integers(
        0, 256, (batch, 128, 128, 3), np.uint8
    )
    return cfg, tcfg, schedule, mesh, state, imgs, batch, n_chips


def run_fused(n_steps: int = 10, batch_per_chip: int | None = None,
              gelu: str = "tanh", adam_mu_dtype: str | None = None,
              adam_nu_dtype: str | None = None) -> float:
    """Production path: everything in one donated XLA program.

    ``gelu='exact'`` measures strict reference numerics (torch nn.GELU /
    timm Block, MAE_ViT_Baseline.py:160-188); 'tanh' is the TPU-fast
    default the headline uses. ``adam_mu_dtype``/``adam_nu_dtype`` store
    Adam moments in bf16 (optimizer-pass HBM experiment, VALIDATION §5)."""
    import jax
    import jax.numpy as jnp

    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import batch_sharding
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg, tcfg, schedule, mesh, state, imgs, batch, n_chips = _setup(
        batch_per_chip=batch_per_chip, gelu=gelu,
        adam_mu_dtype=adam_mu_dtype, adam_nu_dtype=adam_nu_dtype,
    )
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype
    )
    step = make_pretrain_step(cfg, tcfg, schedule, donate=True, augment=augment)
    batch_dev = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    rng = jax.random.key(1)

    # Warmup (compile + 2 steady steps). Sync via a host value fetch —
    # device-to-host readback is the only reliable barrier on the
    # experimental axon platform (block_until_ready returns early there).
    for _ in range(3):
        state, metrics = step(state, batch_dev, rng)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch_dev, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * n_steps / dt / n_chips


def run_goodput(n_steps: int = 20, batch_per_chip: int | None = None,
                workdir: str = "/tmp/csmae_goodput",
                adam_mu_dtype: str | None = None,
                adam_nu_dtype: str | None = None) -> dict:
    """End-to-end GOODPUT: disk JPEGs -> loader decode (native C++ core when
    built) -> device prefetch -> fused train step, sustained imgs/s/chip.

    The device-only headline feeds a resident uint8 batch; real training
    pays host decode too (the reference's #2 hot loop — CPU dataloader
    workers, util/datasets.py:123-138). This leg measures the whole
    pipeline at the flagship batch on THIS host, so the record carries the
    host-core count: on a 1-core host the decode bound dominates and the
    number reads as the host's ceiling, not the chip's (VALIDATION §2b).
    """
    import importlib.util
    import os

    import jax

    from cross_scale_mae_tpu.data.datasets import FmowRgbDataset
    from cross_scale_mae_tpu.data.loader import DataLoader, device_prefetch
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import batch_sharding
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    spec = importlib.util.spec_from_file_location(
        "bench_loader",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchmarks", "bench_loader.py"),
    )
    bench_loader = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_loader)

    cfg, tcfg, schedule, mesh, state, _imgs, batch, n_chips = _setup(
        batch_per_chip=batch_per_chip,
        # Follow the headline leg's optimizer dtypes: this leg's numbers
        # merge into the same record, so its conditions must match what the
        # record states.
        adam_mu_dtype=adam_mu_dtype, adam_nu_dtype=adam_nu_dtype,
    )
    csv = bench_loader.make_corpus(os.path.join(workdir, "data"), 4096)
    ds = FmowRgbDataset(csv, canvas_size=128)
    augment = make_pretrain_augment(
        ds.mean, ds.std, cfg.input_size, dtype=cfg.compute_dtype
    )
    step = make_pretrain_step(cfg, tcfg, schedule, donate=True, augment=augment)
    sharding = batch_sharding(mesh)
    rng = jax.random.key(1)
    threads = max(2, os.cpu_count() or 2)
    loader = DataLoader(ds, batch, num_threads=threads)

    def stream():
        ep = 0
        while True:
            yield from device_prefetch(loader.epoch(ep), sharding)
            ep += 1

    it = stream()
    for _ in range(3):  # compile + 2 steady steps + page-cache warm
        imgs_b, _lab = next(it)
        state, metrics = step(state, imgs_b, rng)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(n_steps):
        imgs_b, _lab = next(it)
        state, metrics = step(state, imgs_b, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return {
        "goodput_imgs_per_sec_per_chip": round(batch * n_steps / dt / n_chips, 2),
        "goodput_host_cores": os.cpu_count(),
        "goodput_native_loader": loader._native is not None,
    }


def run_ref_proxy(n_steps: int = 10, batch_per_chip: int | None = None) -> float:
    """Reference-semantics mode, measured (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import batch_sharding
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    # Reference crop semantics: ONE shared RandomResizedCrop box per batch
    # (MAE_ViT_MsLd.py:29-35 applies torchvision's module to the batch).
    cfg, tcfg, schedule, mesh, state, imgs, batch, n_chips = _setup(
        batch_crop=True, batch_per_chip=batch_per_chip
    )
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype
    )
    # De-optimization 1: augmentation is a SEPARATE dispatch from the train
    # step (the reference's transform chain runs outside the autograd graph).
    aug_fn = jax.jit(augment)
    # De-optimization 2: no donation (torch reallocates).
    step = make_pretrain_step(cfg, tcfg, schedule, donate=False, augment=None)
    batch_dev = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    rng = jax.random.key(1)

    def one_step(state, i):
        k = jax.random.fold_in(rng, i)
        views = aug_fn(k, batch_dev)
        state, metrics = step(state, views, k)
        # De-optimization 3: three host syncs per step, engine_pretrain.py:
        # loss.item() (:55), cuda.synchronize() (:72), metric all-reduce
        # fetch (:79).
        float(metrics["loss"])
        float(metrics["grad_norm"])
        float(metrics["lr"])
        return state, metrics

    for i in range(3):
        state, metrics = one_step(state, i)

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = one_step(state, 100 + i)
    dt = time.perf_counter() - t0
    return batch * n_steps / dt / n_chips


def _headline(per_chip: float) -> dict:
    """Headline record: throughput + vs_baseline + analytic MFU."""
    result = {
        "metric": "pretrain_imgs_per_sec_per_chip_vitb_msldcecd_128px",
        "value": round(per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_REF_IMGS_PER_SEC_PER_CHIP, 3),
        "baseline_estimated": BASELINE_REF_IMGS_PER_SEC_PER_CHIP,
    }
    try:
        import jax

        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.utils.flops import (
            mae_train_flops_per_image, mfu,
        )

        cfg = get_mae_config("mae_vit_base_MsLdCeCd", input_size=128,
                             patch_size=16, mask_ratio=0.75)
        flops = mae_train_flops_per_image(cfg)
        kind = jax.devices()[0].device_kind
        util = mfu(per_chip, flops, kind)
        result["train_flops_per_image"] = round(flops)
        if util is not None:
            result["mfu"] = round(util, 4)
            result["device_kind"] = kind
    except Exception:  # MFU is informational; never lose the record over it
        pass
    return result


def main():
    import argparse
    import sys

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--skip_proxy", action="store_true",
                   help="headline number only (faster; proxy recompiles)")
    p.add_argument("--skip_exact", action="store_true",
                   help="skip the strict-parity exact-GELU measurement")
    p.add_argument("--skip_goodput", action="store_true",
                   help="skip the disk->decode->step goodput measurement")
    p.add_argument("--batch_per_chip", type=int, default=None,
                   help="override the per-chip batch (default 384, the "
                        "measured knee; floors in benchmarks/expected.json "
                        "are recorded at that default)")
    p.add_argument("--adam_mu_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="moment-dtype experiment on the headline leg "
                        "(VALIDATION §5); record carries the setting")
    p.add_argument("--adam_nu_dtype", default=None,
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    per_chip = run_fused(args.steps, args.batch_per_chip,
                         adam_mu_dtype=args.adam_mu_dtype,
                         adam_nu_dtype=args.adam_nu_dtype)
    result = _headline(per_chip)
    if args.adam_mu_dtype or args.adam_nu_dtype:
        result["adam_mu_dtype"] = args.adam_mu_dtype or "float32"
        result["adam_nu_dtype"] = args.adam_nu_dtype or "float32"
    # Crash-safety (round-3 lesson, VERDICT r3 §weak-1): the round-3 driver
    # record was LOST because a transient axon FailedPrecondition in the
    # proxy leg crashed the process after the headline was already measured.
    # Print+flush the headline record FIRST so it exists no matter what the
    # later legs do; each later leg gets one retry on any exception, and a
    # failure downgrades gracefully to the record built so far. The last
    # stdout line is always the fullest valid record.
    print(json.dumps(result), flush=True)

    def attempt(name, fn):
        for i in (1, 2):
            try:
                return fn()
            except Exception as e:
                print(f"{name} leg attempt {i} failed: {e!r}",
                      file=sys.stderr, flush=True)
        return None

    if not args.skip_exact:
        # Strict-parity numerics (VERDICT r4 §next-2): the reference/timm
        # GELU is exact-erf (MAE_ViT_Baseline.py:160-188 timm Block); the
        # headline's tanh approximation is a deliberate TPU numerics
        # deviation. Record BOTH so "matching-or-beating" survives exact
        # numerics.
        exact = attempt("exact-gelu", lambda: run_fused(
            args.steps, args.batch_per_chip, gelu="exact",
            adam_mu_dtype=args.adam_mu_dtype,
            adam_nu_dtype=args.adam_nu_dtype,
        ))
        if exact is not None:
            result["value_exact_gelu"] = round(exact, 2)
            result["vs_baseline_exact"] = round(
                exact / BASELINE_REF_IMGS_PER_SEC_PER_CHIP, 3
            )
            if "mfu" in result:
                result["mfu_exact"] = round(
                    result["mfu"] * exact / per_chip, 4
                )
            print(json.dumps(result), flush=True)
        # Best strict-FORWARD-parity number: gelu='exact_tanhbwd' keeps the
        # forward bit-identical to torch nn.GELU (exhaustively verified over
        # all bf16 patterns) and swaps only the backward for the tanh-GELU
        # derivative (within one bf16 ulp of the exact backward) — +7.3%
        # over 'exact' (round 5, benchmarks/gelu_modes.py, VALIDATION 5b).
        fastbwd = attempt("exact-tanhbwd", lambda: run_fused(
            args.steps, args.batch_per_chip, gelu="exact_tanhbwd",
            adam_mu_dtype=args.adam_mu_dtype,
            adam_nu_dtype=args.adam_nu_dtype,
        ))
        if fastbwd is not None:
            result["value_exact_tanhbwd"] = round(fastbwd, 2)
            if "mfu" in result:
                result["mfu_exact_tanhbwd"] = round(
                    result["mfu"] * fastbwd / per_chip, 4
                )
            print(json.dumps(result), flush=True)

    if not args.skip_goodput:
        good = attempt("goodput", lambda: run_goodput(
            max(args.steps, 20), args.batch_per_chip,
            adam_mu_dtype=args.adam_mu_dtype,
            adam_nu_dtype=args.adam_nu_dtype,
        ))
        if good is not None:
            result.update(good)
            print(json.dumps(result), flush=True)

    if not args.skip_proxy:
        proxy = attempt("proxy", lambda: run_ref_proxy(args.steps))
        if proxy is not None:
            result["baseline_measured_proxy"] = round(proxy, 2)
            result["vs_ref_proxy"] = round(per_chip / proxy, 3)
            print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
