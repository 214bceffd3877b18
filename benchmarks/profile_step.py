"""Op-level profile of the flagship pretrain step.

Traces N steps of the exact bench.py configuration with jax.profiler,
then parses the xplane proto (xprof/tensorboard-plugin-profile) into a
per-HLO-category self-time table — the round-1/2 optimization loop's
evidence source (ROADMAP #1: fusion/copy/transpose/convert split).

Run: python benchmarks/profile_step.py [--steps 10] [--batch 256]
     [--attention pallas_v3] [--scan]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_flagship(trace_dir: str, steps: int, batch_per_chip: int,
                   attention: str, scan_blocks: bool) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

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
        "mae_vit_base_MsLdCeCd", input_size=128, patch_size=16,
        mask_ratio=0.75, compute_dtype="bfloat16",
        scan_blocks=scan_blocks, attention_impl=attention,
    )
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

    # warmup / compile
    for _ in range(3):
        state, metrics = step(state, batch_dev, rng)
    float(metrics["loss"])  # sync

    import time
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_dev, rng)
    loss = float(metrics["loss"])  # sync before stopping the trace
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {steps} steps, {dt / steps * 1e3:.1f} ms/step, "
          f"loss={loss:.4f}", file=sys.stderr)
    return dt / steps


def analyze(trace_dir: str, steps: int) -> list[dict]:
    """Parse the xplane proto into per-HLO-category self times (ms/step)."""
    xplanes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # hlo_stats returns a gviz DataTable as plain JSON {cols, rows}
    table = json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    rows = [[c["v"] if c else None for c in r["c"]] for r in table["rows"]]
    icat = next(i for i, c in enumerate(cols) if "category" in c.lower())
    iself = next(i for i, c in enumerate(cols)
                 if "total self time (us)" in c.lower()
                 or c.lower() == "self time (us)")
    iname = next((i for i, c in enumerate(cols) if "hlo op name" in c.lower()
                  or "op name" in c.lower()), None)
    agg: dict[str, float] = {}
    top_ops: dict[str, float] = {}
    for r in rows:
        cat = str(r[icat])
        us = float(r[iself] or 0)
        agg[cat] = agg.get(cat, 0.0) + us
        if iname is not None:
            nm = str(r[iname])
            top_ops[nm] = top_ops.get(nm, 0.0) + us
    out = [
        {"category": k, "ms_per_step": round(v / 1e3 / steps, 2)}
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])
    ]
    print("\n== per-category self time (ms/step) ==")
    for row in out:
        print(f"  {row['category']:<30s} {row['ms_per_step']:>8.2f}")
    print("\n== top 25 ops (ms/step) ==")
    for nm, us in sorted(top_ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {nm[:90]:<90s} {us / 1e3 / steps:>8.2f}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--attention", default="pallas_v3")
    ap.add_argument("--scan", action="store_true")
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--analyze_only", default=None,
                    help="skip tracing; analyze this existing trace dir")
    args = ap.parse_args()
    if args.analyze_only:
        analyze(args.analyze_only, args.steps)
    else:
        td = args.trace_dir or tempfile.mkdtemp(prefix="csm_trace_")
        trace_flagship(td, args.steps, args.batch, args.attention, args.scan)
        analyze(td, args.steps)
