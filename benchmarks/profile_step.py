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
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_flagship(trace_dir: str, steps: int, batch_per_chip: int,
                   attention: str, scan_blocks: bool) -> float:
    import jax
    import jax.numpy as jnp

    # The flagship configuration comes from bench._setup so the profiler
    # measures EXACTLY the program bench.py benchmarks (no drift).
    import bench
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
    from cross_scale_mae_tpu.parallel import batch_sharding
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg, tcfg, schedule, mesh, state, imgs, batch, _ = bench._setup(
        scan_blocks=scan_blocks, attention_impl=attention
    )
    if batch_per_chip and batch_per_chip != batch:
        # explicit --batch override: rebuild the raw input only
        import numpy as np

        batch = batch_per_chip * jax.device_count()
        imgs = np.random.default_rng(0).integers(
            0, 256, (batch, cfg.input_size, cfg.input_size, 3), np.uint8
        )
    augment = make_pretrain_augment(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype
    )
    step = make_pretrain_step(cfg, tcfg, schedule, donate=True, augment=augment)
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
    # Record the step count next to the trace so --analyze_only divides by
    # what was actually traced, not whatever --steps defaults to later.
    with open(os.path.join(trace_dir, "steps.json"), "w") as f:
        json.dump({"steps": steps, "ms_per_step": dt / steps * 1e3}, f)
    print(f"traced {steps} steps, {dt / steps * 1e3:.1f} ms/step, "
          f"loss={loss:.4f}", file=sys.stderr)
    return dt / steps


def analyze(trace_dir: str, steps: int) -> list[dict]:
    """Parse the xplane proto into per-HLO-category self times (ms/step)."""
    sidecar = os.path.join(trace_dir, "steps.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            steps = json.load(f)["steps"]
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
