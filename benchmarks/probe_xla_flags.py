"""XLA/libtpu compiler-flag sweep on the flagship step (round 3).

Question: after the kernel/VMEM/batch spaces were exhausted (ROADMAP.md
dead-ends), is there throughput hiding behind XLA's own tuning flags?
Every flag below is a public libtpu/XLA knob that plausibly affects a
matmul-bound single-chip program (fusion cost models, dot-dot fusion,
reduce+broadcast fusion, latency-hiding scheduler).

Method: same harness as probe_vmem_sweep.py — libtpu snapshots
LIBTPU_INIT_ARGS at first backend init, so each flag set runs in a FRESH
subprocess (package init appends the shipped 24 MB scoped-VMEM flag
itself); the child runs bench.run_fused (real flagship step, b384) and
prints one JSON line. An unknown-flag error is a *result* (libtpu rejects
it loudly), not a harness crash.

Usage: python benchmarks/probe_xla_flags.py [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> extra LIBTPU_INIT_ARGS (appended after the package's VMEM flag).
POINTS: dict[str, str] = {
    "control": "",
    "lhs_off": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "rwb_fusion_off": "--xla_tpu_rwb_fusion=false",
    "dot_dot_fusion_off": "--xla_tpu_dot_dot_fusion=false",
    "exp_fusion_cost": "--xla_tpu_enable_experimental_fusion_cost_model=true",
    "bundle_cost": "--xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    "scavenge_vmem": "--xla_tpu_scavenge_vmem_for_fusions=true",
    "async_dma_scale": "--xla_tpu_async_copy_bandwidth_scaling_factor=1.5",
}


def child(steps: int) -> None:
    sys.path.insert(0, REPO)
    import bench

    try:
        imgs = bench.run_fused(n_steps=steps)
        print(json.dumps({"ok": True, "imgs_per_sec": round(imgs, 1)}))
    except Exception as e:  # flag rejected / compile failure is a result
        print(json.dumps({"ok": False,
                          "error": f"{type(e).__name__}: {e}"[:300]}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--child", action="store_true")
    p.add_argument("--only", default=None, help="comma-separated point names")
    args = p.parse_args()

    if args.child:
        child(args.steps)
        return

    names = list(POINTS) if not args.only else args.only.split(",")
    for name in names:
        extra = POINTS[name]
        env = dict(os.environ)
        env.pop("LIBTPU_INIT_ARGS", None)
        if extra:
            env["LIBTPU_INIT_ARGS"] = extra
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--steps", str(args.steps)],
                env=env, cwd=REPO, capture_output=True, text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT (>900 s)", flush=True)
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        print(f"{name} [{extra or 'shipped flags only'}]: "
              f"{line or out.stderr.strip().splitlines()[-1:]}", flush=True)


if __name__ == "__main__":
    main()
