"""Scoped-VMEM / attention-group sweep (round 3).

Question: the package init raises the TPU scoped-VMEM limit to 24 MB, which
admits decoder-attention bwd at batch-group 16 (+3% flagship). Does raising
it FURTHER (40/64 MB) — admitting G=32/G=64 fwd+bwd blocks — buy more, or
does starving XLA's own fusion scratch cost more than the bigger Pallas
blocks gain?

Method: libtpu snapshots LIBTPU_INIT_ARGS at first backend init, so every
(limit, budget, cap) point runs in a FRESH subprocess that
  1. sets LIBTPU_INIT_ARGS before importing anything,
  2. monkeypatches ops.attention._group3_for with the probe budget/cap,
  3. runs bench.run_fused (the real flagship step, b384) and prints one JSON
     line with the achieved imgs/s and the groups actually chosen.

Usage: python benchmarks/probe_vmem_sweep.py            # full sweep
       python benchmarks/probe_vmem_sweep.py --steps 20 # longer timing
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (limit_kib, budget_mb, group_cap) — budget leaves the same ~9 MB headroom
# for kernel stack + S(1) operands that the shipped 24 MB/15 MB pair does.
#
# MEASURED (v5e, 20 steps, b384, 2026-08-17; control re-run per sweep —
# run-to-run noise ~1.5%):
#   (24576, 15, 32) shipped — dec fwd/bwd G=16, enc G=32:  2418 / 2454 imgs/s
#   (32768, 23, 32) dec fwd G=32, bwd G=16:                2366   (-3.6%)
#   (40960, 31, 32) dec fwd+bwd G=32:                      2324   (-3.9%)
#   (40960, 31, 64) enc bwd G=64:            compiler hang (>900 s, killed)
# CONCLUSION: the shipped 24 MB limit is the knee. Raising it admits bigger
# Pallas blocks but starves XLA's own fusion scratch for the matmul-heavy
# rest of the program — a net loss even when only the decoder FORWARD group
# doubles. G=64 blocks hang Mosaic. Recorded as a dead end in ROADMAP.md;
# don't retry without new evidence.
POINTS = [
    (24576, 15, 32),   # shipped config (control)
    (32768, 23, 32),   # decoder fwd -> G=32, bwd stays 16
    (40960, 31, 32),   # decoder fwd+bwd -> G=32
]


def child(budget_mb: int, cap: int, steps: int) -> None:
    sys.path.insert(0, REPO)
    import cross_scale_mae_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS path)
    from cross_scale_mae_tpu.ops import attention as A

    chosen = {}
    orig = A._group3_for

    def patched(n, l, three_d, itemsize, bwd):
        d = three_d // 3
        per_item = (3 * d + d + (3 * d if bwd else 0)) * itemsize * l
        group = cap
        while group > 1 and (n % group or 2 * group * per_item
                             > budget_mb * 2 ** 20):
            group //= 2
        chosen[f"l{l}_d{d}_{'bwd' if bwd else 'fwd'}"] = group
        return group

    A._group3_for = patched
    import bench

    try:
        imgs = bench.run_fused(n_steps=steps)
        print(json.dumps({"ok": True, "imgs_per_sec": round(imgs, 1),
                          "groups": chosen}))
    except Exception as e:  # compile OOM etc. is a *result*, not a crash
        print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"
                          [:300], "groups": chosen}))
    finally:
        A._group3_for = orig


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--child", action="store_true")
    p.add_argument("--budget_mb", type=int)
    p.add_argument("--cap", type=int)
    args = p.parse_args()

    if args.child:
        child(args.budget_mb, args.cap, args.steps)
        return

    for limit, budget, cap in POINTS:
        env = dict(os.environ)
        env["LIBTPU_INIT_ARGS"] = f"--xla_tpu_scoped_vmem_limit_kib={limit}"
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--budget_mb", str(budget), "--cap", str(cap),
                 "--steps", str(args.steps)],
                env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"limit={limit} budget={budget} cap={cap}: "
                  f"TIMEOUT (>900 s — compiler hang)", flush=True)
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        print(f"limit={limit} budget={budget} cap={cap}: "
              f"{line or out.stderr.strip().splitlines()[-1:]}", flush=True)


if __name__ == "__main__":
    main()
