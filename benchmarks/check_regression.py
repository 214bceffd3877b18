"""Perf regression gate: fresh bench numbers vs benchmarks/expected.json.

Runs the flagship bench (and optionally the five-config table with
--all) and fails if any measured imgs/s/chip lands under its recorded
floor (~8% below the round-2 numbers on this hardware). Keeps future
rounds from silently losing the optimization work.

Run: python benchmarks/check_regression.py [--all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="also run the five-config table (slow)")
    ap.add_argument("--proxy", action="store_true",
                    help="also re-measure the reference-semantics proxy and "
                         "fail if it drifts outside proxy_band (the "
                         "vs_ref_proxy denominator)")
    args = ap.parse_args()

    with open(os.path.join(os.path.dirname(__file__), "expected.json")) as f:
        expected = json.load(f)
    floors = expected["floors"]

    # The floors were recorded on one specific setup; on any other chip
    # kind/count they are meaningless (ADVICE r2: the gate would false-fail
    # or pass with fake headroom). Skip cleanly instead. IMPORTANT: import
    # the package BEFORE touching jax.devices() — backend init freezes
    # LIBTPU_INIT_ARGS, and the package init must get its scoped-VMEM raise
    # in first or the gate measures a slower config than ships.
    import cross_scale_mae_tpu  # noqa: F401  (env mutation side effect)
    import jax

    kind, count = jax.devices()[0].device_kind, jax.device_count()
    want_kind = expected.get("device_kind")
    want_count = expected.get("device_count")
    if (want_kind is not None and want_count is not None
            and (kind != want_kind or count != want_count)):
        print(f"perf gate SKIP: hardware {kind!r} x{count} != recorded "
              f"{want_kind!r} x{want_count} (expected.json); floors not "
              f"comparable")
        return

    measured: dict[str, float] = {}
    import bench

    measured["pretrain_imgs_per_sec_per_chip_vitb_msldcecd_128px"] = (
        bench.run_fused()
    )
    if args.all:
        # Strict reference-parity numerics (exact-erf GELU) — the second
        # headline number BENCH records carry from round 5 on.
        measured["pretrain_exact_gelu_vitb_msldcecd_128px"] = bench.run_fused(
            gelu="exact"
        )
        # Strict FORWARD parity + tanh-derivative backward (round 5,
        # benchmarks/gelu_modes.py): the fastest bit-exact-forward mode.
        measured["pretrain_exact_tanhbwd_vitb_msldcecd_128px"] = (
            bench.run_fused(gelu="exact_tanhbwd")
        )
        from all_configs import bench_classify, bench_pretrain

        measured["baseline_vitb16_224px"] = bench_pretrain(
            "baseline_vitb16_224px", "mae_vit_base", 224, 16, 64, 10
        )["imgs_per_sec_per_chip"]
        measured["msld_vitb16_128px"] = bench_pretrain(
            "msld_vitb16_128px", "mae_vit_base_MsLd", 128, 16, 256, 10
        )["imgs_per_sec_per_chip"]
        measured["msldcecd_vitl16_128px"] = bench_pretrain(
            "msldcecd_vitl16_128px", "mae_vit_large_MsLdCeCd", 128, 16, 256,
            10
        )["imgs_per_sec_per_chip"]
        measured["msldcecd_vith16_128px"] = bench_pretrain(
            "msldcecd_vith16_128px", "mae_vit_huge_MsLdCeCd", 128, 16, 128,
            10
        )["imgs_per_sec_per_chip"]
        measured["linprobe_vitb16_128px_lars"] = bench_classify(
            "linprobe_vitb16_128px_lars", "vit_base_patch16", 128, 16, 1024,
            10, linprobe=True
        )["imgs_per_sec_per_chip"]

    failed = []
    if args.proxy:
        lo, hi = expected["proxy_band"]["baseline_measured_proxy"]
        proxy = bench.run_ref_proxy()
        status = "OK" if lo <= proxy <= hi else "DRIFT"
        print(f"baseline_measured_proxy: {proxy:.0f} imgs/s "
              f"(band [{lo}, {hi}]) {status}")
        if status == "DRIFT":
            failed.append("baseline_measured_proxy")
    for name, value in measured.items():
        floor = floors.get(name)
        status = "SKIP (no floor)" if floor is None else (
            "OK" if value >= floor else "REGRESSION"
        )
        print(f"{name}: {value:.0f} imgs/s (floor {floor}) {status}")
        if floor is not None and value < floor:
            failed.append(name)
    if failed:
        raise SystemExit(f"perf regression in: {failed}")
    print("no perf regressions")


if __name__ == "__main__":
    main()
