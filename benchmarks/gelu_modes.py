"""Flagship-measure every GELU mode on the real chip (round 5 evidence).

The strict-parity leg (gelu='exact', torch nn.GELU numerics) pays ~15%
vs the tanh headline; this script measured where a cheaper backward can
recover some of it. Measured 2026-08-20, one v5e chip, b384, 10 steps:

    exact             2046.6 imgs/s/chip   (autodiff-through-erfc backward)
    exact_savephi     2028.5               (analytic bwd from SAVED fwd erfc
                                            + one exp; the extra activation
                                            residual's HBM traffic + lost
                                            fusion cost more than the saved
                                            erf recompute -> NOT CARRIED;
                                            formula in the
                                            gelu_exact_fastbwd docstring)
    exact_tanhbwd     2196.1  (+7.3%)      (tanh-GELU derivative backward;
                                            fwd bit-identical to exact, bwd
                                            within one bf16 ulp -> KEPT)
    tanh              2424.9               (headline numerics)

NOTE a standalone GELU microbenchmark (matmul + gelu + grad at the MLP
activation shape) proved UNREPRESENTATIVE on axon — host-sync artifacts
made fwd+bwd measure faster than fwd alone. Only in-flagship numbers
(this script) are decision-grade; see docs/VALIDATION.md 5b.

Run on the real chip:  python benchmarks/gelu_modes.py
"""

from __future__ import annotations

import importlib.util
import os


def main():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     os.pardir, "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    for mode in ("exact", "exact_tanhbwd", "tanh"):
        v = bench.run_fused(n_steps=10, gelu=mode)
        print(f"{mode:15s} {v:8.1f} imgs/s/chip", flush=True)


if __name__ == "__main__":
    main()
