"""Input-pipeline throughput: can the loader outrun the train step?

Closes ROADMAP's "io_uring-style async reads if input-bound at scale" item
with a measurement instead of speculation: generate a JPEG corpus shaped
like the flagship's input (128 px RGB), then measure end-to-end decode
throughput through the production ``DataLoader`` — native C++ loader when
built, Python thread-pool fallback otherwise — and compare against the
flagship train-step consumption rate (bench.py, ~2430 imgs/s/chip).

If loader >> step rate, the pipeline is compute-bound and fancier IO
(io_uring, readahead rings) cannot move the headline number on this host.

Run: python benchmarks/bench_loader.py [--n 4096] [--threads 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FLAGSHIP_RATE = 2434.0  # imgs/s/chip, benchmarks/expected.json recorded


def make_corpus(root: str, n: int, size: int = 128) -> str:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    csv = os.path.join(root, "train.csv")
    if os.path.exists(csv) and len(open(csv).readlines()) == n + 1:
        return csv  # reuse across runs
    rng = np.random.default_rng(0)
    with open(csv, "w") as f:
        f.write("category,image_path\n")
        for i in range(n):
            # Natural-image-ish content so JPEG decode cost is realistic
            # (pure noise decodes slower, flat color faster): smooth
            # low-frequency fields + mild noise.
            base = rng.normal(128, 40, (8, 8, 3))
            arr = np.kron(base, np.ones((size // 8, size // 8, 1)))
            arr += rng.normal(0, 12, (size, size, 3))
            name = f"img_{i:05d}.jpg"
            Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(
                os.path.join(root, name), quality=90
            )
            f.write(f"{i % 10},{name}\n")
    return csv


def measure(loader, epochs: int) -> float:
    n = 0
    t0 = time.perf_counter()
    for ep in range(epochs):
        for imgs, labels in loader.epoch(ep):
            n += imgs.shape[0]
    return n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=384)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/csmae_loaderbench")
    args = ap.parse_args()

    from cross_scale_mae_tpu.data.datasets import FmowRgbDataset
    from cross_scale_mae_tpu.data.loader import DataLoader

    csv = make_corpus(os.path.join(args.workdir, "data"), args.n)
    ds = FmowRgbDataset(csv, canvas_size=128)

    out = {"n_images": args.n, "batch_size": args.batch_size,
           "flagship_step_rate": FLAGSHIP_RATE}
    for use_native, key in ((True, "native_imgs_per_sec"),
                            (False, "python_imgs_per_sec")):
        loader = DataLoader(ds, args.batch_size, num_threads=args.threads,
                            use_native=use_native)
        engaged = loader._native is not None
        if use_native and not engaged:
            out[key] = None  # native core not built in this env
            continue
        # Warm the page cache so we measure decode, not first-touch disk.
        measure(loader, 1)
        out[key] = round(measure(loader, args.epochs), 1)
        if use_native:
            out["native_engaged"] = engaged
    rate = out.get("native_imgs_per_sec") or out.get("python_imgs_per_sec")
    out["headroom_x"] = round(rate / FLAGSHIP_RATE, 2)
    out["input_bound"] = rate < FLAGSHIP_RATE
    print(json.dumps(out))


if __name__ == "__main__":
    main()
