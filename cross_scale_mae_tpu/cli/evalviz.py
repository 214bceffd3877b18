"""Qualitative evaluation CLI: masked-reconstruction plots + metric sweeps.

The CLI face of viz/recon.py — the reference exposes this through
``util/viz.py``'s ``prepare_model``/``run_eval`` called from notebooks and
the pretrain loop (SURVEY.md §3.4).

Usage:
    python -m cross_scale_mae_tpu.cli.evalviz --ckpt <run_dir>/checkpoints \
        --images a.jpg b.jpg --metrics mse ssim --noise gaussian --out viz/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax

from cross_scale_mae_tpu.data.datasets import DATASET_STATS
from cross_scale_mae_tpu.utils.logging import rank0_print
from cross_scale_mae_tpu.viz import (
    plot_reconstruction,
    prepare_image,
    prepare_model,
    run_eval,
    run_one_image,
)


def get_args_parser():
    p = argparse.ArgumentParser("Cross-Scale MAE eval/viz (TPU)", add_help=False)
    p.add_argument("--ckpt", required=True, nargs="+",
                   help="checkpoint dir(s); multiple = comparison sweep")
    p.add_argument("--step", default=None, type=int)
    p.add_argument("--images", default=[], nargs="+",
                   help="image files (omit for a synthetic probe image)")
    p.add_argument("--dataset_type", default="fmow_rgb",
                   choices=list(DATASET_STATS))
    p.add_argument("--mask_ratio", default=0.75, type=float)
    p.add_argument("--metrics", default=["mse", "ssim"], nargs="+")
    p.add_argument("--noise", default=[], nargs="+",
                   help="noise kinds: gaussian salt_pepper")
    p.add_argument("--noise_amount", default=0.1, type=float)
    p.add_argument("--out", default="./viz_out")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--temporal_csv", default=None,
                   help="fmow_temporal pairs CSV: adds a time-gap-stratified "
                        "temporal-consistency report (viz/temporal.py) per "
                        "model to the sweep output")
    p.add_argument("--temporal_batch", default=32, type=int)
    p.add_argument("--temporal_gap_buckets", default=[6, 12, 24], type=int,
                   nargs="+", help="month edges for the gap buckets")
    p.add_argument("--jax_platforms", default=None,
                   help="pin jax.config.jax_platforms (e.g. 'cpu') before "
                        "any device work")
    return p


def main(args) -> dict:
    if args.jax_platforms:
        jax.config.update("jax_platforms", args.jax_platforms)
    mean, std = DATASET_STATS[args.dataset_type]
    models = {}
    for ckpt in args.ckpt:
        params, _, cfg = prepare_model(ckpt, args.step)
        models[os.path.basename(os.path.dirname(ckpt.rstrip("/"))) or ckpt] = (
            params, cfg
        )
    any_cfg = next(iter(models.values()))[1]

    # Build the temporal datasets up front: fails fast on a bad/empty pairs
    # CSV before any reconstruction work, and decodes ONE dataset per
    # distinct model input size — decoding every pair at the first model's
    # resolution would score the other models on wrongly-resampled frames.
    tds_by_size = {}
    if args.temporal_csv:
        from cross_scale_mae_tpu.data import FmowTemporalDataset

        for _, cfg in models.values():
            if cfg.input_size not in tds_by_size:
                tds = FmowTemporalDataset(
                    args.temporal_csv, canvas_size=cfg.input_size
                )
                if len(tds) == 0:
                    raise SystemExit(
                        f"--temporal_csv {args.temporal_csv}: no pair rows"
                    )
                tds_by_size[cfg.input_size] = tds

    if args.images:
        images = [prepare_image(p, any_cfg, mean, std) for p in args.images]
    else:
        rng = np.random.default_rng(args.seed)
        arr = rng.integers(
            0, 256, (any_cfg.input_size, any_cfg.input_size,
                     any_cfg.input_channels), np.uint8
        )
        images = [prepare_image(arr, any_cfg, mean, std)]

    os.makedirs(args.out, exist_ok=True)
    for name, (params, cfg) in models.items():
        for i, img in enumerate(images):
            result = run_one_image(
                params, cfg, img, jax.random.key(args.seed), args.mask_ratio
            )
            plot_reconstruction(
                result, os.path.join(args.out, f"{name}_img{i}.png"),
                mean, std, title=f"{name} loss={result['loss']:.4f}",
            )

    noise_kinds = [None] + list(args.noise)
    sweep = run_eval(
        models, images, mean, std, metrics=args.metrics,
        noise_kinds=noise_kinds, noise_amount=args.noise_amount,
        mask_ratio=args.mask_ratio, seed=args.seed,
    )
    if args.temporal_csv:
        from cross_scale_mae_tpu.viz import temporal_consistency_by_gap

        sweep["temporal_consistency"] = {
            name: temporal_consistency_by_gap(
                params, cfg, tds_by_size[cfg.input_size],
                batch_size=args.temporal_batch,
                bucket_edges=tuple(args.temporal_gap_buckets),
            )
            for name, (params, cfg) in models.items()
        }
        with open(os.path.join(args.out, "temporal_gaps.json"), "w") as f:
            json.dump(sweep["temporal_consistency"], f, indent=2)

    rank0_print(json.dumps(sweep, indent=2))
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(sweep, f, indent=2)
    return sweep


if __name__ == "__main__":
    import argparse as _ap

    _parser = _ap.ArgumentParser(parents=[get_args_parser()])
    main(_parser.parse_args())
