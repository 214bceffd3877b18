"""Serving-path throughput: the exported StableHLO artifact on the chip.

The reference has no serving story; ours is ``cli/export.py`` (portable
StableHLO encoder artifact). This bench answers the question a deployer
asks: what does the ARTIFACT sustain, and does the portability wrapper
cost anything vs the in-process jitted forward?

Method: build a ViT-B/16 @128px encoder artifact in-process (same lowering
path as the CLI, XLA attention for portability), then time (a) the
deserialized artifact's ``.call`` and (b) the in-process ``jax.jit``
forward it was exported from, at several batch sizes. Sync via host
readback (block_until_ready is unreliable on the axon platform).

Run: python benchmarks/bench_serving.py [--batches 64 256 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 256, 1024])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--pool", default="mean", choices=["cls", "mean"])
    ap.add_argument("--model", default="mae_vit_base",
                    help="registry name (smoke: mae_vit_tiny)")
    ap.add_argument("--input_size", type=int, default=128)
    ap.add_argument("--patch_size", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    help="compute dtype (smoke on CPU: float32)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (smoke: cpu). Needed because "
                         "this environment's sitecustomize pins "
                         "jax_platforms at import time, so JAX_PLATFORMS "
                         "alone does not take (tests/conftest.py recipe).")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import export as jexport

    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import mae_encode, mae_init
    from cross_scale_mae_tpu.ops.augment import make_eval_preprocess

    cfg = get_mae_config(
        args.model, input_size=args.input_size, patch_size=args.patch_size,
        compute_dtype=args.dtype, attention_impl="xla",  # portable lowering
    )
    params, _ = mae_init(jax.random.key(0), cfg)
    canvas = int(round(cfg.input_size / 0.875))
    preprocess = make_eval_preprocess(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype)

    def forward(imgs):
        feats = mae_encode(params, cfg, preprocess(imgs))
        out = feats[:, 0] if args.pool == "cls" else jnp.mean(
            feats[:, 1:], axis=1)
        return out.astype(jnp.float32)

    jitted = jax.jit(forward)
    results = []
    for nb in args.batches:
        spec = jax.ShapeDtypeStruct((nb, canvas, canvas, 3), jnp.uint8)
        artifact = jexport.deserialize(
            jexport.export(jax.jit(forward))(spec).serialize())
        imgs = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (nb, canvas, canvas, 3), np.uint8))

        def timed(fn):
            float(fn(imgs)[0, 0])  # compile + sync
            float(fn(imgs)[0, 0])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(imgs)
            float(out[0, 0])
            return nb * args.steps / (time.perf_counter() - t0)

        row = {
            "batch": nb,
            "artifact_imgs_per_sec": round(timed(artifact.call), 1),
            "inprocess_imgs_per_sec": round(timed(jitted), 1),
        }
        row["overhead_pct"] = round(
            100 * (1 - row["artifact_imgs_per_sec"]
                   / row["inprocess_imgs_per_sec"]), 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    best = max(r["artifact_imgs_per_sec"] for r in results)
    tag = args.model.replace("mae_vit_", "vit")
    print(json.dumps({
        "metric": f"serving_encoder_imgs_per_sec_{tag}_{args.input_size}px",
        "value": best, "unit": "imgs/sec/chip", "rows": results}))


if __name__ == "__main__":
    main()
