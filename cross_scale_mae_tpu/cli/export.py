"""Serving-artifact export: checkpoint -> portable StableHLO module.

The reference has no deployment story at all (its only inference surface is
the matplotlib viz harness, util/viz.py — SURVEY.md §3.4). This CLI closes
that gap TPU-natively: it lowers raw uint8 canvas -> eval preprocess
(normalize + center-crop, the same chain cli/finetune.py's eval datasets
use) -> model with ``jax.export`` and writes a single self-contained
artifact that any PJRT runtime (Python, C++, other hosts, other JAX
versions within the compatibility window) can deserialize and call — no
framework code, no checkpoint format, no Python model class needed at
serving time. The checkpoint kind is auto-detected from its config
sidecar: an MAE pretrain run exports the deterministic unmasked encoder
(pooled features); a finetune/linprobe run exports the full classifier
(class logits, BN-head running stats baked in eval mode).

* ``--dataset_type`` selects the normalization stats baked into the module
  (data/datasets.py DATASET_STATS); host-normalized dataset families
  (fmow_sentinel / euro_sat) skip the on-device normalize exactly like
  their loaders do.
* The input spec is the EVAL CANVAS size (input_size/0.875 for inputs
  <= 224, like the finetune/linprobe eval datasets), so the exported
  features match the training-time eval pipeline bit-for-bit; override
  with ``--canvas_scale``.
* Attention is always lowered via the XLA path (numerically identical to
  the Pallas kernels): a Mosaic tpu_custom_call would pin the "portable"
  artifact to TPU runtimes.
* Weights are baked into the module as constants by default (one-file
  artifact). ``--no_bake_weights`` exports ``fn(params, imgs)`` instead and
  writes the params to a sidecar ``.npz``.
* ``--symbolic_batch`` exports with a polymorphic batch dimension (serve
  any batch size from one artifact).
* The CLI verifies its own artifact (deserialize + run + compare against
  the in-process forward) whenever the local backend is among the exported
  platforms; otherwise it verifies deserialization only.

Usage:
    python -m cross_scale_mae_tpu.cli.export --ckpt <run>/checkpoints \
        --pool mean --batch_size 64 --output /tmp/encoder.stablehlo
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

def get_args_parser():
    p = argparse.ArgumentParser("Cross-Scale MAE serving export (TPU)",
                                add_help=False)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir (config travels with it); MAE "
                        "pretrain -> pooled-feature artifact, finetune/"
                        "linprobe -> class-logits artifact (auto-detected)")
    p.add_argument("--step", default=None, type=int)
    p.add_argument("--output", required=True,
                   help="artifact path (e.g. encoder.stablehlo)")
    p.add_argument("--pool", default="cls", choices=["cls", "mean", "tokens"])
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--dataset_type", default="fmow_rgb",
                   help="normalization stats baked into the module "
                        "(data/datasets.py DATASET_STATS)")
    p.add_argument("--canvas_scale", default=None, type=float,
                   help="input canvas = input_size * canvas_scale; default "
                        "1/0.875 for input <= 224 (the eval pipeline's "
                        "Resize + CenterCrop), else 1.0")
    p.add_argument("--symbolic_batch", action="store_true",
                   help="polymorphic batch dim (serve any batch size)")
    p.add_argument("--no_bake_weights", action="store_true",
                   help="export fn(params, imgs) + params sidecar .npz "
                        "instead of a self-contained module")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (e.g. tpu cpu); default = "
                        "current backend")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="weight-only int8 (quant.py): ~4x smaller artifact, "
                        "HBM-bandwidth win at low serving batch; baked "
                        "weights only")
    return p


def main(args) -> dict:
    from jax import export as jexport

    # Checkpoint-kind detection, eval preprocessing, and the forward graph
    # are shared with the online server (cli/serve.py) via serving.py —
    # the artifact and the in-process server compute the identical graph.
    from cross_scale_mae_tpu.serving import prepare_serving

    forward, params, cfg, kind, canvas, c = prepare_serving(
        args.ckpt, args.step, pool=args.pool,
        dataset_type=args.dataset_type, canvas_scale=args.canvas_scale,
    )
    if args.symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        img_spec = jax.ShapeDtypeStruct((b, canvas, canvas, c), jnp.uint8)
    else:
        img_spec = jax.ShapeDtypeStruct(
            (args.batch_size, canvas, canvas, c), jnp.uint8)

    kwargs = {}
    if args.platforms:
        kwargs["platforms"] = args.platforms
    quant_drift = None
    qparams = None
    if args.quantize == "int8":
        if args.no_bake_weights:
            raise SystemExit("--quantize already implies sidecar weights "
                             "(the int8 codes ship as <output>.q8.npz); "
                             "drop --no_bake_weights")
        from cross_scale_mae_tpu.quant import (
            dequantize_params,
            quantize_params_int8,
        )

        # The codes must be exported ARGUMENTS: trace-time eager ops on a
        # closure constant would fold the dequantize back to full
        # precision and the artifact would not shrink at all. The module
        # takes (qparams, imgs); the int8 tree ships as a .q8.npz sidecar
        # (~4x smaller than fp32) and the cast*scale fuses into each
        # matmul at serving time.
        qparams = quantize_params_int8(params)
        fp_forward = forward

        def forward_q(qp, imgs):
            return fp_forward(
                dequantize_params(qp, cfg.compute_dtype), imgs)

        qspecs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), qparams)
        exported = jexport.export(jax.jit(forward_q), **kwargs)(
            qspecs, img_spec)
        # Report how far weight-only int8 moved the outputs vs full
        # precision (cosine similarity over a random batch).
        nb = 2 if args.symbolic_batch else args.batch_size
        rng = np.random.default_rng(7)
        probe = jnp.asarray(rng.integers(0, 256, (nb, canvas, canvas, c),
                                         np.uint8))
        a = np.asarray(forward_q(qparams, probe)).reshape(nb, -1)
        bfp = np.asarray(fp_forward(params, probe)).reshape(nb, -1)
        cos = (a * bfp).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(bfp, axis=-1) + 1e-12)
        quant_drift = {"scheme": "int8_weight_only",
                       "cosine_vs_fp_min": round(float(cos.min()), 6)}
    elif args.no_bake_weights:
        param_specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        )
        exported = jexport.export(jax.jit(forward), **kwargs)(
            param_specs, img_spec
        )
    else:
        baked = jax.jit(lambda imgs: forward(params, imgs))
        exported = jexport.export(baked, **kwargs)(img_spec)

    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(data)
    sidecar = None
    if args.no_bake_weights or qparams is not None:
        sidecar = args.output + (
            ".q8.npz" if qparams is not None else ".params.npz")
        flat = {}

        def flatten(tree, prefix=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    flatten(v, f"{prefix}{k}/")
            else:
                flat[prefix[:-1]] = np.asarray(tree)

        flatten(qparams if qparams is not None else params)
        np.savez(sidecar, **flat)

    # Self-check: deserialize, and when the local backend is among the
    # exported platforms, run + compare against the in-process forward.
    reloaded = jexport.deserialize(data)
    backend = jax.default_backend()
    local_plat = "tpu" if backend == "axon" else backend
    runnable = local_plat in reloaded.platforms
    verified = "deserialize-only"
    out_dim = None
    if runnable:
        nb = 2 if args.symbolic_batch else args.batch_size
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (nb, canvas, canvas, c), np.uint8)
        if qparams is not None:
            got = reloaded.call(qparams, jnp.asarray(imgs))
            want = forward_q(qparams, jnp.asarray(imgs))
        elif args.no_bake_weights:
            got = reloaded.call(params, jnp.asarray(imgs))
            want = forward(params, jnp.asarray(imgs))
        else:
            got = reloaded.call(jnp.asarray(imgs))
            want = forward(params, jnp.asarray(imgs))
        # bf16 compute: the reloaded module and the freshly-jitted forward
        # may fuse differently, so agreement is only to bf16 resolution.
        tol = 1e-4 if cfg.compute_dtype == "float32" else 3e-2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=tol, atol=tol
        )
        out_dim = int(np.asarray(got).shape[-1])
        verified = "roundtrip"

    meta = {
        "ckpt": args.ckpt,
        "kind": kind,
        "pool": args.pool if kind == "mae" else "n/a (classifier head)",
        "dataset_type": args.dataset_type,
        "input": [None if args.symbolic_batch else args.batch_size,
                  canvas, canvas, c],
        "output_dim": out_dim,
        "bytes": len(data),
        "platforms": list(exported.platforms),
        "weights": "baked" if sidecar is None else sidecar,
        "quantize": quant_drift,
        "verified": verified,
    }
    with open(args.output + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported {args.output} ({len(data) / 1e6:.1f} MB, "
          f"platforms={meta['platforms']}, verified={verified})")
    return meta


if __name__ == "__main__":
    main(get_args_parser().parse_args())
