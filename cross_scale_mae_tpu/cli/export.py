"""Serving-artifact export: checkpoint -> portable StableHLO module.

The reference has no deployment story at all (its only inference surface is
the matplotlib viz harness, util/viz.py — SURVEY.md §3.4). This CLI closes
that gap TPU-natively: it lowers the deterministic unmasked encoder (raw
uint8 batch -> eval preprocess -> ViT encoder -> pooled features) with
``jax.export`` and writes a single self-contained artifact that any PJRT
runtime (Python, C++, other hosts, other JAX versions within the
compatibility window) can deserialize and call — no framework code, no
checkpoint format, no Python model class needed at serving time.

* Weights are baked into the module as constants by default (one-file
  artifact; ~2 bytes/param at bf16). ``--no_bake_weights`` exports
  ``fn(params, imgs)`` instead and writes the params to a sidecar ``.npz``.
* ``--symbolic_batch`` exports with a polymorphic batch dimension (serve any
  batch size from one artifact); this forces the XLA attention path since a
  Pallas grid needs a concrete batch.
* The CLI verifies its own artifact: deserialize + run + compare against
  the in-process forward before reporting success.

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
                   help="pretrain checkpoint dir (config travels with it)")
    p.add_argument("--step", default=None, type=int)
    p.add_argument("--output", required=True,
                   help="artifact path (e.g. encoder.stablehlo)")
    p.add_argument("--pool", default="cls", choices=["cls", "mean", "tokens"])
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--symbolic_batch", action="store_true",
                   help="polymorphic batch dim (forces xla attention)")
    p.add_argument("--no_bake_weights", action="store_true",
                   help="export fn(params, imgs) + params sidecar .npz "
                        "instead of a self-contained module")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (e.g. tpu cpu); default = "
                        "current backend")
    return p


def main(args) -> dict:
    from jax import export as jexport

    from cross_scale_mae_tpu.models import mae_encode
    from cross_scale_mae_tpu.ops.augment import make_eval_preprocess
    from cross_scale_mae_tpu.viz import prepare_model

    params, _state, cfg = prepare_model(args.ckpt, args.step)
    if args.symbolic_batch and cfg.attention_impl != "xla":
        cfg = cfg.replace(attention_impl="xla")
    # Serving runtimes feed raw uint8 images at the dataset canvas size; the
    # module owns normalization so the client needs zero preprocessing
    # knowledge. Stats fall back to fMoW-RGB when the checkpoint config has
    # no dataset attached.
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD

    preprocess = make_eval_preprocess(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size,
        dtype=cfg.compute_dtype,
    )

    def forward(p, imgs):
        feats = mae_encode(p, cfg, preprocess(imgs))
        if args.pool == "cls":
            out = feats[:, 0]
        elif args.pool == "mean":
            out = jnp.mean(feats[:, 1:], axis=1)
        else:
            out = feats
        return out.astype(jnp.float32)

    s = cfg.input_size
    c = cfg.input_channels
    if args.symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        img_spec = jax.ShapeDtypeStruct((b, s, s, c), jnp.uint8)
    else:
        img_spec = jax.ShapeDtypeStruct((args.batch_size, s, s, c), jnp.uint8)

    kwargs = {}
    if args.platforms:
        kwargs["platforms"] = args.platforms
    if args.no_bake_weights:
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
    if args.no_bake_weights:
        sidecar = args.output + ".params.npz"
        flat = {}

        def flatten(tree, prefix=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    flatten(v, f"{prefix}{k}/")
            else:
                flat[prefix[:-1]] = np.asarray(tree)

        flatten(params)
        np.savez(sidecar, **flat)

    # Self-check: deserialize and compare against the in-process forward.
    reloaded = jexport.deserialize(data)
    nb = 2 if args.symbolic_batch else args.batch_size
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nb, s, s, c), np.uint8)
    if args.no_bake_weights:
        got = reloaded.call(params, jnp.asarray(imgs))
    else:
        got = reloaded.call(jnp.asarray(imgs))
    want = forward(params, jnp.asarray(imgs))
    # bf16 compute: the reloaded module and the freshly-jitted forward may
    # fuse differently, so agreement is only to bf16 resolution (~8e-3).
    tol = 1e-4 if cfg.compute_dtype == "float32" else 3e-2
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=tol, atol=tol
    )

    meta = {
        "ckpt": args.ckpt,
        "pool": args.pool,
        "input": [None if args.symbolic_batch else args.batch_size, s, s, c],
        "output_dim": int(np.asarray(got).shape[-1]),
        "bytes": len(data),
        "platforms": list(exported.platforms),
        "weights": "baked" if sidecar is None else sidecar,
    }
    with open(args.output + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported {args.output} ({len(data) / 1e6:.1f} MB, "
          f"platforms={meta['platforms']}, verified roundtrip)")
    return meta


if __name__ == "__main__":
    main(get_args_parser().parse_args())
