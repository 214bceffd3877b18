"""Embedding-extraction CLI: batched encoder features for a whole dataset.

The serving-shaped inference path. The reference's only inference surface
is the qualitative viz harness (util/viz.py, SURVEY.md §3.4); downstream
users who want features must run the linprobe trainer. This CLI runs the
deterministic unmasked encoder (models.mae_encode) over any dataset and
writes ``features.npy`` (+ ``labels.npy``) — one XLA program for the whole
epoch (ragged final batch padded to a static shape), batches sharded over
the device mesh, fed by the native C++ loader where it engages.

Usage:
    python -m cross_scale_mae_tpu.cli.embed --ckpt <run>/checkpoints \
        --dataset_type fmow_rgb --test_path val.csv --pool cls \
        --output_dir feats/
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.cli.common import (
    add_data_args,
    add_runtime_args,
    setup_runtime,
)
from cross_scale_mae_tpu.data import build_dataset
from cross_scale_mae_tpu.models import mae_encode
from cross_scale_mae_tpu.ops.augment import make_eval_preprocess
from cross_scale_mae_tpu.parallel import batch_sharding
from cross_scale_mae_tpu.utils.logging import rank0_print
from cross_scale_mae_tpu.viz import prepare_model


def get_args_parser():
    p = argparse.ArgumentParser("Cross-Scale MAE embeddings (TPU)",
                                add_help=False)
    p.add_argument("--ckpt", required=True,
                   help="pretrain checkpoint dir (config travels with it)")
    p.add_argument("--step", default=None, type=int)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--pool", default="cls", choices=["cls", "mean", "tokens"],
                   help="cls token | mean of patch tokens | all tokens")
    p.add_argument("--split", default="test", choices=["train", "test"],
                   help="which split path to featurize (dataset order)")
    add_runtime_args(p)  # provides --output_dir/--seed/mesh/runtime flags
    add_data_args(p, pretrain=True)
    return p


def main(args) -> dict:
    ctx = setup_runtime(args)
    mesh = ctx["mesh"]

    params, _state, cfg = prepare_model(args.ckpt, args.step)
    ds = build_dataset(
        args.dataset_type, args.split == "train",
        train_path=args.train_path, test_path=args.test_path,
        input_size=cfg.input_size, canvas_scale=args.canvas_scale,
        masked_bands=args.masked_bands, dropped_bands=args.dropped_bands,
        synthetic_len=args.synthetic_len,
    )
    if ds.in_c != cfg.input_channels:
        raise SystemExit(
            f"dataset has {ds.in_c} channels but the checkpointed model "
            f"expects {cfg.input_channels}"
        )
    # Every host featurizes the FULL dataset in dataset order (num_shards=1):
    # only process 0 writes, so a per-process strided shard would silently
    # save half the features on a multi-host pod. Embedding extraction is
    # loader-bound anyway; the redundant device work is the price of a
    # complete, ordered features.npy on every topology.
    from cross_scale_mae_tpu.data import DataLoader

    loader = DataLoader(
        ds, args.batch_size, shuffle=False, drop_last=False,
        num_threads=max(2, args.num_workers), seed=args.seed,
        shard_id=0, num_shards=1,
    )

    preprocess = make_eval_preprocess(
        ds.mean, ds.std, cfg.input_size, normalize=ds.normalize_on_device,
        dtype=cfg.compute_dtype,
    )

    from jax.sharding import NamedSharding, PartitionSpec

    # Output replicated: every host fetches the full feature block (a
    # batch-sharded output would not be fully addressable on any one host
    # in a multi-process run).
    @functools.partial(
        jax.jit, out_shardings=NamedSharding(mesh, PartitionSpec())
    )
    def embed_step(params, imgs):
        feats = mae_encode(params, cfg, preprocess(imgs))
        if args.pool == "cls":
            out = feats[:, 0]
        elif args.pool == "mean":
            out = jnp.mean(feats[:, 1:], axis=1)
        else:
            out = feats
        return out.astype(jnp.float32)

    sharding = batch_sharding(mesh)
    bs = args.batch_size
    chunks, label_chunks, total = [], [], 0
    t0 = time.perf_counter()
    for imgs, labels in loader.epoch(0):
        n = len(labels)
        if n < bs:  # pad the ragged tail; one trace for the whole epoch
            imgs = np.concatenate(
                [imgs, np.zeros((bs - n,) + imgs.shape[1:], imgs.dtype)]
            )
        # Every host feeds the SAME full batch (num_shards=1 above), so
        # plain device_put with a global sharding is the correct multi-host
        # form here — unlike the per-host-sharded train loaders, which go
        # through host_local_to_global.
        out = embed_step(params, jax.device_put(imgs, sharding))
        chunks.append(np.asarray(out)[:n])
        label_chunks.append(labels[:n])
        total += n
    feats = np.concatenate(chunks) if chunks else np.zeros((0,))
    labels = np.concatenate(label_chunks) if label_chunks else np.zeros((0,))
    dt = time.perf_counter() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    if jax.process_index() == 0:
        np.save(os.path.join(args.output_dir, "features.npy"), feats)
        np.save(os.path.join(args.output_dir, "labels.npy"), labels)
        with open(os.path.join(args.output_dir, "meta.json"), "w") as f:
            json.dump(
                {
                    "ckpt": args.ckpt, "pool": args.pool,
                    "count": int(total), "shape": list(feats.shape),
                    "imgs_per_sec": round(total / max(dt, 1e-9), 1),
                },
                f, indent=2,
            )
    rank0_print(
        f"embedded {total} images -> {feats.shape} in {dt:.1f}s "
        f"({total / max(dt, 1e-9):.0f} imgs/s)"
    )
    return {"count": total, "shape": feats.shape}


if __name__ == "__main__":
    main(get_args_parser().parse_args())
