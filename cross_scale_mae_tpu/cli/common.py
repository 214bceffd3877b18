"""Shared CLI plumbing: argparse groups, runtime setup, epoch-loop helpers."""

from __future__ import annotations

import argparse
import os
from typing import Any, Optional

import numpy as np


def add_runtime_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("runtime")
    g.add_argument("--seed", default=0, type=int)
    g.add_argument("--output_dir", default="./output_dir")
    g.add_argument("--log_dir", default=None, help="defaults to output_dir")
    g.add_argument("--resume", default="", help="checkpoint dir to resume from")
    g.add_argument("--num_workers", default=os.cpu_count() or 4, type=int)
    g.add_argument("--device_batch_dtype", default="bfloat16")
    g.add_argument("--model_parallel", default=1, type=int,
                   help="tensor-parallel mesh axis size (1 = pure DP)")
    g.add_argument("--num_slices", default=1, type=int,
                   help="multi-slice TPU: DCN slice count (data parallelism "
                        "crosses DCN; the model axis stays on ICI)")
    g.add_argument("--coordinator_address", default=None,
                   help="multi-host: jax.distributed coordinator")
    g.add_argument("--num_processes", default=None, type=int)
    g.add_argument("--process_id", default=None, type=int)
    g.add_argument("--use_tensorboard", action="store_true")
    g.add_argument("--use_wandb", action="store_true")
    g.add_argument("--wandb_project", default="cross_scale_mae_tpu")
    g.add_argument("--wandb_entity", default=None,
                   help="wandb team/entity (main_pretrain.py wandb flags)")
    g.add_argument("--log_interval", default=20, type=int)
    g.add_argument(
        "--attention_impl", default=None,
        choices=["xla", "pallas", "pallas_v3", "linformer", "orthoformer",
                 "nystrom", "local", "fourier_mix"],
        help="execution/variant choice; overrides --attention",
    )
    g.add_argument(
        "--attention", default="scaled_dot_product",
        choices=["scaled_dot_product", "linformer", "orthoformer", "nystrom",
                 "local", "fourier_mix"],
        help="reference-style attention name (main_pretrain.py:101-119); "
             "'shunted' maps to modules missing from the reference "
             "(its defect #1) and is not carried",
    )
    g.add_argument(
        "--gelu", default="tanh", choices=["tanh", "exact"],
        help="GELU flavor: tanh (TPU-fast default) or exact (torch "
             "nn.GELU bit-parity; ~15%% slower flagship step)",
    )
    g.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steps 10-30 here")
    g.add_argument("--remat", action="store_true",
                   help="rematerialize blocks (trade FLOPs for HBM)")
    g.add_argument("--compute_dtype", default="bfloat16")


def add_data_args(p: argparse.ArgumentParser, pretrain: bool):
    g = p.add_argument_group("data")
    g.add_argument(
        "--dataset_type", default="fmow_rgb",
        choices=["fmow_rgb", "coco", "euro_sat", "fmow_sentinel", "naip",
                 "synthetic"],
    )
    g.add_argument("--train_path", default="", help="csv/txt/dir per dataset type")
    g.add_argument("--test_path", default="")
    g.add_argument("--masked_bands", default=None, type=int, nargs="+")
    g.add_argument("--dropped_bands", default=None, type=int, nargs="+")
    g.add_argument("--synthetic_len", default=4096, type=int)
    g.add_argument("--canvas_scale", default=1.0, type=float,
                   help="host decode canvas / input_size")
    if not pretrain:
        g.add_argument("--nb_classes", default=62, type=int)


def setup_runtime(args) -> dict[str, Any]:
    """Distributed init + mesh + per-host seeding. Returns context dict."""
    from cross_scale_mae_tpu.parallel import initialize_distributed, make_mesh

    info = initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    # Resolve the attention choice AFTER distributed init (jax.devices()
    # initializes the backend, which must not precede
    # jax.distributed.initialize): --attention_impl wins, else the
    # reference-style --attention name maps scaled_dot_product to the
    # measured-fastest implementation for the backend — the v3 Pallas
    # kernel on TPU (bench.py evidence), the XLA einsum elsewhere
    # (CPU tests run the kernel only in interpret mode).
    if getattr(args, "attention_impl", None) is None:
        if args.attention == "scaled_dot_product":
            import jax

            on_tpu = jax.devices()[0].platform == "tpu"
            args.attention_impl = "pallas_v3" if on_tpu else "xla"
        else:
            args.attention_impl = args.attention
    mesh = make_mesh(model_parallel=args.model_parallel,
                     num_slices=args.num_slices)
    np.random.seed(args.seed + info["process_index"])
    return dict(mesh=mesh, **info)


def make_loader(args, dataset, batch_size, *, is_train=True, seed=0):
    import jax

    from cross_scale_mae_tpu.data import DataLoader

    return DataLoader(
        dataset,
        batch_size,
        shuffle=is_train,
        seed=seed,
        drop_last=is_train,
        num_threads=max(2, args.num_workers),
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
    )


def restore_classifier_run(args, state):
    """Shared --resume scaffold for finetune/linprobe (util/misc.py:382-411:
    restore model+optimizer state, resume epoch, and the max-accuracy
    tracker). Returns (state, start_epoch, max_acc)."""
    start_epoch, max_acc = 0, 0.0
    if args.resume:
        from cross_scale_mae_tpu.utils.checkpoint import (
            latest_step,
            restore_checkpoint,
        )
        from cross_scale_mae_tpu.utils.logging import rank0_print

        if latest_step(args.resume) is None:
            raise FileNotFoundError(f"--resume: no checkpoints in {args.resume}")
        state, meta = restore_checkpoint(args.resume, state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        max_acc = float(meta.get("max_acc", 0.0))
        rank0_print(
            f"resumed from {args.resume}: epoch {start_epoch}, "
            f"max_acc {max_acc:.2f}%"
        )
    return state, start_epoch, max_acc


def encode_run_name(**config: Any) -> str:
    """Config-encoded run identity (main_pretrain.py:450-463)."""
    return "-".join(f"{k}_{v}" for k, v in config.items() if v is not None)
