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
    g.add_argument("--sequence_parallel", action="store_true",
                   help="Megatron-style sequence parallelism: the residual "
                        "stream (LayerNorms, adds) stays sharded over the "
                        "model axis between blocks — activation memory and "
                        "block-boundary collectives drop 1/model_parallel. "
                        "Needs --model_parallel > 1 and the gspmd step; see "
                        "models/layers.sp_constrain")
    g.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallelism: params AND "
                        "optimizer state sharded over the data axis (ZeRO-3 "
                        "storage); XLA inserts the per-use all-gather / "
                        "grad reduce-scatter. For models whose replicated "
                        "state does not fit one chip's HBM")
    g.add_argument("--num_slices", default=1, type=int,
                   help="multi-slice TPU: DCN slice count (data parallelism "
                        "crosses DCN; the model axis stays on ICI)")
    g.add_argument("--coordinator_address", default=None,
                   help="multi-host: jax.distributed coordinator")
    g.add_argument("--num_processes", default=None, type=int)
    g.add_argument("--process_id", default=None, type=int)
    g.add_argument("--jax_platforms", default=None,
                   help="pin jax.config.jax_platforms (e.g. 'cpu') before "
                        "the backend initializes. Needed over the "
                        "JAX_PLATFORMS env var when the environment "
                        "pre-seeds the config at import (this image's "
                        "sitecustomize pins 'axon,cpu', which silently "
                        "beats the env var) — e.g. for cli/launch.py "
                        "workers on the virtual CPU mesh")
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
        "--gelu", default="tanh",
        choices=["tanh", "exact", "exact_tanhbwd"],
        help="GELU flavor: tanh (TPU-fast default), exact (torch nn.GELU "
             "bit-parity; ~15%% slower flagship step), or exact_tanhbwd "
             "(forward bit-identical to exact, tanh-derivative backward "
             "within one bf16 ulp; +7%% flagship — "
             "models/layers.gelu_exact_fastbwd)",
    )
    g.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steps 10-30 here")
    g.add_argument("--remat", action="store_true",
                   help="rematerialize blocks (trade FLOPs for HBM)")
    g.add_argument("--compute_dtype", default="bfloat16")


def add_data_args(p: argparse.ArgumentParser, pretrain: bool):
    g = p.add_argument_group("data")
    choices = ["fmow_rgb", "coco", "euro_sat", "fmow_sentinel", "naip",
               "synthetic"]
    if pretrain:
        # Temporal pairs feed the multi-scale objective's second view
        # (models/mae.py); no classifier consumes them (the reference's
        # temporal dataset is dead code, util/datasets.py:237-294).
        choices += ["fmow_temporal"]
    if not pretrain:
        # The reference's classifier parsers use the short names
        # "rgb"/"sentinel" (main_finetune.py:296-304), and finetune.sh/
        # linprobe.sh pass "rgb" — but its own build_fmow_dataset only
        # dispatches on the long names (util/datasets.py:576-585), so the
        # launchers crash as shipped. We accept the short names as aliases
        # (resolved in apply_reference_compat) so the launcher lines run.
        # "smart"/"spacenetv1"/"resisc45" are declared there too but have
        # no loader in the reference either — accepted at parse (matching
        # its argparse), rejected with a clear error afterwards.
        choices += ["rgb", "sentinel", "smart", "spacenetv1", "resisc45"]
    g.add_argument("--dataset_type", default="fmow_rgb", choices=choices)
    g.add_argument("--train_path", default="", help="csv/txt/dir per dataset type")
    g.add_argument("--test_path", default="")
    g.add_argument("--masked_bands", default=None, type=int, nargs="+")
    g.add_argument("--dropped_bands", default=None, type=int, nargs="+")
    g.add_argument("--synthetic_len", default=4096, type=int)
    g.add_argument("--canvas_scale", default=1.0, type=float,
                   help="host decode canvas / input_size")
    if not pretrain:
        g.add_argument("--nb_classes", default=62, type=int)


def validate_parallel_args(args) -> None:
    """Cross-flag validation that must run BEFORE any device work.

    Called at the very top of each entry point's main() — ahead of
    setup_runtime's jax.distributed.initialize / backend init / mesh
    creation and any dataset construction — so a bad flag combination
    fails in milliseconds, not after a cluster rendezvous
    (tests/test_sequence_parallel.py CLI-guard contract).
    """
    if getattr(args, "sequence_parallel", False) and args.model_parallel <= 1:
        raise SystemExit(
            "--sequence_parallel shards the token axis over the model mesh "
            "axis — it needs --model_parallel > 1"
        )


def setup_runtime(args) -> dict[str, Any]:
    """Distributed init + mesh + per-host seeding. Returns context dict."""
    from cross_scale_mae_tpu.parallel import initialize_distributed, make_mesh

    if getattr(args, "jax_platforms", None):
        import jax

        jax.config.update("jax_platforms", args.jax_platforms)
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


def add_reference_compat_args(p: argparse.ArgumentParser, role: str):
    """Accept the remaining reference CLI flags so the reference's exact
    launcher command lines (train.sh, train_distributed.sh, finetune.sh,
    linprobe.sh) run unchanged against these entry points.

    Three kinds of flags (full mapping table in docs/MIGRATION.md):

    * real semantics carried: --output_dir_base (main_pretrain.py:467-468),
      --start_epoch, --wandb_id (main_pretrain.py:310-330), --attn_name
      (alias of --attention), linprobe --loss (must be classification_cross,
      main_linprobe.py:562-565), --ffn_name (only MLP is supported without
      xformers, MAE_ViT_Baseline.py:69-70 — same constraint here);
    * N/A on this stack, accepted + warned when explicitly set: --device,
      --pin_mem/--no_pin_mem, --num_workers is real, torch-DDP bootstrap
      flags (--world_size/--local_rank/--dist_url/--dist_on_itp — JAX
      discovers devices; multi-host uses --coordinator_address/
      --num_processes/--process_id), --dist_eval (eval is always sharded
      here), --use_xformers (attention variants are built in),
      --transform_checkpoint_keys (checkpoint keys are always remapped
      correctly here; the reference needs the flag because its default path
      loads nothing, main_finetune.py:591), --use_psa (mIoU is always
      computed from the in-graph confusion matrix);
    * dead in the reference itself, accepted + warned: --print_level (only
      consumed by the missing shunted models, reference defect #1),
      --spatial_mask (declared, never read), --resplit (declared, never
      read — the reference never calls timm's create_transform),
      --model_type (only skips layer-decay grouping for resnet*, but no
      resnet can be built from its registry).
    """
    g = p.add_argument_group("reference compat")
    g.add_argument("--output_dir_base", default=None,
                   help="prepended to --output_dir (main_pretrain.py:467)")
    g.add_argument("--start_epoch", default=None, type=int,
                   help="override the epoch to start from (normally "
                        "restored from --resume)")
    g.add_argument("--wandb_id", default=None,
                   help="resume this wandb run id")
    g.add_argument("--device", default=None, help="N/A: JAX owns devices")
    g.add_argument("--pin_mem", action="store_true", dest="_compat_pin_mem")
    g.add_argument("--no_pin_mem", action="store_true",
                   dest="_compat_no_pin_mem")
    g.add_argument("--world_size", default=None, type=int,
                   help="N/A: use --num_processes (hosts, not chips)")
    g.add_argument("--local_rank", default=None, type=int)
    g.add_argument("--dist_url", default=None)
    g.add_argument("--dist_on_itp", action="store_true")
    if role == "pretrain":
        g.add_argument("--attn_name", default=None,
                       help="alias of --attention (train.sh:41)")
        g.add_argument("--ffn_name", default="MLP",
                       help="only MLP is supported (MAE_ViT_Baseline.py:69)")
        g.add_argument("--use_xformers", action="store_true",
                       help="accepted; attention variants are built in")
        g.add_argument("--print_level", default=None, type=int,
                       help="dead in reference (shunted-only)")
        g.add_argument("--spatial_mask", action="store_true",
                       help="dead in reference (never read)")
    else:  # finetune / linprobe
        g.add_argument("--model_type", default=None,
                       help="accepted; resnet* cannot be built (dead in "
                            "reference too)")
        g.add_argument("--transform_checkpoint_keys", action="store_true",
                       help="accepted; keys are always remapped here")
        g.add_argument("--dist_eval", action="store_true",
                       help="accepted; eval is always sharded here")
        g.add_argument("--use_psa", action="store_true",
                       help="accepted; mIoU is always computed here")
        if role == "linprobe":
            g.add_argument("--loss", default="classification_cross",
                           help="must be classification_cross "
                                "(main_linprobe.py:562-565)")
            g.add_argument("--use_xformers", action="store_true")
            g.add_argument("--norm_pix_loss", action="store_true",
                           help="dead in reference's linprobe (never read)")
            g.add_argument("--print_level", default=None, type=int)
            g.add_argument("--spatial_mask", action="store_true")
        else:
            g.add_argument("--resplit", action="store_true",
                           help="dead in reference (never read)")


def apply_reference_compat(args, role: str):
    """Resolve the compat flags added by add_reference_compat_args.

    Mutates args in place (output_dir join, attn_name alias) and validates
    the reference's own constraints. Call before setup_runtime."""
    from cross_scale_mae_tpu.utils.logging import rank0_print

    if getattr(args, "output_dir_base", None):
        # main_pretrain.py:467-468: output_dir = base/output_dir.
        args.output_dir = os.path.join(args.output_dir_base, args.output_dir)
    aliases = {"rgb": "fmow_rgb", "sentinel": "fmow_sentinel"}
    if args.dataset_type in aliases:
        rank0_print(
            f"--dataset_type {args.dataset_type}: reference classifier-CLI "
            f"short name, resolved to {aliases[args.dataset_type]} "
            "(the reference's own build_fmow_dataset crashes on it, "
            "util/datasets.py:624)")
        args.dataset_type = aliases[args.dataset_type]
    elif args.dataset_type in ("smart", "spacenetv1", "resisc45"):
        raise ValueError(
            f"--dataset_type {args.dataset_type} is declared by the "
            "reference's classifier parsers but has no loader there either "
            "(build_fmow_dataset raises 'Invalid dataset type'); no data "
            "format to be compatible with")
    attn_name = getattr(args, "attn_name", None)
    if attn_name is not None:
        if attn_name == "shunted":
            raise ValueError(
                "--attn_name shunted maps to modules missing from the "
                "reference (its defect #1) and is not carried")
        valid = ("scaled_dot_product", "linformer", "orthoformer",
                 "nystrom", "local", "fourier_mix")
        if attn_name not in valid:
            # Same validation the reference applies via choices=
            # (main_pretrain.py:109-118); fail at the CLI, not deep in jit.
            raise ValueError(
                f"--attn_name {attn_name!r}: invalid choice "
                f"(choose from {', '.join(valid)})")
        args.attention = attn_name
    if getattr(args, "ffn_name", "MLP") != "MLP":
        # Mirrors the reference's own assert (MAE_ViT_Baseline.py:69-70).
        raise ValueError(
            f"Feedforward {args.ffn_name} not supported: only MLP")
    if role == "linprobe" and args.loss != "classification_cross":
        raise ValueError("Only classification_cross is supported "
                         "(main_linprobe.py:562-565)")
    ignored = [
        name for name in ("device", "world_size", "local_rank", "dist_url")
        if getattr(args, name, None) not in (None, "")
    ]
    ignored += [
        flag for flag, attr in (
            ("pin_mem", "_compat_pin_mem"), ("no_pin_mem", "_compat_no_pin_mem"),
            ("dist_on_itp", "dist_on_itp"), ("use_xformers", "use_xformers"),
            ("spatial_mask", "spatial_mask"), ("resplit", "resplit"),
            ("dist_eval", "dist_eval"), ("use_psa", "use_psa"),
            ("transform_checkpoint_keys", "transform_checkpoint_keys"),
            ("norm_pix_loss", "norm_pix_loss") if role == "linprobe" else
            ("", ""),
        ) if flag and getattr(args, attr, False)
    ]
    if getattr(args, "print_level", None) is not None:
        ignored.append("print_level")
    if getattr(args, "model_type", None):
        ignored.append("model_type")
    if ignored:
        rank0_print(
            "reference-compat flags accepted but not applicable here: "
            + ", ".join(f"--{n}" for n in ignored)
            + " (see docs/MIGRATION.md)")
