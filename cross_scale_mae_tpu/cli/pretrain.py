"""Pretraining entry point.

CLI-compatible redesign of ``main_pretrain.py`` (660 LoC): same model-name
registry surface (``--model mae_vit_base_MsLdCeCd``), loss selection, lr
scaling rule (lr = blr * eff_batch/256, ``main_pretrain.py:411-412``),
per-epoch checkpointing cadence and reconstruction plots — with the whole
step (augment + two-view forward + losses + backward + AdamW) compiled into
one XLA program over the device mesh.

Usage:
    python -m cross_scale_mae_tpu.cli.pretrain \
        --model mae_vit_base_MsLdCeCd --dataset_type fmow_rgb \
        --train_path train.csv --batch_size 512 --epochs 400 --input_size 128
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.cli.common import (
    add_data_args,
    add_reference_compat_args,
    add_runtime_args,
    apply_reference_compat,
    encode_run_name,
    make_loader,
    setup_runtime,
    validate_parallel_args,
)
from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config, mae_model_names
from cross_scale_mae_tpu.data import DATASET_STATS, build_dataset
from cross_scale_mae_tpu.models import mae_init
from cross_scale_mae_tpu.ops.augment import make_pretrain_augment
from cross_scale_mae_tpu.parallel import batch_sharding, shard_train_state
from cross_scale_mae_tpu.train import TrainState, build_optimizer, warmup_half_cosine
from cross_scale_mae_tpu.train.pretrain import make_pretrain_step
from cross_scale_mae_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from cross_scale_mae_tpu.utils.logging import RunLogger, epoch_1000x, rank0_print
from cross_scale_mae_tpu.utils.metrics import MetricLogger


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Cross-Scale MAE pretraining (TPU)",
                                add_help=False)
    # Model (main_pretrain.py:63-173 flag surface)
    p.add_argument("--model", default="mae_vit_base_MsLdCeCd")
    p.add_argument("--input_size", default=128, type=int)
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--mask_ratio", default=0.75, type=float)
    p.add_argument(
        "--loss", default="mse",
        choices=["mse", "l2", "mae", "l1", "bce", "ssim", "ms_ssim",
                 "mse_ssim", "mse_ms_ssim"],
    )
    p.add_argument("--norm_pix_loss", action="store_true")
    p.add_argument("--loss_e", default=None)
    p.add_argument("--loss_ce", default=None)
    p.add_argument("--loss_cd", default=None)
    p.add_argument("--ms_range", default=(0.25, 0.75), type=float, nargs=2)
    p.add_argument("--ms_decoder_loss_reduction", default="sum",
                   choices=["sum", "mean"])
    p.add_argument("--batch_crop", action="store_true",
                   help="one shared crop box per batch (reference behavior)")
    p.add_argument("--consistent_mask", action="store_true")
    p.add_argument("--mask_seed", default=None, type=int)
    p.add_argument("--use_perceptual_loss", action="store_true")
    p.add_argument("--vgg_weights", default=None,
                   help="torchvision VGG16 .pth for the perceptual trunk; "
                        "without it the trunk is random (documented in the "
                        "run config as vgg_trunk)")
    p.add_argument("--apply_encoder_norm", action="store_true")
    # Optimization (main_pretrain.py:174-240)
    p.add_argument("--epochs", default=400, type=int)
    p.add_argument("--warmup_epochs", default=40, type=int)
    p.add_argument("--batch_size", default=512, type=int,
                   help="global batch per optimizer step (pre-accum)")
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--blr", default=5e-5, type=float)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--clip_grad", default=None, type=float)
    p.add_argument("--adam_mu_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="dtype of Adam's first moment (bfloat16 halves its "
                        "HBM). Default fp32 = reference numerics")
    p.add_argument("--adam_nu_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="dtype of Adam's second moment (train/optim."
                        "scale_by_adam_moment_dtypes; measured step-neutral "
                        "on the flagship, VALIDATION §5a). Default fp32 = "
                        "reference numerics")
    p.add_argument("--ckpt_interval", default=25, type=int)
    p.add_argument("--plot_recon", action="store_true",
                   help="save reconstruction plots at checkpoint epochs")
    p.add_argument("--val_img_path", default=None,
                   help="image file or directory to reconstruct at each "
                        "checkpoint epoch (main_pretrain.py:590-626); "
                        "default: the first dataset sample")
    p.add_argument("--max_steps", default=None, type=int,
                   help="hard step cap (smoke tests)")
    p.add_argument("--unroll_blocks", action="store_true",
                   help="unrolled layer loop (faster steps, slower compile)")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis (ZeRO-1)")
    p.add_argument("--watch_gradients", action="store_true",
                   help="log per-subtree gradient norms (wandb.watch "
                        "equivalent, main_pretrain.py:537)")
    p.add_argument("--ddp_mode", default="gspmd", choices=["gspmd", "shard_map"],
                   help="shard_map = manual SPMD with reference per-device "
                        "DDP semantics (local NT-Xent negatives/BN stats); "
                        "required for pallas attention on multi-chip meshes")
    p.add_argument("--reference_semantics", action="store_true",
                   help="compose every parity default in one switch: "
                        "--gelu exact (torch nn.GELU), --batch_crop (one "
                        "shared crop box per batch, MAE_ViT_MsLd.py:29-35), "
                        "--ddp_mode shard_map (per-device NT-Xent negatives "
                        "and BN stats like DDP). Accuracy-parity claims vs "
                        "the reference refer to this preset.")
    add_data_args(p, pretrain=True)
    add_runtime_args(p)
    add_reference_compat_args(p, "pretrain")
    return p


def apply_reference_semantics(args) -> None:
    """Resolve --reference_semantics into its component flags (in place).

    One switch so real-data parity runs can't forget a piece: exact-erf GELU
    (models/layers.py gelu='exact'), the reference's batch-shared crop box
    (configs ms_per_sample_crop=False), and shard_map DDP (per-device
    NT-Xent negatives / predictor-BN batch stats, MAE_ViT_MsLdCeCd.py:51-69).
    """
    if getattr(args, "reference_semantics", False):
        if (getattr(args, "model_parallel", 1) > 1
                or getattr(args, "zero1", False)
                or getattr(args, "fsdp", False)
                or getattr(args, "sequence_parallel", False)):
            raise SystemExit(
                "--reference_semantics forces --ddp_mode shard_map (pure "
                "data-parallel, per-device NT-Xent/BN like DDP) and is "
                "incompatible with --model_parallel/--zero1/--fsdp/"
                "--sequence_parallel — the reference has no TP/ZeRO to be "
                "faithful to"
            )
        args.gelu = "exact"
        args.batch_crop = True
        args.ddp_mode = "shard_map"


def main(args) -> dict:
    apply_reference_compat(args, "pretrain")
    apply_reference_semantics(args)
    validate_parallel_args(args)
    ctx = setup_runtime(args)
    mesh = ctx["mesh"]
    rank0_print(f"devices: {ctx['global_devices']} mesh: {dict(mesh.shape)}")

    # ---- config
    cfg = get_mae_config(
        args.model,
        input_size=args.input_size,
        patch_size=args.patch_size,
        mask_ratio=args.mask_ratio,
        loss=args.loss,
        norm_pix_loss=args.norm_pix_loss,
        loss_e=args.loss_e, loss_ce=args.loss_ce, loss_cd=args.loss_cd,
        ms_range=tuple(args.ms_range),
        ms_decoder_loss_reduction=args.ms_decoder_loss_reduction,
        ms_per_sample_crop=not args.batch_crop,
        use_perceptual=args.use_perceptual_loss,
        apply_encoder_norm=args.apply_encoder_norm,
        compute_dtype=args.compute_dtype,
        attention_impl=args.attention_impl,
        remat=args.remat,
        gelu=args.gelu,
        scan_blocks=not args.unroll_blocks,
        sequence_parallel=args.sequence_parallel,
    )
    tcfg = TrainConfig(
        epochs=args.epochs, warmup_epochs=args.warmup_epochs,
        batch_size=args.batch_size, accum_iter=args.accum_iter,
        blr=args.blr, lr=args.lr, min_lr=args.min_lr,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        seed=args.seed, log_interval=args.log_interval,
        ckpt_interval_epochs=args.ckpt_interval,
        consistent_mask=args.consistent_mask,
        mask_seed=args.mask_seed,
        watch_gradients=args.watch_gradients,
    )
    if args.mask_seed is not None:
        rank0_print(
            "WARNING: --mask_seed pins the step RNG — the SAME crop, mask "
            "and flips every step (reference torch.manual_seed semantics, "
            "MAE_ViT_Baseline.py:301-302); implies --consistent_mask. Do "
            "not use for real training runs."
        )

    # ---- data
    if args.dataset_type == "fmow_temporal" and not cfg.multi_scale:
        raise SystemExit(
            "--dataset_type fmow_temporal needs a multi-scale model "
            "(mae_vit_*_MsLd*): the second frame replaces the on-device "
            "crop as the second view (models/mae.py); single-view MAE has "
            "no slot for it"
        )
    dataset = build_dataset(
        args.dataset_type, True,
        train_path=args.train_path, test_path=args.test_path,
        input_size=args.input_size, canvas_scale=args.canvas_scale,
        masked_bands=args.masked_bands, dropped_bands=args.dropped_bands,
        synthetic_len=args.synthetic_len,
    )
    per_host_batch = args.batch_size // jax.process_count()
    # The loader delivers accum_iter batches per optimizer step (reference
    # semantics, engine_pretrain.py:62-70: accumulate accum_iter DISTINCT
    # loader batches) — so eff_batch below matches what the step consumes
    # and the lr rule (main_pretrain.py:411-412) is exact.
    loader = make_loader(
        args, dataset, per_host_batch * args.accum_iter, seed=args.seed
    )
    steps_per_epoch = loader.steps_per_epoch()
    assert steps_per_epoch > 0, "dataset smaller than one batch"
    eff_batch = args.batch_size * args.accum_iter
    lr = tcfg.resolved_lr(eff_batch)
    rank0_print(
        f"dataset {args.dataset_type}: {len(dataset)} samples, "
        f"{steps_per_epoch} steps/epoch, lr {lr:.3e} (blr {args.blr})"
    )

    # ---- model/optimizer/state
    schedule = warmup_half_cosine(
        lr, args.min_lr, args.warmup_epochs, args.epochs, steps_per_epoch
    )
    params, mstate = mae_init(jax.random.key(args.seed), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    rank0_print(f"model {args.model}: {n_params / 1e6:.1f}M params")
    # Perceptual-trunk provenance: a run must record whether it trained
    # against imported torchvision weights or the random trunk
    # (losses/perceptual.py docstring contract).
    vgg_trunk = "n/a"
    if args.vgg_weights and not cfg.use_perceptual:
        raise SystemExit(
            "--vgg_weights given without --use_perceptual_loss: the trunk "
            "would be loaded for nothing — add --use_perceptual_loss or "
            "drop --vgg_weights"
        )
    if cfg.use_perceptual:
        if args.vgg_weights:
            from cross_scale_mae_tpu.losses.perceptual import (
                load_torch_vgg16_features,
            )

            mstate["vgg"] = load_torch_vgg16_features(args.vgg_weights)
            vgg_trunk = f"imported:{args.vgg_weights}"
        else:
            vgg_trunk = "random"
        rank0_print(f"perceptual trunk: {vgg_trunk}")
    tx = build_optimizer(
        params, schedule, weight_decay=args.weight_decay,
        b1=tcfg.adam_b1, b2=tcfg.adam_b2, clip_grad=args.clip_grad,
        mu_dtype=args.adam_mu_dtype, nu_dtype=args.adam_nu_dtype,
    )
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(
        mesh, state, tensor_parallel=args.model_parallel > 1,
        zero1=args.zero1, fsdp=args.fsdp,
    )

    start_epoch = 0
    if args.resume and latest_step(args.resume) is not None:
        state, meta = restore_checkpoint(args.resume, state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        rank0_print(f"resumed from {args.resume} at epoch {start_epoch}")
    if args.start_epoch is not None:
        # Explicit reference-style override (main_pretrain.py --start_epoch;
        # there it is what --resume restores INTO, here resume already set
        # it, so the flag wins only when given).
        start_epoch = args.start_epoch

    # ---- augmentation fused into the step
    mean, std = dataset.mean, dataset.std
    augment = make_pretrain_augment(
        mean, std, args.input_size,
        normalize=dataset.normalize_on_device, dtype=args.compute_dtype,
        rot90=(args.dataset_type == "naip"),
    )
    if args.ddp_mode == "shard_map":
        from cross_scale_mae_tpu.train.pretrain import make_pretrain_step_shard_map

        assert args.model_parallel == 1 and not args.zero1 and not args.fsdp, (
            "shard_map DDP mode is pure data-parallel"
        )
        if cfg.sequence_parallel:
            raise SystemExit(
                "--sequence_parallel needs the gspmd step (the shard_map "
                "DDP body has no 'model' axis to shard the sequence over)"
            )
        step_fn = make_pretrain_step_shard_map(
            cfg, tcfg, schedule, mesh, augment=augment
        )
    else:
        step_fn = make_pretrain_step(
            cfg, tcfg, schedule, augment=augment, mesh=mesh
        )
    data_sharding = batch_sharding(mesh)

    # ---- logging
    run_name = encode_run_name(
        model=args.model, loss=args.loss, in_sz=args.input_size,
        p_sz=args.patch_size, lr=lr, ds=args.dataset_type,
    )
    from cross_scale_mae_tpu.utils.logging import auto_output_dir

    # +N anti-clobber suffix (main_pretrain.py:471-491)
    output_dir = auto_output_dir(args.output_dir, run=run_name)
    logger = RunLogger(
        output_dir, args.use_tensorboard, args.use_wandb, args.wandb_project,
        run_name, config={**json.loads(cfg.to_json()), "vgg_trunk": vgg_trunk},
        wandb_entity=args.wandb_entity, wandb_id=args.wandb_id,
    )
    rank0_print(f"output dir: {output_dir}")

    # ---- preemption-safe shutdown: on SIGTERM/SIGINT finish the current
    # step, write a checkpoint, and exit cleanly (no reference equivalent —
    # a rank failure kills the reference's torchrun job, SURVEY.md §5).
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        rank0_print(f"signal {signum}: checkpoint-and-exit after this step")
        stop_requested["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:
            pass  # not in main thread

    # ---- epoch loop
    from cross_scale_mae_tpu.data.loader import device_prefetch

    # ---- fault injection (failure drills): CSM_FAULT_STEP=k kills THIS
    # process hard (os._exit, no checkpoint, no cleanup) after global step
    # k — a lost host, as far as the peers and the elastic launcher
    # (cli/launch.py) are concerned. CSM_FAULT_PROCESS picks the victim
    # rank; CSM_FAULT_ATTEMPT scopes it to one launcher attempt so the
    # relaunch doesn't re-fault. The reference has no fault injection at
    # all (SURVEY.md §5).
    fault_step = int(os.environ.get("CSM_FAULT_STEP", "0"))
    if fault_step and (
        jax.process_index() != int(os.environ.get("CSM_FAULT_PROCESS", "0"))
        or os.environ.get("CSM_LAUNCH_ATTEMPT", "1")
        != os.environ.get("CSM_FAULT_ATTEMPT", "1")
    ):
        fault_step = 0

    rng = jax.random.key(args.seed + 1)
    total_steps = 0
    last_metrics = {}
    prev_loss = None  # previous step's on-device loss, for the NaN abort
    t_start = time.time()
    for epoch in range(start_epoch, args.epochs):
        mlog = MetricLogger(print_fn=rank0_print)
        epoch_t0 = time.time()
        for it, (batch, labels) in enumerate(
            mlog.log_every(
                device_prefetch(loader.epoch(epoch), data_sharding),
                args.log_interval, header=f"Epoch [{epoch}]",
                total=steps_per_epoch,
            )
        ):
            if args.profile_dir and epoch == start_epoch and total_steps == 10:
                jax.profiler.start_trace(args.profile_dir)
            if args.profile_dir and epoch == start_epoch and total_steps == 30:
                jax.profiler.stop_trace()
            state, metrics = step_fn(state, batch, rng)
            # Per-step NaN abort (engine_pretrain.py:57-59) WITHOUT a
            # per-step pipeline stall: read the PREVIOUS step's loss, which
            # finished while this step was being enqueued. A NaN at step k
            # aborts at step k+1, before the poisoned state propagates far.
            if prev_loss is not None and not np.isfinite(float(prev_loss)):
                raise FloatingPointError(
                    f"Loss is {float(prev_loss)}, stopping training"
                )
            prev_loss = metrics["loss"]
            if it % args.log_interval == 0:
                fetched = {k: float(v) for k, v in metrics.items()}
                mlog.update(**fetched)
                last_metrics = fetched
                logger.log_step(
                    epoch_1000x(epoch + it / steps_per_epoch), fetched
                )
            total_steps += 1
            if fault_step and total_steps >= fault_step:
                print(f"[fault-injection] killing process "
                      f"{jax.process_index()} at step {total_steps}",
                      flush=True)
                os._exit(13)
            if stop_requested["flag"]:
                break
            if args.max_steps and total_steps >= args.max_steps:
                break
        epoch_time = time.time() - epoch_t0
        imgs_per_sec = (
            steps_per_epoch * per_host_batch * args.accum_iter
            / max(epoch_time, 1e-9)
        )
        payload = {
            "epoch": epoch, "epoch_time_s": epoch_time,
            "imgs_per_sec_per_host": imgs_per_sec,
            **{f"train_{k}": v for k, v in last_metrics.items()},
        }
        logger.log_epoch(payload)

        should_ckpt = (
            args.output_dir
            and ((epoch + 1) % args.ckpt_interval == 0
                 or epoch + 1 == args.epochs
                 or stop_requested["flag"])
        )
        if should_ckpt:
            save_checkpoint(
                os.path.join(output_dir, "checkpoints"),
                int(jax.device_get(state.step)), state,
                config_json=cfg.to_json(), extra={"epoch": epoch},
            )
            if args.plot_recon or args.val_img_path:
                # --val_img_path alone implies plotting (the reference plots
                # its val images unconditionally, main_pretrain.py:589-626).
                _plot_epoch_recon(
                    state, cfg, dataset, mean, std, output_dir, epoch,
                    val_img_path=args.val_img_path,
                )
        if stop_requested["flag"]:
            rank0_print("preemption checkpoint written; exiting")
            break
        if args.max_steps and total_steps >= args.max_steps:
            break

    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    if prev_loss is not None and not np.isfinite(float(prev_loss)):
        raise FloatingPointError(f"Loss is {float(prev_loss)} at final step")
    wall = time.time() - t_start
    rank0_print(f"training done in {wall:.1f}s ({total_steps} steps)")
    logger.close()
    return {"steps": total_steps, "last_metrics": last_metrics,
            "output_dir": output_dir}


def _plot_epoch_recon(state, cfg, dataset, mean, std, output_dir, epoch,
                      val_img_path=None):
    """Per-checkpoint reconstruction plots (main_pretrain.py:590-626).

    ``val_img_path`` (file or directory) reproduces the reference's
    user-chosen validation images; otherwise the first dataset sample."""
    import jax

    from cross_scale_mae_tpu.ops.image import normalize_images
    from cross_scale_mae_tpu.viz import plot_reconstruction, run_one_image

    if jax.process_index() != 0:
        return

    batches = []  # (normalized (1,H,W,C) batch, filename tag)
    if val_img_path:
        from cross_scale_mae_tpu.viz import prepare_image

        # prepare_image handles arbitrary file sizes/aspects (RGB convert +
        # square bicubic resize to input_size + normalize, util/viz.py:92-121).
        files = (
            sorted(
                os.path.join(val_img_path, f)
                for f in os.listdir(val_img_path)
                if f.lower().endswith(
                    (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".bmp")
                )
            )
            if os.path.isdir(val_img_path) else [val_img_path]
        )
        if not files:
            # The user explicitly asked for these images; silently plotting
            # dataset sample 0 for the whole run instead would be a trap.
            raise FileNotFoundError(
                f"--val_img_path {val_img_path!r}: no image files "
                f"(.jpg/.jpeg/.png/.tif/.tiff/.bmp) found"
            )
        batches = [
            (prepare_image(f, cfg, mean, std),
             os.path.splitext(os.path.basename(f))[0])
            for f in files
        ]
    if not batches:
        img, _ = dataset.load(0)
        x = jnp.asarray(img.astype(np.float32) / 255.0)
        if dataset.normalize_on_device:
            x = normalize_images(x, mean, std)
        if x.shape[0] != cfg.input_size or x.shape[1] != cfg.input_size:
            from cross_scale_mae_tpu.ops.image import center_crop_resize

            x = center_crop_resize(x[None], cfg.input_size)[0]
        batches = [(x[None], "")]

    for batch, tag in batches:
        result = run_one_image(state.params, cfg, batch, jax.random.key(0))
        suffix = f"_{tag}" if tag else ""
        plot_reconstruction(
            result,
            os.path.join(output_dir, "reconstructions",
                         f"epoch_{epoch:04d}{suffix}.png"),
            mean, std, title=f"epoch {epoch} loss {result['loss']:.4f}",
        )


if __name__ == "__main__":
    import argparse as _ap

    _parser = _ap.ArgumentParser(parents=[get_args_parser()])
    main(_parser.parse_args())
