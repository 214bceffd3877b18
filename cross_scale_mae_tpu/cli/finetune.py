"""Finetuning entry point.

Redesign of ``main_finetune.py`` (860 LoC): loads a pretrained MAE encoder
(our checkpoints via Orbax, reference ``.pth`` via the torch importer —
**with the weight-load defect at main_finetune.py:591 fixed**), layer-wise
lr decay, mixup/cutmix/label-smoothing, per-epoch evaluate with
max-accuracy tracking.

Usage:
    python -m cross_scale_mae_tpu.cli.finetune --model vit_large_patch16 \
        --finetune <ckpt_dir|.pth|.npz> --dataset_type fmow_rgb \
        --train_path train.csv --test_path val.csv --nb_classes 62
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
    restore_classifier_run,
    add_data_args,
    add_reference_compat_args,
    add_runtime_args,
    apply_reference_compat,
    encode_run_name,
    make_loader,
    setup_runtime,
    validate_parallel_args,
)
from cross_scale_mae_tpu.configs import TrainConfig, get_vit_config
from cross_scale_mae_tpu.data import build_dataset
from cross_scale_mae_tpu.models import vit_init
from cross_scale_mae_tpu.ops.augment import (
    make_eval_preprocess,
    make_finetune_augment,
)
from cross_scale_mae_tpu.parallel import batch_sharding, shard_train_state
from cross_scale_mae_tpu.train import TrainState, build_optimizer, warmup_half_cosine
from cross_scale_mae_tpu.train.classify import make_classify_train_step, make_eval_step
from cross_scale_mae_tpu.utils.logging import RunLogger, rank0_print
from cross_scale_mae_tpu.utils.metrics import ConfusionMatrix, MetricLogger


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Cross-Scale MAE finetuning (TPU)", add_help=False)
    p.add_argument("--model", default="vit_large_patch16")
    p.add_argument("--input_size", default=64, type=int)   # finetune.sh:7
    p.add_argument("--patch_size", default=8, type=int)    # finetune.sh:8
    p.add_argument("--global_pool", action="store_true", default=True)
    p.add_argument("--cls_token_pool", action="store_false", dest="global_pool")
    p.add_argument("--cls_token", action="store_false", dest="global_pool",
                   help="classify from the cls token (reference flag name, "
                        "main_finetune.py:276-279)")
    p.add_argument("--drop_path", default=0.1, type=float)
    p.add_argument("--finetune", default="",
                   help="pretrained MAE: orbax ckpt dir, .pth, or .npz")
    p.add_argument("--eval", action="store_true")
    # Size overrides (match a nonstandard pretrained encoder, e.g. the
    # reference's "tiny"/"small" presets, models_mae/__init__.py:23-40)
    p.add_argument("--embed_dim", default=None, type=int)
    p.add_argument("--depth", default=None, type=int)
    p.add_argument("--num_heads", default=None, type=int)
    # Optimization (main_finetune.py:94-187)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--warmup_epochs", default=5, type=int)
    p.add_argument("--batch_size", default=512, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--blr", default=1e-3, type=float)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--layer_decay", default=0.75, type=float)
    p.add_argument("--clip_grad", default=None, type=float)
    p.add_argument("--adam_mu_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="dtype of Adam's first moment (bfloat16 halves its "
                        "HBM). Default fp32 = reference numerics")
    p.add_argument("--adam_nu_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="dtype of Adam's second moment (train/optim."
                        "scale_by_adam_moment_dtypes). Default fp32 = "
                        "reference numerics")
    # Augmentation (main_finetune.py:188-268)
    p.add_argument("--smoothing", default=0.1, type=float)
    p.add_argument("--mixup", default=0.0, type=float)
    p.add_argument("--cutmix", default=0.0, type=float)
    p.add_argument("--mixup_prob", default=1.0, type=float)
    p.add_argument("--mixup_switch_prob", default=0.5, type=float)
    p.add_argument("--cutmix_minmax", default=None, type=float, nargs=2,
                   help="min/max cut fraction; overrides --cutmix alpha and "
                        "enables cutmix (main_finetune.py:240-249)")
    p.add_argument("--mixup_mode", default="batch",
                   choices=["batch", "pair", "elem"],
                   help="timm Mixup mode (main_finetune.py:264-269)")
    p.add_argument("--color_jitter", default=None, type=float,
                   help="ColorJitter factor; only when --aa is unset "
                        "(main_finetune.py:190-195)")
    p.add_argument("--aa", default=None,
                   help="RandAugment policy, e.g. rand-m9-mstd0.5 "
                        "(main_finetune.py:197-210; the reference declares "
                        "but never consumes this — functional here)")
    p.add_argument("--reprob", default=0.0, type=float,
                   help="RandomErasing probability (main_finetune.py:212)")
    p.add_argument("--remode", default="pixel", choices=["pixel", "const"])
    p.add_argument("--recount", default=1, type=int)
    p.add_argument("--ckpt_interval", default=20, type=int)
    p.add_argument("--eval_interval", default=1, type=int,
                   help="run the full-val-set eval every N epochs (plus the "
                        "final epoch). The reference evaluates every epoch "
                        "(main_finetune.py:653-659); at production val-set "
                        "sizes that dominates short-epoch runs")
    p.add_argument("--save_every", dest="ckpt_interval", type=int,
                   default=argparse.SUPPRESS,
                   help="reference alias for --ckpt_interval "
                        "(main_finetune.py --save_every)")
    p.add_argument("--max_steps", default=None, type=int)
    p.add_argument("--unroll_blocks", action="store_true",
                   help="unrolled layer loop (faster steps, slower compile)")
    add_data_args(p, pretrain=False)
    add_runtime_args(p)
    add_reference_compat_args(p, "finetune")
    return p


def load_pretrained_encoder(path: str, vcfg, params):
    """Overlay a pretrained MAE encoder onto fresh classifier params.
    Handles our Orbax dirs, portable .npz exports, and reference .pth."""
    from cross_scale_mae_tpu.utils.torch_import import (
        mae_encoder_to_classifier,
        merge_pretrained,
    )

    if path.endswith(".pth"):
        from cross_scale_mae_tpu.configs import MAEConfig, get_mae_config
        from cross_scale_mae_tpu.utils.torch_import import import_mae_checkpoint

        mae_cfg = get_mae_config(
            "mae_vit_base",
            dim_model=vcfg.embed_dim,
            encoder_num_layers=vcfg.depth,
            encoder_num_heads=vcfg.num_heads,
            input_size=vcfg.input_size, patch_size=vcfg.patch_size,
        )
        mae_params = import_mae_checkpoint(path, mae_cfg)
    elif path.endswith(".npz"):
        from cross_scale_mae_tpu.utils.checkpoint import load_params_npz

        # Template from a throwaway init with matching dims is not available
        # here; .npz stores its own config.
        import numpy as _np

        data = _np.load(path, allow_pickle=False)
        from cross_scale_mae_tpu.configs import MAEConfig
        from cross_scale_mae_tpu.models import mae_init

        cfg_json = bytes(data["__config__"]).decode()
        mae_cfg = MAEConfig.from_json(cfg_json)
        template, _ = mae_init(jax.random.key(0), mae_cfg)
        mae_params, _ = load_params_npz(path, template)
    else:
        from cross_scale_mae_tpu.viz.recon import prepare_model

        mae_params, _, mae_cfg = prepare_model(path)
    pre, missing = mae_encoder_to_classifier(mae_params, vcfg)
    # Resolution transfer: reference interpolates pos_embed
    # (main_finetune.py:589); ours is freshly-initialized sin-cos at the
    # target grid already, so only grid-shape params need checking.
    if pre["patch_embed"]["kernel"].shape != params["patch_embed"]["kernel"].shape:
        rank0_print("patch_embed shape mismatch; keeping fresh init")
        pre.pop("patch_embed")
    merged = merge_pretrained(params, pre)
    rank0_print(f"loaded pretrained encoder from {path}; fresh: {missing}")
    return merged


def evaluate(
    eval_step, state, loader, num_classes, epoch=0,
    *, batch_size=None, sharding=None,
) -> dict:
    """Full evaluation epoch (engine_finetune.py:127-236): acc1/acc5,
    macro/micro F1, mIoU from a streaming confusion matrix.

    The ragged final batch (eval keeps drop_last=False) is padded to the
    static ``batch_size`` with a validity mask, so the whole epoch is ONE
    XLA program; ``sharding`` spreads eval batches over the mesh instead of
    defaulting everything onto device 0."""
    cm = ConfusionMatrix(num_classes)
    losses, acc1s, acc5s, ns = [], [], [], []
    from cross_scale_mae_tpu.data.loader import host_local_to_global

    put = (lambda x: host_local_to_global(x, sharding)) \
        if sharding is not None else jnp.asarray

    def run_batch(imgs, labels):
        n = len(labels)
        bs = batch_size or n
        labels_padded = labels
        if n < bs:
            pad = bs - n
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
            )
            labels_padded = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
        # Always pass the mask so full and padded batches share one trace.
        valid = put(np.arange(bs) < n)
        out = eval_step(state.params, state.model_state, put(imgs),
                        put(labels_padded), valid)
        # out["cm"] is the GLOBAL (C, C) count matrix for this collective
        # batch (replicated across hosts), already valid-masked in-graph —
        # so hosts must accumulate it even for their fully-padded sync
        # batches, which carry other hosts' real rows.
        cm.mat += np.asarray(out["cm"], np.float64).round().astype(np.int64)
        # loss/acc are GLOBAL valid-weighted means (replicated scalars);
        # weight by the global valid count. An all-invalid sync batch has
        # n_global == 0 batch-wide only if every host padded — guard nan.
        n_global = float(out["n"])
        if n_global:
            losses.append(float(out["loss"]) * n_global)
            acc1s.append(float(out["acc1"]) * n_global)
            acc5s.append(float(out["acc5"]) * n_global)
            ns.append(n_global)

    steps_done = 0
    for imgs, labels in loader.epoch(epoch):
        run_batch(imgs, labels)
        steps_done += 1
    # Multi-host step sync: with drop_last=False, strided shards can differ
    # by one batch. Each eval_step is a COLLECTIVE program, so hosts with
    # fewer local batches must still participate — feed fully-invalid
    # padded batches up to the largest shard's count or the job hangs.
    if batch_size and sharding is not None:
        extra = loader.max_shard_steps() - steps_done
        ds = loader.dataset
        for _ in range(max(extra, 0)):
            run_batch(
                np.zeros((0, ds.canvas_size, ds.canvas_size, ds.in_c),
                         np.uint8),
                np.zeros((0,), np.int32),
            )
    n = max(sum(ns), 1)
    return {
        "loss": sum(losses) / n,
        "acc1": 100.0 * sum(acc1s) / n,
        "acc5": 100.0 * sum(acc5s) / n,
        "macro_f1": 100.0 * cm.f1("macro"),
        "micro_f1": 100.0 * cm.f1("micro"),
        "miou": 100.0 * cm.miou(),
    }


def main(args) -> dict:
    apply_reference_compat(args, "finetune")
    validate_parallel_args(args)
    ctx = setup_runtime(args)
    mesh = ctx["mesh"]

    syn_kw = (
        {"num_classes": args.nb_classes}
        if args.dataset_type == "synthetic" else {}
    )
    train_ds = build_dataset(
        args.dataset_type, True, train_path=args.train_path,
        test_path=args.test_path, input_size=args.input_size,
        canvas_scale=args.canvas_scale, masked_bands=args.masked_bands,
        dropped_bands=args.dropped_bands, synthetic_len=args.synthetic_len,
        **syn_kw,
    )
    eval_ds = build_dataset(
        args.dataset_type, False, train_path=args.train_path,
        test_path=args.test_path, input_size=args.input_size,
        canvas_scale=1.0 / 0.875 if args.input_size <= 224 else 1.0,
        masked_bands=args.masked_bands, dropped_bands=args.dropped_bands,
        synthetic_len=max(args.synthetic_len // 4, 64), **syn_kw,
    )
    num_classes = args.nb_classes or train_ds.num_classes

    overrides = {
        k: v for k, v in dict(
            embed_dim=args.embed_dim, depth=args.depth, num_heads=args.num_heads
        ).items() if v is not None
    }
    vcfg = get_vit_config(
        args.model, input_size=args.input_size, patch_size=args.patch_size,
        num_classes=num_classes, global_pool=args.global_pool,
        drop_path_rate=args.drop_path, compute_dtype=args.compute_dtype,
        attention_impl=args.attention_impl, remat=args.remat, gelu=args.gelu,
        input_channels=train_ds.in_c, scan_blocks=not args.unroll_blocks,
        sequence_parallel=args.sequence_parallel,
        **overrides,
    )
    tcfg = TrainConfig(
        epochs=args.epochs, warmup_epochs=args.warmup_epochs,
        batch_size=args.batch_size, accum_iter=args.accum_iter,
        blr=args.blr, lr=args.lr, min_lr=args.min_lr,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        layer_decay=args.layer_decay, label_smoothing=args.smoothing,
        mixup=args.mixup, cutmix=args.cutmix, mixup_prob=args.mixup_prob,
        mixup_switch_prob=args.mixup_switch_prob,
        mixup_mode=args.mixup_mode,
        cutmix_minmax=(tuple(args.cutmix_minmax)
                       if args.cutmix_minmax else None),
        seed=args.seed,
    )

    per_host_batch = args.batch_size // jax.process_count()
    # accum_iter loader batches per optimizer step (reference semantics) —
    # keeps the lr rule lr = blr * batch_size*accum_iter/256 exact.
    train_loader = make_loader(
        args, train_ds, per_host_batch * args.accum_iter, seed=args.seed
    )
    eval_loader = make_loader(
        args, eval_ds, per_host_batch, is_train=False, seed=args.seed
    )
    steps_per_epoch = max(train_loader.steps_per_epoch(), 1)
    lr = tcfg.resolved_lr(args.batch_size * args.accum_iter)
    rank0_print(
        f"finetune {args.model}: {len(train_ds)} train / {len(eval_ds)} eval, "
        f"{num_classes} classes, lr {lr:.3e}, layer_decay {args.layer_decay}"
    )

    schedule = warmup_half_cosine(
        lr, args.min_lr, args.warmup_epochs, args.epochs, steps_per_epoch
    )
    params, mstate = vit_init(jax.random.key(args.seed), vcfg)
    if args.finetune:
        params = load_pretrained_encoder(args.finetune, vcfg, params)
        # Head re-init (main_finetune.py:618): trunc_normal(2e-5).
        params["head"]["kernel"] = 2e-5 * jax.random.truncated_normal(
            jax.random.key(args.seed + 2), -2.0, 2.0,
            params["head"]["kernel"].shape, jnp.float32,
        )
    tx = build_optimizer(
        params, schedule, weight_decay=args.weight_decay,
        b1=0.9, b2=0.999, clip_grad=args.clip_grad,
        layer_decay=args.layer_decay, depth=vcfg.depth,
        no_decay_names=("pos_embed", "cls_token"),  # timm no_weight_decay
        mu_dtype=args.adam_mu_dtype, nu_dtype=args.adam_nu_dtype,
    )
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(
        mesh, state, tensor_parallel=args.model_parallel > 1, fsdp=args.fsdp
    )

    # Mid-run restore (util/misc.py:382-411: model+optimizer+epoch; the
    # reference wires --resume for all three entry points).
    state, start_epoch, max_acc = restore_classifier_run(args, state)
    if args.start_epoch is not None:
        start_epoch = args.start_epoch

    mean, std = train_ds.mean, train_ds.std
    augment = make_finetune_augment(
        mean, std, args.input_size, normalize=train_ds.normalize_on_device,
        dtype=args.compute_dtype, rot90=(args.dataset_type == "naip"),
        color_jitter=args.color_jitter, aa=args.aa,
        reprob=args.reprob, remode=args.remode, recount=args.recount,
    )
    preprocess = make_eval_preprocess(
        mean, std, args.input_size, normalize=eval_ds.normalize_on_device,
        dtype=args.compute_dtype,
    )
    train_step = make_classify_train_step(
        vcfg, tcfg, schedule, augment=augment, mesh=mesh
    )
    eval_step = make_eval_step(vcfg, preprocess=preprocess, mesh=mesh)
    data_sharding = batch_sharding(mesh)

    if args.eval:
        stats = evaluate(eval_step, state, eval_loader, num_classes,
                         batch_size=per_host_batch, sharding=data_sharding)
        rank0_print(f"eval: {stats}")
        return stats

    run_name = encode_run_name(
        ft=args.model, in_sz=args.input_size, lr=lr, ld=args.layer_decay,
        ds=args.dataset_type,
    )
    from cross_scale_mae_tpu.utils.logging import auto_output_dir

    # +N anti-clobber suffix (main_pretrain.py:471-491)
    output_dir = auto_output_dir(args.output_dir, run=run_name)
    logger = RunLogger(output_dir, args.use_tensorboard, args.use_wandb,
                       args.wandb_project, run_name,
                       wandb_entity=args.wandb_entity,
                       wandb_id=args.wandb_id)

    from cross_scale_mae_tpu.data.loader import device_prefetch

    rng = jax.random.key(args.seed + 1)
    total_steps = 0
    prev_loss = None
    for epoch in range(start_epoch, args.epochs):
        mlog = MetricLogger(print_fn=rank0_print)
        for it, (batch, labels) in enumerate(
            mlog.log_every(
                device_prefetch(train_loader.epoch(epoch), data_sharding),
                args.log_interval, header=f"Epoch [{epoch}]",
                total=steps_per_epoch,
            )
        ):
            state, metrics = train_step(state, batch, labels, rng)
            # Previous-step NaN abort: no pipeline stall, fires by step k+1.
            if prev_loss is not None and not np.isfinite(float(prev_loss)):
                raise FloatingPointError("Loss is NaN, stopping")
            prev_loss = metrics["loss"]
            if it % args.log_interval == 0:
                fetched = {k: float(v) for k, v in metrics.items()}
                mlog.update(**fetched)
            total_steps += 1
            if args.max_steps and total_steps >= args.max_steps:
                break
        if (epoch + 1) % args.eval_interval == 0 or epoch + 1 == args.epochs:
            stats = evaluate(eval_step, state, eval_loader, num_classes, epoch,
                             batch_size=per_host_batch, sharding=data_sharding)
            max_acc = max(max_acc, stats["acc1"])
            rank0_print(
                f"Epoch {epoch}: acc1 {stats['acc1']:.2f}% "
                f"acc5 {stats['acc5']:.2f}% "
                f"f1 {stats['macro_f1']:.2f} max_acc {max_acc:.2f}%"
            )
            logger.log_epoch({"epoch": epoch, **stats, "max_acc": max_acc})
        if (epoch + 1) % args.ckpt_interval == 0 or epoch + 1 == args.epochs:
            from cross_scale_mae_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(output_dir, "checkpoints"),
                int(jax.device_get(state.step)), state,
                config_json=vcfg.to_json(),
                extra={"epoch": epoch, "max_acc": max_acc},
            )
        if args.max_steps and total_steps >= args.max_steps:
            break
    # Final-step NaN check: the previous-step abort fires at k+1, which
    # never comes for the LAST step — without this a NaN final step would
    # silently produce a NaN checkpoint + garbage eval (mirrors
    # cli/pretrain.py's post-loop check).
    if prev_loss is not None and not np.isfinite(float(prev_loss)):
        raise FloatingPointError(f"Loss is {float(prev_loss)} at final step")
    logger.close()
    return {"max_acc": max_acc, "steps": total_steps, "output_dir": output_dir}


if __name__ == "__main__":
    import argparse as _ap

    _parser = _ap.ArgumentParser(parents=[get_args_parser()])
    main(_parser.parse_args())
