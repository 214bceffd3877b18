"""Linear-probe entry point.

Redesign of ``main_linprobe.py`` (749 LoC): frozen backbone (optax-masked
optimizer = main_linprobe.py:521-525 freeze-all-but-head), frozen-affine
BatchNorm before the head (:517-520), LARS on the head only with
blr=0.1·eff_bs/256 and weight decay 0 (:557-558, :119-142).

Usage:
    python -m cross_scale_mae_tpu.cli.linprobe --model vit_base_patch16 \
        --finetune <ckpt> --dataset_type fmow_rgb --train_path train.csv \
        --test_path val.csv --batch_size 1024 --epochs 50 --input_size 128
"""

from __future__ import annotations

import argparse
import os

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
from cross_scale_mae_tpu.cli.finetune import evaluate, load_pretrained_encoder
from cross_scale_mae_tpu.configs import TrainConfig, get_vit_config
from cross_scale_mae_tpu.data import build_dataset
from cross_scale_mae_tpu.models import vit_init
from cross_scale_mae_tpu.ops.augment import make_eval_preprocess, make_pretrain_augment
from cross_scale_mae_tpu.parallel import batch_sharding, shard_train_state
from cross_scale_mae_tpu.train import TrainState, build_optimizer, warmup_half_cosine
from cross_scale_mae_tpu.train.classify import make_classify_train_step, make_eval_step
from cross_scale_mae_tpu.utils.logging import RunLogger, rank0_print
from cross_scale_mae_tpu.utils.metrics import MetricLogger


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Cross-Scale MAE linear probing (TPU)",
                                add_help=False)
    p.add_argument("--model", default="vit_base_patch16")
    p.add_argument("--input_size", default=128, type=int)  # linprobe.sh:8
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--global_pool", action="store_true", default=False)
    p.add_argument("--cls_token", action="store_false", dest="global_pool",
                   help="classify from the cls token (reference flag name; "
                        "the linprobe default)")
    p.add_argument("--finetune", default="")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--embed_dim", default=None, type=int)
    p.add_argument("--depth", default=None, type=int)
    p.add_argument("--num_heads", default=None, type=int)
    # linprobe.sh:6-9 + main_linprobe.py:119-142 defaults
    p.add_argument("--epochs", default=50, type=int)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--batch_size", default=1024, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--blr", default=0.1, type=float)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--ckpt_interval", default=20, type=int)
    p.add_argument("--eval_interval", default=1, type=int,
                   help="run the full-val-set eval every N epochs (plus the "
                        "final epoch); see cli/finetune.py")
    p.add_argument("--save_every", dest="ckpt_interval", type=int,
                   default=argparse.SUPPRESS,
                   help="reference alias for --ckpt_interval "
                        "(main_finetune.py --save_every)")
    p.add_argument("--max_steps", default=None, type=int)
    p.add_argument("--unroll_blocks", action="store_true",
                   help="unrolled layer loop (faster steps, slower compile)")
    add_data_args(p, pretrain=False)
    add_runtime_args(p)
    add_reference_compat_args(p, "linprobe")
    return p


def main(args) -> dict:
    apply_reference_compat(args, "linprobe")
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
        use_bn_head=True,  # frozen-affine BN head (main_linprobe.py:517-520)
        compute_dtype=args.compute_dtype, attention_impl=args.attention_impl,
        gelu=args.gelu,
        input_channels=train_ds.in_c, scan_blocks=not args.unroll_blocks,
        sequence_parallel=args.sequence_parallel,
        **overrides,
    )
    # Linear probe keeps only minimal augmentation (RandomResizedCrop +
    # flips); no mixup/smoothing (loss must be plain CE,
    # main_linprobe.py:562-565).
    tcfg = TrainConfig(
        epochs=args.epochs, warmup_epochs=args.warmup_epochs,
        batch_size=args.batch_size, accum_iter=args.accum_iter,
        blr=args.blr, lr=args.lr, min_lr=args.min_lr, weight_decay=0.0,
        label_smoothing=0.0, mixup=0.0, cutmix=0.0, optimizer="lars",
        seed=args.seed,
    )

    per_host_batch = args.batch_size // jax.process_count()
    # accum_iter loader batches per optimizer step (reference semantics) —
    # keeps the lr rule lr = blr * batch_size*accum_iter/256 exact.
    train_loader = make_loader(
        args, train_ds, per_host_batch * args.accum_iter, seed=args.seed
    )
    eval_loader = make_loader(args, eval_ds, per_host_batch, is_train=False,
                              seed=args.seed)
    steps_per_epoch = max(train_loader.steps_per_epoch(), 1)
    lr = tcfg.resolved_lr(args.batch_size * args.accum_iter)
    rank0_print(
        f"linprobe {args.model}: {len(train_ds)} train, lr {lr:.3e} (LARS)"
    )

    schedule = warmup_half_cosine(
        lr, args.min_lr, args.warmup_epochs, args.epochs, steps_per_epoch
    )
    params, mstate = vit_init(jax.random.key(args.seed), vcfg)
    if args.finetune:
        params = load_pretrained_encoder(args.finetune, vcfg, params)
        # Head init trunc_normal(0.01) (main_linprobe.py:516).
        params["head"]["kernel"] = 0.01 * jax.random.truncated_normal(
            jax.random.key(args.seed + 2), -2.0, 2.0,
            params["head"]["kernel"].shape, jnp.float32,
        )
    # Freeze everything but the head (main_linprobe.py:521-525).
    trainable = jax.tree_util.tree_map_with_path(
        lambda path, leaf: str(getattr(path[0], "key", "")) == "head", params
    )
    tx = build_optimizer(
        params, schedule, optimizer="lars", weight_decay=0.0,
        frozen_mask=trainable,
    )
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(
        mesh, state, tensor_parallel=args.model_parallel > 1, fsdp=args.fsdp
    )

    # Mid-run restore (util/misc.py:382-411; reference wires --resume for
    # all three entry points).
    state, start_epoch, max_acc = restore_classifier_run(args, state)
    if args.start_epoch is not None:
        start_epoch = args.start_epoch

    mean, std = train_ds.mean, train_ds.std
    augment = make_pretrain_augment(
        mean, std, args.input_size, normalize=train_ds.normalize_on_device,
        dtype=args.compute_dtype, rot90=(args.dataset_type == "naip"),
    )
    preprocess = make_eval_preprocess(
        mean, std, args.input_size, normalize=eval_ds.normalize_on_device,
        dtype=args.compute_dtype,
    )
    # freeze_backbone cuts the gradient at the head boundary so XLA prunes
    # the backbone backward entirely (torch requires_grad=False semantics;
    # optax.masked alone still computed-and-discarded it — ~3x step cost).
    train_step = make_classify_train_step(
        vcfg, tcfg, schedule, augment=augment, freeze_backbone=True,
        mesh=mesh,
    )
    eval_step = make_eval_step(vcfg, preprocess=preprocess, mesh=mesh)
    data_sharding = batch_sharding(mesh)

    if args.eval:
        stats = evaluate(eval_step, state, eval_loader, num_classes,
                         batch_size=per_host_batch, sharding=data_sharding)
        rank0_print(f"eval: {stats}")
        return stats

    run_name = encode_run_name(
        lin=args.model, in_sz=args.input_size, lr=lr, ds=args.dataset_type
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
                f"max_acc {max_acc:.2f}%"
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
