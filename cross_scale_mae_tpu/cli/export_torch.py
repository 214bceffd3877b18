"""Checkpoint interchange: our pretrain checkpoint -> reference ``.pth``.

The inverse of the ``--finetune``-time torch importer: exports a TPU
pretrain run as a checkpoint the reference stack consumes natively —
``main_finetune.py`` / ``main_linprobe.py`` key-remap it like their own
pretrain checkpoints (``main_linprobe.py:452-512``), and
``util/viz.py:prepare_model`` rebuilds the model from the stored ``args``
(``util/viz.py:71-84``). Format details in ``utils/torch_export.py``.

Usage:
    python -m cross_scale_mae_tpu.cli.export_torch \
        --ckpt <run>/checkpoints --output /tmp/checkpoint-399.pth
"""

from __future__ import annotations

import argparse
import json
import os


def get_args_parser():
    p = argparse.ArgumentParser(
        "Cross-Scale MAE torch-checkpoint export", add_help=False)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir (config travels with it); pretrain "
                        "runs export as MAE .pth, finetune/linprobe runs as "
                        "models_vit classifier .pth (auto-detected)")
    p.add_argument("--step", default=None, type=int,
                   help="checkpoint step (default: newest)")
    p.add_argument("--output", required=True, help="output .pth path")
    p.add_argument("--epoch", default=None, type=int,
                   help="epoch number stored in the .pth (reference resume "
                        "semantics); default: the checkpoint's epoch if "
                        "recorded, else 0")
    p.add_argument("--model_name", default=None,
                   help="override the reference factory name stored in "
                        "args (required for off-registry custom sizes)")
    return p


def _prefer_cpu() -> None:
    """Weight transcription needs no accelerator; on the tunneled-TPU
    platform a fresh process would otherwise pay minutes of compile for
    the template init. Only safe before first backend use."""
    try:
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            import jax

            jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # fall back to the default platform


def main(args) -> dict:
    _prefer_cpu()
    from cross_scale_mae_tpu.utils.checkpoint import latest_step
    from cross_scale_mae_tpu.utils.torch_export import (
        classifier_args,
        classifier_state_dict,
        mae_state_dict,
        reference_args,
        save_torch_checkpoint,
    )

    from cross_scale_mae_tpu.utils.checkpoint import (
        checkpoint_kind,
        checkpoint_meta,
        restore_classifier_host,
    )

    step = args.step if args.step is not None else latest_step(args.ckpt)
    assert step is not None, f"no checkpoints in {args.ckpt}"
    meta = checkpoint_meta(args.ckpt, step)

    if checkpoint_kind(meta) == "classifier":
        params, model_state, cfg = restore_classifier_host(args.ckpt, step)
        sd = classifier_state_dict(params, cfg, model_state)
        ref_args = classifier_args(cfg, args.model_name)
    else:
        from cross_scale_mae_tpu.viz import prepare_model

        params, model_state, cfg = prepare_model(args.ckpt, step)
        sd = mae_state_dict(params, cfg, model_state)
        ref_args = reference_args(cfg, args.model_name)

    epoch = args.epoch if args.epoch is not None else int(
        meta.get("epoch", 0))

    save_torch_checkpoint(args.output, sd, ref_args, epoch=epoch)
    result = {
        "output": args.output,
        "model": ref_args["model"],
        "epoch": epoch,
        "n_tensors": len(sd),
        "size_bytes": os.path.getsize(args.output),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(get_args_parser().parse_args())
