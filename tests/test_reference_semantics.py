"""--reference_semantics preset: one switch must compose every
parity-relevant deviation back to reference numerics (VERDICT r2 weak #3).

Components (each individually verified elsewhere; this file pins the
composition): exact-erf GELU (models/layers.py), batch-shared crop box
(MAE_ViT_MsLd.py:29-35 semantics), shard_map DDP (per-device NT-Xent
negatives / predictor-BN stats, MAE_ViT_MsLdCeCd.py:51-69).
"""

import json
import os

import pytest


def _parse(extra):
    from cross_scale_mae_tpu.cli.pretrain import (
        apply_reference_semantics,
        get_args_parser,
    )

    args = get_args_parser().parse_args(extra)
    apply_reference_semantics(args)
    return args


def test_preset_composes_all_flags():
    args = _parse(["--reference_semantics"])
    assert args.gelu == "exact"
    assert args.batch_crop is True
    assert args.ddp_mode == "shard_map"


def test_preset_off_keeps_tpu_defaults():
    args = _parse([])
    assert args.gelu == "tanh"
    assert args.batch_crop is False
    assert args.ddp_mode == "gspmd"


def test_preset_rejects_model_parallel():
    with pytest.raises(SystemExit, match="reference_semantics"):
        _parse(["--reference_semantics", "--model_parallel", "2"])
    with pytest.raises(SystemExit, match="reference_semantics"):
        _parse(["--reference_semantics", "--zero1"])


def test_preset_resolves_into_model_config():
    from cross_scale_mae_tpu.configs import get_mae_config

    args = _parse(["--reference_semantics"])
    cfg = get_mae_config(
        args.model, gelu=args.gelu,
        ms_per_sample_crop=not args.batch_crop,
    )
    assert cfg.gelu == "exact"
    assert cfg.ms_per_sample_crop is False


@pytest.mark.slow
def test_preset_end_to_end_one_epoch(tmp_path):
    """Full pretrain main() under the preset: exercises the shard_map step
    with batch-shared crop + exact GELU, and the run config must record the
    composition for later parity audits."""
    from cross_scale_mae_tpu.cli import pretrain

    out = str(tmp_path / "refsem")
    args = pretrain.get_args_parser().parse_args([
        "--reference_semantics",
        "--model", "mae_vit_tiny_MsLdCeCd", "--dataset_type", "synthetic",
        "--synthetic_len", "32", "--input_size", "16", "--patch_size", "8",
        "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
        "--ckpt_interval", "1", "--output_dir", out,
        "--compute_dtype", "float32", "--log_interval", "1",
    ])
    res = pretrain.main(args)
    assert res["steps"] == 2
    cfg = json.load(open(os.path.join(res["output_dir"], "config.json")))
    assert cfg["gelu"] == "exact"
    assert cfg["ms_per_sample_crop"] is False
