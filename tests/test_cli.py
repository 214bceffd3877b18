"""CLI surface tests: parser defaults match the reference's canonical
hyperparameters; end-to-end smoke runs on the CPU mesh via main()."""

import json
import os

import numpy as np
import pytest


class TestParsers:
    def test_pretrain_defaults_match_reference(self):
        from cross_scale_mae_tpu.cli.pretrain import get_args_parser

        a = get_args_parser().parse_args([])
        # train.sh:3-7 / main_pretrain.py defaults
        assert a.model == "mae_vit_base_MsLdCeCd"
        assert a.epochs == 400 and a.warmup_epochs == 40
        assert a.batch_size == 512
        assert a.input_size == 128 and a.patch_size == 16
        assert a.mask_ratio == 0.75
        assert a.blr == 5e-5 and a.weight_decay == 0.05
        assert a.ckpt_interval == 25

    def test_finetune_defaults(self):
        from cross_scale_mae_tpu.cli.finetune import get_args_parser

        a = get_args_parser().parse_args([])
        # finetune.sh:7-8 / main_finetune.py:94-176
        assert a.input_size == 64 and a.patch_size == 8
        assert a.blr == 1e-3 and a.epochs == 100
        assert a.layer_decay == 0.75
        assert a.model == "vit_large_patch16"

    def test_linprobe_defaults(self):
        from cross_scale_mae_tpu.cli.linprobe import get_args_parser

        a = get_args_parser().parse_args([])
        # linprobe.sh:6-9 / main_linprobe.py:119-142
        assert a.epochs == 50 and a.batch_size == 1024
        assert a.input_size == 128 and a.blr == 0.1
        assert a.weight_decay == 0.0

    def test_model_registry_names(self):
        from cross_scale_mae_tpu.configs import get_mae_config, mae_model_names

        names = mae_model_names()
        assert "mae_vit_base_MsLdCeCd" in names
        assert "mae_vit_large" in names
        assert len(names) == 5 * 7
        for n in names:
            cfg = get_mae_config(n)
            assert cfg.dim_model > 0


@pytest.mark.slow
class TestEndToEnd:
    """Tiny full runs through main() on the CPU mesh (slow: ~1 min each)."""

    def test_pretrain_then_linprobe(self, tmp_path):
        from cross_scale_mae_tpu.cli import linprobe, pretrain

        out = str(tmp_path / "pt")
        args = pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
            "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
            "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
            "--ckpt_interval", "1", "--output_dir", out,
            "--compute_dtype", "float32", "--log_interval", "2",
        ])
        res = pretrain.main(args)
        assert res["steps"] == 4
        ckpt = os.path.join(res["output_dir"], "checkpoints")
        assert os.path.isdir(ckpt)

        args2 = linprobe.get_args_parser().parse_args([
            "--model", "vit_base_patch16", "--embed_dim", "128",
            "--depth", "4", "--num_heads", "8", "--input_size", "16",
            "--patch_size", "8", "--finetune", ckpt,
            "--dataset_type", "synthetic", "--synthetic_len", "64",
            "--nb_classes", "4", "--batch_size", "16", "--epochs", "1",
            "--warmup_epochs", "0", "--output_dir", str(tmp_path / "lin"),
            "--compute_dtype", "float32", "--log_interval", "2",
        ])
        res2 = linprobe.main(args2)
        assert 0.0 <= res2["max_acc"] <= 100.0

    def test_eval_interval_skips_epochs(self, tmp_path):
        """--eval_interval N evaluates every Nth epoch plus the final one
        (epochs 2, 5, 6 for interval 3 over 7 epochs); default 1 keeps the
        reference's every-epoch cadence (main_finetune.py:653-659)."""
        import json

        from cross_scale_mae_tpu.cli import finetune

        args = finetune.get_args_parser().parse_args([
            "--model", "vit_base_patch16", "--embed_dim", "32", "--depth",
            "1", "--num_heads", "2", "--input_size", "16", "--patch_size",
            "8", "--dataset_type", "synthetic", "--synthetic_len", "32",
            "--nb_classes", "3", "--batch_size", "16", "--epochs", "7",
            "--warmup_epochs", "1", "--eval_interval", "3",
            "--output_dir", str(tmp_path / "ei"),
            "--compute_dtype", "float32", "--log_interval", "2",
        ])
        res = finetune.main(args)
        with open(os.path.join(res["output_dir"], "log.jsonl")) as f:
            evals = [json.loads(l)["epoch"] for l in f if "acc1" in l]
        assert evals == [2, 5, 6], evals
        # max_acc still reflects the evaluated epochs only.
        assert 0.0 <= res["max_acc"] <= 100.0

    def test_finetune_resume_matches_uninterrupted(self, tmp_path):
        """Train 3 epochs straight vs. 1 epoch + kill + resume for 2 more:
        final metrics must match (VERDICT r1 #2; util/misc.py:382-411)."""
        from cross_scale_mae_tpu.cli import finetune

        common = [
            "--model", "vit_base_patch16", "--embed_dim", "64",
            "--depth", "2", "--num_heads", "4", "--input_size", "16",
            "--patch_size", "8", "--dataset_type", "synthetic",
            "--synthetic_len", "64", "--nb_classes", "4",
            "--batch_size", "16", "--warmup_epochs", "0",
            "--compute_dtype", "float32", "--log_interval", "2",
            "--smoothing", "0.0", "--ckpt_interval", "1",
        ]
        full = finetune.main(finetune.get_args_parser().parse_args(
            common + ["--epochs", "3", "--output_dir", str(tmp_path / "full")]
        ))

        part = finetune.main(finetune.get_args_parser().parse_args(
            common + ["--epochs", "1", "--output_dir", str(tmp_path / "part")]
        ))
        ckpt = os.path.join(part["output_dir"], "checkpoints")
        resumed = finetune.main(finetune.get_args_parser().parse_args(
            common + ["--epochs", "3", "--resume", ckpt,
                      "--output_dir", str(tmp_path / "resumed")]
        ))
        assert np.isclose(resumed["max_acc"], full["max_acc"], atol=1e-4), (
            resumed["max_acc"], full["max_acc"]
        )

    def test_linprobe_resume_restores_epoch(self, tmp_path):
        from cross_scale_mae_tpu.cli import linprobe

        common = [
            "--model", "vit_base_patch16", "--embed_dim", "64",
            "--depth", "2", "--num_heads", "4", "--input_size", "16",
            "--patch_size", "8", "--dataset_type", "synthetic",
            "--synthetic_len", "64", "--nb_classes", "4",
            "--batch_size", "16", "--warmup_epochs", "0",
            "--compute_dtype", "float32", "--log_interval", "2",
            "--ckpt_interval", "1",
        ]
        part = linprobe.main(linprobe.get_args_parser().parse_args(
            common + ["--epochs", "1", "--output_dir", str(tmp_path / "p")]
        ))
        ckpt = os.path.join(part["output_dir"], "checkpoints")
        resumed = linprobe.main(linprobe.get_args_parser().parse_args(
            common + ["--epochs", "2", "--resume", ckpt,
                      "--output_dir", str(tmp_path / "r")]
        ))
        # one epoch was skipped: exactly steps_per_epoch new steps ran
        assert resumed["steps"] == part["steps"]
        # max_acc carried over (can only stay or improve)
        assert resumed["max_acc"] >= part["max_acc"] - 1e-6


@pytest.mark.slow
class TestEmbed:
    def test_embed_from_pretrain_ckpt(self, tmp_path):
        """Serving path: extract features for a dataset from a pretrain
        checkpoint — stable across runs, ragged tail handled, meta written."""
        import numpy as np

        from cross_scale_mae_tpu.cli import embed, pretrain

        out = str(tmp_path / "pt")
        pretrain.main(pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny", "--dataset_type", "synthetic",
            "--synthetic_len", "32", "--input_size", "16", "--patch_size", "8",
            "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
            "--ckpt_interval", "1", "--output_dir", out,
            "--compute_dtype", "float32", "--log_interval", "2",
        ]))
        run_dir = next(p for p in (tmp_path / "pt").iterdir() if p.is_dir())
        ckpt = str(run_dir / "checkpoints")

        def run(dest, pool):
            args = embed.get_args_parser().parse_args([
                "--ckpt", ckpt, "--dataset_type", "synthetic",
                "--synthetic_len", "21",  # ragged vs batch 16
                "--batch_size", "16", "--pool", pool,
                "--output_dir", str(tmp_path / dest),
            ])
            return embed.main(args)

        res = run("e1", "cls")
        assert res["count"] == 21
        feats = np.load(tmp_path / "e1" / "features.npy")
        labels = np.load(tmp_path / "e1" / "labels.npy")
        assert feats.shape == (21, 128) and np.isfinite(feats).all()
        assert labels.shape == (21,)
        # Deterministic: same checkpoint + data => identical features.
        run("e2", "cls")
        np.testing.assert_array_equal(
            feats, np.load(tmp_path / "e2" / "features.npy")
        )
        # mean pooling differs from cls but shares the shape
        run("e3", "mean")
        f3 = np.load(tmp_path / "e3" / "features.npy")
        assert f3.shape == feats.shape and not np.array_equal(f3, feats)
