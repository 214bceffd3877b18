"""Reference-launcher compatibility: the exact command lines the reference's
shell launchers emit (train.sh:35-46, train_distributed.sh:34-44,
finetune.sh:56-68, linprobe.sh:55-68) must parse and resolve against our
entry points, flag for flag. Mapping table: docs/MIGRATION.md."""

import pytest


def _pretrain_args(extra=()):
    from cross_scale_mae_tpu.cli.pretrain import get_args_parser

    return get_args_parser().parse_args(list(extra))


class TestReferenceLaunchers:
    def test_train_sh_command_line_parses(self):
        # train.sh:35-46 verbatim (usage example flags included,
        # train.sh:15: --use_xformers --wandb_project satmae --device cuda:0)
        a = _pretrain_args([
            "--train_path", "../fmow_rgb/train.csv",
            "--dataset_type", "fmow_rgb",
            "--output_dir_base", "weights",
            "--model", "mae_vit_base_MsLdCeCd",
            "--loss", "mse",
            "--attn_name", "scaled_dot_product",
            "--input_size", "128",
            "--patch_size", "16",
            "--batch_size", "512",
            "--epochs", "400",
            "--use_xformers",
            "--wandb_project", "satmae",
            "--device", "cuda:0",
        ])
        assert a.output_dir_base == "weights"
        assert a.attn_name == "scaled_dot_product"

    def test_finetune_sh_command_line_parses(self):
        from cross_scale_mae_tpu.cli.finetune import get_args_parser

        # finetune.sh:56-68 verbatim
        a = get_args_parser().parse_args([
            "--train_path", "train.csv", "--test_path", "val.csv",
            "--output_dir_base", "weights/finetune_fmowrgb",
            "--model", "vit_large_patch16",
            "--model_type", "",
            "--input_size", "64", "--patch_size", "8",
            "--batch_size", "512",
            "--finetune", "weights/cross_scale_mae_large_pretrain.pth",
            # finetune.sh:46 passes the short name "rgb" (the reference's
            # own build_fmow_dataset crashes on it, util/datasets.py:624;
            # we resolve it to fmow_rgb in apply_reference_compat).
            "--dataset_type", "rgb",
            "--wandb_project", "satmae_finetune",
            # flags main_finetune.py declares that a user may also pass
            "--dist_eval", "--transform_checkpoint_keys", "--use_psa",
            "--resplit", "--world_size", "8", "--dist_url", "env://",
            "--pin_mem", "--start_epoch", "3", "--wandb_id", "abc123",
        ])
        assert a.start_epoch == 3 and a.wandb_id == "abc123"

    def test_linprobe_sh_command_line_parses(self):
        from cross_scale_mae_tpu.cli.linprobe import get_args_parser

        # linprobe.sh:55-68 verbatim
        a = get_args_parser().parse_args([
            "--train_path", "train.csv", "--test_path", "val.csv",
            "--output_dir_base", "weights/linprobe",
            "--model", "vit_base_patch16",
            "--loss", "classification_cross",
            "--model_type", "",
            "--input_size", "128", "--patch_size", "16",
            "--batch_size", "1024", "--epochs", "50",
            "--finetune", "weights/cross_scale_mae_base_pretrain.pth",
            "--dataset_type", "rgb",  # linprobe.sh:44 short name
            "--wandb_project", "satmae_linprobe",
            "--norm_pix_loss", "--spatial_mask", "--use_xformers",
            "--print_level", "1",
        ])
        assert a.loss == "classification_cross"


class TestApplyCompat:
    def test_output_dir_base_joined(self):
        from cross_scale_mae_tpu.cli.common import apply_reference_compat

        a = _pretrain_args(["--output_dir_base", "weights",
                            "--output_dir", "run1"])
        apply_reference_compat(a, "pretrain")
        import os

        assert a.output_dir == os.path.join("weights", "run1")

    def test_attn_name_aliases_attention(self):
        from cross_scale_mae_tpu.cli.common import apply_reference_compat

        a = _pretrain_args(["--attn_name", "linformer"])
        apply_reference_compat(a, "pretrain")
        assert a.attention == "linformer"

    def test_dataset_type_short_names_resolve(self):
        from cross_scale_mae_tpu.cli.common import apply_reference_compat
        from cross_scale_mae_tpu.cli.finetune import get_args_parser

        a = get_args_parser().parse_args(["--dataset_type", "rgb"])
        apply_reference_compat(a, "finetune")
        assert a.dataset_type == "fmow_rgb"
        a = get_args_parser().parse_args(["--dataset_type", "sentinel"])
        apply_reference_compat(a, "finetune")
        assert a.dataset_type == "fmow_sentinel"

    def test_dataset_type_unimplemented_in_reference_rejected(self):
        # smart/spacenetv1/resisc45 are declared by the reference's
        # classifier parsers but its build_fmow_dataset has no loader for
        # them — parse succeeds (like the reference), then a clear error.
        from cross_scale_mae_tpu.cli.common import apply_reference_compat
        from cross_scale_mae_tpu.cli.linprobe import get_args_parser

        a = get_args_parser().parse_args(["--dataset_type", "spacenetv1"])
        with pytest.raises(ValueError, match="no loader"):
            apply_reference_compat(a, "linprobe")

    def test_attn_name_invalid_choice_rejected_at_cli(self):
        from cross_scale_mae_tpu.cli.common import apply_reference_compat

        a = _pretrain_args(["--attn_name", "linforrmer"])
        with pytest.raises(ValueError, match="invalid choice"):
            apply_reference_compat(a, "pretrain")

    def test_attn_name_shunted_rejected(self):
        from cross_scale_mae_tpu.cli.common import apply_reference_compat

        a = _pretrain_args(["--attn_name", "shunted"])
        with pytest.raises(ValueError, match="shunted"):
            apply_reference_compat(a, "pretrain")

    def test_ffn_name_non_mlp_rejected(self):
        # Mirrors the reference's own constraint (MAE_ViT_Baseline.py:69-70).
        from cross_scale_mae_tpu.cli.common import apply_reference_compat

        a = _pretrain_args(["--ffn_name", "FusedMLP"])
        with pytest.raises(ValueError, match="MLP"):
            apply_reference_compat(a, "pretrain")

    def test_linprobe_loss_constraint(self):
        # main_linprobe.py:562-565: only classification_cross.
        from cross_scale_mae_tpu.cli.common import apply_reference_compat
        from cross_scale_mae_tpu.cli.linprobe import get_args_parser

        a = get_args_parser().parse_args(["--loss", "mse"])
        with pytest.raises(ValueError, match="classification_cross"):
            apply_reference_compat(a, "linprobe")

    def test_noop_flags_do_not_mutate_semantics(self):
        from cross_scale_mae_tpu.cli.common import apply_reference_compat

        a = _pretrain_args(["--use_xformers", "--spatial_mask",
                            "--print_level", "2", "--world_size", "8",
                            "--pin_mem", "--dist_url", "env://"])
        before = (a.attention, a.output_dir, a.num_workers)
        apply_reference_compat(a, "pretrain")
        assert (a.attention, a.output_dir, a.num_workers) == before


@pytest.mark.slow
class TestStartEpochOverride:
    def test_pretrain_start_epoch_skips_epochs(self, tmp_path):
        from cross_scale_mae_tpu.cli import pretrain

        base = [
            "--dataset_type", "synthetic", "--synthetic_len", "32",
            "--model", "mae_vit_tiny", "--input_size", "32",
            "--patch_size", "8", "--batch_size", "16", "--epochs", "2",
            "--warmup_epochs", "0", "--num_workers", "2",
            "--output_dir", str(tmp_path / "a"),
        ]
        full = pretrain.main(pretrain.get_args_parser().parse_args(base))
        base[-1] = str(tmp_path / "b")
        skip = pretrain.main(pretrain.get_args_parser().parse_args(
            base + ["--start_epoch", "1"]))
        assert skip["steps"] == full["steps"] // 2
