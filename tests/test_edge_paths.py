"""Edge-path coverage: multiband (Sentinel-style) models, ssim-loss training,
eval-only CLI mode (the reference's --eval path crashes, SURVEY defect #8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config, get_vit_config
from cross_scale_mae_tpu.models import mae_init, mae_loss_fn, vit_apply, vit_init


class TestMultiband:
    def test_mae_13_channels(self):
        cfg = get_mae_config(
            "mae_vit_tiny_MsLd", input_size=16, patch_size=8,
            input_channels=13, compute_dtype="float32",
        )
        assert cfg.patch_dim == 64 * 13
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 16, 13)).astype(np.float32)
        )
        out = mae_loss_fn(params, state, cfg, imgs, jax.random.key(1))
        assert np.isfinite(float(out.loss))
        assert out.pred.shape == (2, 4, 64 * 13)

    def test_classifier_13_channels(self):
        cfg = get_vit_config(
            "vit_base_patch16", input_size=16, patch_size=8, depth=2,
            embed_dim=64, num_heads=4, num_classes=10, input_channels=13,
            compute_dtype="float32",
        )
        params, state = vit_init(jax.random.key(0), cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 16, 13)).astype(np.float32)
        )
        logits, _ = vit_apply(params, state, cfg, imgs)
        assert logits.shape == (2, 10)


class TestSsimLossTraining:
    @pytest.mark.slow
    def test_ssim_loss_step_differentiable(self):
        cfg = get_mae_config(
            "mae_vit_tiny", input_size=16, patch_size=8, loss="ssim",
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 16, 16, 3)).astype(np.float32)
        )

        def loss_fn(p):
            return mae_loss_fn(p, state, cfg, imgs, jax.random.key(1)).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        gnorm = float(
            sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)) ** 0.5
        )
        assert np.isfinite(gnorm) and gnorm > 0

    def test_mse_ssim_combo(self):
        cfg = get_mae_config(
            "mae_vit_tiny", input_size=16, patch_size=8, loss="mse_ssim",
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 16, 16, 3)).astype(np.float32)
        )
        out = mae_loss_fn(params, state, cfg, imgs, jax.random.key(1))
        assert np.isfinite(float(out.loss))


@pytest.mark.slow
class TestEvalOnlyCli:
    def test_finetune_eval_mode(self, tmp_path):
        # The reference's --eval path raises (main_finetune.py:766 calls
        # evaluate without args, engine_finetune.py:129-130) — ours works.
        from cross_scale_mae_tpu.cli import finetune

        args = finetune.get_args_parser().parse_args([
            "--model", "vit_base_patch16", "--embed_dim", "64", "--depth", "2",
            "--num_heads", "4", "--input_size", "16", "--patch_size", "8",
            "--dataset_type", "synthetic", "--synthetic_len", "64",
            "--nb_classes", "4", "--batch_size", "16", "--eval",
            "--output_dir", str(tmp_path), "--compute_dtype", "float32",
        ])
        stats = finetune.main(args)
        assert set(stats) >= {"loss", "acc1", "acc5", "macro_f1", "micro_f1",
                              "miou"}
        assert 0 <= stats["acc1"] <= 100
