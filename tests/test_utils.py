"""Utils tests: meters, confusion-matrix metrics, checkpointing, viz, logging."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.utils.metrics import (
    ConfusionMatrix,
    MetricLogger,
    SmoothedValue,
    accuracy_topk,
    calc_metric,
)


class TestMeters:
    def test_smoothed_value(self):
        v = SmoothedValue(window_size=3)
        for x in [1.0, 2.0, 3.0, 4.0]:
            v.update(x)
        assert v.value == 4.0
        assert v.median == 3.0
        assert v.global_avg == 2.5
        assert v.max == 4.0

    def test_metric_logger_iterates(self):
        log = MetricLogger(print_fn=lambda *a, **k: None)
        out = list(log.log_every(range(5), 2, header="t", total=5))
        assert out == list(range(5))
        log.update(loss=1.0)
        assert "loss" in str(log)


class TestClassificationMetrics:
    def test_accuracy_topk(self):
        logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.1, 0.2, 0.7]])
        labels = np.array([1, 1, 2])
        acc1, acc2 = accuracy_topk(logits, labels, (1, 2))
        np.testing.assert_allclose(acc1, 200 / 3)
        np.testing.assert_allclose(acc2, 100.0)

    def test_confusion_f1_against_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 5, 200)
        preds = np.where(rng.uniform(size=200) < 0.6, labels,
                         rng.integers(0, 5, 200))
        cm = ConfusionMatrix(5)
        cm.update(preds[:100], labels[:100])
        cm.update(preds[100:], labels[100:])
        np.testing.assert_allclose(
            cm.f1("macro"), sk.f1_score(labels, preds, average="macro"), atol=1e-9
        )
        np.testing.assert_allclose(
            cm.f1("micro"), sk.f1_score(labels, preds, average="micro"), atol=1e-9
        )
        np.testing.assert_allclose(
            cm.accuracy, sk.accuracy_score(labels, preds), atol=1e-9
        )
        np.testing.assert_allclose(
            cm.miou(),
            sk.jaccard_score(labels, preds, average="macro"), atol=1e-9,
        )

    def test_calc_metric_registry(self, rng_np):
        x = jnp.asarray(rng_np.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        assert calc_metric(x, x, "mse") == 0.0
        assert calc_metric(x, x, "ssd") == 0.0  # alias -> l2
        np.testing.assert_allclose(calc_metric(x, x, "ssim"), 1.0, atol=1e-5)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import optax

        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_init
        from cross_scale_mae_tpu.train import TrainState, build_optimizer
        from cross_scale_mae_tpu.utils.checkpoint import (
            latest_step,
            restore_checkpoint,
            save_checkpoint,
        )

        cfg = get_mae_config("mae_vit_tiny", input_size=16, patch_size=8)
        params, mstate = mae_init(jax.random.key(0), cfg)
        tx = build_optimizer(params, lambda s: 1e-3)
        state = TrainState.create(params, mstate, tx)
        state = state.replace(step=jnp.asarray(7, jnp.int32))

        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, 7, state, config_json=cfg.to_json(),
                        extra={"epoch": 3})
        assert latest_step(ckpt) == 7

        fresh = TrainState.create(*mae_init(jax.random.key(9), cfg), tx)
        restored, meta = restore_checkpoint(ckpt, fresh)
        assert int(restored.step) == 7
        assert meta["epoch"] == 3
        assert meta["config"]["dim_model"] == cfg.dim_model
        np.testing.assert_array_equal(
            np.asarray(restored.params["patch_embed"]["kernel"]),
            np.asarray(params["patch_embed"]["kernel"]),
        )
        # optimizer state restored too
        chex = np.asarray(
            jax.tree.leaves(restored.opt_state)[0]
        )
        assert chex is not None

    def test_npz_roundtrip(self, tmp_path):
        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_init
        from cross_scale_mae_tpu.utils.checkpoint import (
            load_params_npz,
            save_params_npz,
        )

        cfg = get_mae_config("mae_vit_tiny", input_size=16, patch_size=8)
        params, _ = mae_init(jax.random.key(0), cfg)
        path = str(tmp_path / "params.npz")
        save_params_npz(path, params, config_json=cfg.to_json())
        template, _ = mae_init(jax.random.key(5), cfg)
        loaded, cfg_json = load_params_npz(path, template)
        assert json.loads(cfg_json)["dim_model"] == cfg.dim_model
        np.testing.assert_array_equal(
            np.asarray(loaded["cls_token"]), np.asarray(params["cls_token"])
        )


class TestViz:
    def test_run_one_image_and_plot(self, tmp_path):
        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_init
        from cross_scale_mae_tpu.viz import plot_reconstruction, run_one_image

        cfg = get_mae_config(
            "mae_vit_tiny", input_size=16, patch_size=8, compute_dtype="float32"
        )
        params, _ = mae_init(jax.random.key(0), cfg)
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32)
        )
        result = run_one_image(params, cfg, img, jax.random.key(1))
        assert result["recon"].shape == (1, 16, 16, 3)
        # paste keeps visible pixels identical to the original
        vis = result["mask"] == 0
        np.testing.assert_allclose(
            result["paste"][vis], result["original"][vis], atol=1e-6
        )
        out = str(tmp_path / "recon.png")
        plot_reconstruction(result, out, (0.5, 0.5, 0.5), (0.2, 0.2, 0.2))
        assert os.path.exists(out)

    def test_run_eval_sweep(self):
        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_init
        from cross_scale_mae_tpu.viz import run_eval

        cfg = get_mae_config(
            "mae_vit_tiny", input_size=16, patch_size=8, compute_dtype="float32"
        )
        params, _ = mae_init(jax.random.key(0), cfg)
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32)
        )
        sweep = run_eval(
            {"m": (params, cfg)}, [img], (0.5,) * 3, (0.2,) * 3,
            metrics=("mse",), noise_kinds=(None, "gaussian"),
        )
        assert set(sweep["m"]) == {"mse", "mse_gaussian"}
        assert sweep["m"]["mse_gaussian"] >= 0

    def test_prepare_model_from_checkpoint(self, tmp_path):
        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_init
        from cross_scale_mae_tpu.train import TrainState, build_optimizer
        from cross_scale_mae_tpu.utils.checkpoint import save_checkpoint
        from cross_scale_mae_tpu.viz import prepare_model

        cfg = get_mae_config("mae_vit_tiny", input_size=16, patch_size=8)
        params, mstate = mae_init(jax.random.key(0), cfg)
        tx = build_optimizer(params, lambda s: 1e-3)
        state = TrainState.create(params, mstate, tx)
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, 0, state, config_json=cfg.to_json())
        p, s, c = prepare_model(ckpt)
        assert c.dim_model == cfg.dim_model
        np.testing.assert_array_equal(
            np.asarray(p["cls_token"]), np.asarray(params["cls_token"])
        )


class TestLogging:
    def test_jsonl_and_auto_dir(self, tmp_path):
        from cross_scale_mae_tpu.utils.logging import RunLogger, auto_output_dir

        out = str(tmp_path / "run")
        logger = RunLogger(out)
        logger.log_epoch({"epoch": 0, "loss": 1.5})
        logger.log_epoch({"epoch": 1, "loss": 1.2})
        logger.close()
        lines = open(os.path.join(out, "log.jsonl")).read().splitlines()
        assert len(lines) == 2
        assert json.loads(lines[1])["loss"] == 1.2

        # auto_output_dir now CLAIMS the dir immediately (rank-0 picks and
        # broadcasts in multi-host; creating it keeps the name valid).
        d1 = auto_output_dir(str(tmp_path), model="m", lr=0.1)
        assert os.path.isdir(d1)
        d2 = auto_output_dir(str(tmp_path), model="m", lr=0.1)
        assert d2 == d1 + "+1" and os.path.isdir(d2)
