"""Loss-function tests: masked reconstruction family, NT-Xent, SSIM, perceptual.

Golden values computed from the reference formulas on tiny fixed tensors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.losses import ntxent_loss, process_target, recon_loss
from cross_scale_mae_tpu.losses.recon import RECON_LOSSES, scale_01
from cross_scale_mae_tpu.ops.ssim import ms_ssim, ssim


class TestMaskedLosses:
    def setup_method(self):
        rng = np.random.default_rng(42)
        self.target = jnp.asarray(rng.normal(size=(2, 4, 6)).astype(np.float32))
        self.pred = jnp.asarray(rng.normal(size=(2, 4, 6)).astype(np.float32))
        self.mask = jnp.asarray(
            np.array([[1, 0, 1, 0], [0, 1, 1, 1]], np.float32)
        )

    def test_mse_masked_golden(self):
        t, p, m = map(np.asarray, (self.target, self.pred, self.mask))
        per_patch = ((p - t) ** 2).mean(-1)
        expect = (per_patch * m).sum() / m.sum()
        got = recon_loss("mse", self.target, self.pred, self.mask)
        np.testing.assert_allclose(float(got), expect, rtol=1e-6)

    def test_l2_vs_mse_scaling(self):
        # l2 = per-patch sum = mse * patch_dim (MAE_ViT_Shared.py:123-133)
        mse = float(recon_loss("mse", self.target, self.pred, self.mask))
        l2 = float(recon_loss("l2", self.target, self.pred, self.mask))
        np.testing.assert_allclose(l2, mse * 6, rtol=1e-6)

    def test_mae_l1_golden(self):
        t, p, m = map(np.asarray, (self.target, self.pred, self.mask))
        per = np.abs(p - t).mean(-1)
        np.testing.assert_allclose(
            float(recon_loss("mae", self.target, self.pred, self.mask)),
            (per * m).sum() / m.sum(), rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(recon_loss("l1", self.target, self.pred, self.mask)),
            (np.abs(p - t).sum(-1) * m).sum() / m.sum(), rtol=1e-6,
        )

    def test_no_mask_is_plain_mean(self):
        t, p = map(np.asarray, (self.target, self.pred))
        np.testing.assert_allclose(
            float(recon_loss("mse", self.target, self.pred, None)),
            ((p - t) ** 2).mean(), rtol=1e-6,
        )

    def test_bce_golden(self):
        t, p, m = map(np.asarray, (self.target, self.pred, self.mask))
        t01 = (t - t.min()) / (t.max() - t.min() + 1e-6)
        # stable bce-with-logits
        per_elem = np.maximum(p, 0) - p * t01 + np.log1p(np.exp(-np.abs(p)))
        expect = (per_elem.mean(-1) * m).sum() / m.sum()
        got = float(recon_loss("bce", self.target, self.pred, self.mask))
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_unknown_loss_raises(self):
        with pytest.raises(ValueError):
            recon_loss("nope", self.target, self.pred)

    def test_process_target_norm_pix(self):
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
        )
        t = process_target(imgs, 4, 3, norm_pix_loss=True)
        tn = np.asarray(t)
        np.testing.assert_allclose(tn.mean(-1), 0.0, atol=1e-4)
        # normalized by unbiased std (torch var default)
        np.testing.assert_allclose(tn.var(-1, ddof=1), 1.0, atol=1e-2)


class TestSSIM:
    def test_identical_images(self, rng_np):
        x = jnp.asarray(rng_np.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)

    def test_ssim_decreases_with_noise(self, rng_np):
        x = jnp.asarray(rng_np.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        noise = jnp.asarray(rng_np.normal(size=x.shape).astype(np.float32))
        s_small = float(ssim(x, x + 0.05 * noise))
        s_big = float(ssim(x, x + 0.3 * noise))
        assert s_big < s_small < 1.0

    def test_ssim_loss_registry(self, rng_np):
        imgs = rng_np.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        from cross_scale_mae_tpu.ops.patchify import patchify

        target = patchify(jnp.asarray(imgs), 4)
        loss_same = float(
            recon_loss("ssim", target, target, None, patch_size=4, channels=3)
        )
        np.testing.assert_allclose(loss_same, 0.0, atol=1e-5)

    def test_ms_ssim_identical(self, rng_np):
        x = jnp.asarray(rng_np.uniform(size=(1, 176, 176, 3)).astype(np.float32))
        np.testing.assert_allclose(float(ms_ssim(x, x)), 1.0, atol=1e-5)

    def test_ms_ssim_too_small_asserts(self, rng_np):
        x = jnp.ones((1, 64, 64, 3))
        with pytest.raises(AssertionError):
            ms_ssim(x, x)

    def test_matches_skimage_if_available(self, rng_np):
        skimage = pytest.importorskip("skimage.metrics")
        x = rng_np.uniform(size=(32, 32)).astype(np.float32)
        y = np.clip(x + 0.1 * rng_np.normal(size=x.shape).astype(np.float32), 0, 1)
        ref = skimage.structural_similarity(
            x, y, win_size=11, gaussian_weights=True, sigma=1.5,
            use_sample_covariance=False, data_range=1.0,
        )
        got = float(ssim(jnp.asarray(x)[None, :, :, None], jnp.asarray(y)[None, :, :, None]))
        np.testing.assert_allclose(got, ref, atol=2e-3)


class TestNTXent:
    def test_golden_small(self):
        # Hand-computable case per contrast_loss.py:81-99 with B=2.
        zi = jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0]], np.float32))
        zj = jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0]], np.float32))
        tau, eps = 0.5, 1e-8
        z = np.concatenate([np.asarray(zi), np.asarray(zj)], axis=0)
        sim = np.exp(z @ z.T / tau)
        pos_idx = [2, 3, 0, 1]
        loss_ref = 0.0
        for r in range(4):
            pos = sim[r, pos_idx[r]]
            neg = sum(
                sim[r, c] for c in range(4) if c != r and c != pos_idx[r]
            )
            loss_ref += -np.log(pos / (neg + eps))
        loss_ref /= 4
        got = float(ntxent_loss(zi, zj, tau=tau))
        np.testing.assert_allclose(got, loss_ref, rtol=1e-5)

    def test_positive_alignment_lowers_loss(self, rng_np):
        zi = jnp.asarray(rng_np.normal(size=(8, 16)).astype(np.float32))
        zj_aligned = zi + 0.01 * jnp.asarray(
            rng_np.normal(size=(8, 16)).astype(np.float32)
        )
        zj_random = jnp.asarray(rng_np.normal(size=(8, 16)).astype(np.float32))
        assert float(ntxent_loss(zi, zj_aligned)) < float(ntxent_loss(zi, zj_random))

    def test_scale_invariance_cos(self, rng_np):
        zi = jnp.asarray(rng_np.normal(size=(4, 8)).astype(np.float32))
        zj = jnp.asarray(rng_np.normal(size=(4, 8)).astype(np.float32))
        a = float(ntxent_loss(zi, zj))
        b = float(ntxent_loss(zi * 10, zj * 0.1))
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestPerceptual:
    def test_random_trunk_zero_on_identical(self, rng_np):
        from cross_scale_mae_tpu.losses.perceptual import (
            init_vgg16_params,
            perceptual_loss,
        )

        params = init_vgg16_params(jax.random.key(0))
        x = jnp.asarray(rng_np.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        loss = float(perceptual_loss(params, x, x, resize_to=None))
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)

    def test_random_trunk_positive_on_different(self, rng_np):
        from cross_scale_mae_tpu.losses.perceptual import (
            init_vgg16_params,
            perceptual_loss,
        )

        params = init_vgg16_params(jax.random.key(0))
        x = jnp.asarray(rng_np.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        y = jnp.asarray(rng_np.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        assert float(perceptual_loss(params, x, y, resize_to=None)) > 0.01
