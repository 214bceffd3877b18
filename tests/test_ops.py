"""Unit tests for core ops: patchify, pos-embed, masking, image resampling.

Golden values are generated from the reference formulas (SURVEY.md §4), not
by running the reference code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops import (
    get_2d_sincos_pos_embed,
    interpolate_pos_embed,
    patchify,
    random_masking,
    restore_tokens,
    unpatchify,
)
from cross_scale_mae_tpu.ops.image import (
    center_crop_resize,
    crop_resize,
    normalize_images,
    random_flips,
    random_resized_crop,
    resize,
    sample_crop_boxes,
)


class TestPatchify:
    def test_round_trip(self, rng_np):
        imgs = jnp.asarray(rng_np.normal(size=(2, 32, 32, 3)).astype(np.float32))
        x = patchify(imgs, 16)
        assert x.shape == (2, 4, 16 * 16 * 3)
        back = unpatchify(x, 16, 3)
        np.testing.assert_allclose(back, imgs, rtol=0, atol=0)

    def test_feature_order_matches_reference_einsum(self, rng_np):
        # Reference: nchpwq->nhwpqc (MAE_ViT_Shared.py:37-39) — per-patch
        # features ordered (ph, pw, c).
        imgs_nchw = rng_np.normal(size=(1, 3, 4, 4)).astype(np.float32)
        p = 2
        n, c, h, w = imgs_nchw.shape
        gh = h // p
        ref = imgs_nchw.reshape(n, c, gh, p, gh, p)
        ref = np.einsum("nchpwq->nhwpqc", ref).reshape(n, gh * gh, p * p * c)

        imgs_nhwc = jnp.asarray(imgs_nchw.transpose(0, 2, 3, 1))
        ours = patchify(imgs_nhwc, p)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


class TestPosEmbed:
    def test_golden_values(self):
        # From the formula at util/pos_embed.py:44-63 for D=4, grid 2x2:
        # omega = [1, 1e-2]; emb(pos) = [sin(p*1), sin(p*.01), cos(p*1), cos(p*.01)]
        emb = np.asarray(get_2d_sincos_pos_embed(8, 2, cls_token=False))
        assert emb.shape == (4, 8)
        # position (h=0, w=1) is row 1; first half encodes w-ramp values.
        w_half = emb[1, :4]
        np.testing.assert_allclose(
            w_half, [np.sin(1.0), np.sin(0.01), np.cos(1.0), np.cos(0.01)], atol=1e-6
        )
        # h-half of row 1 encodes h=0
        np.testing.assert_allclose(emb[1, 4:], [0.0, 0.0, 1.0, 1.0], atol=1e-6)

    def test_cls_token_zero_row(self):
        emb = np.asarray(get_2d_sincos_pos_embed(16, 4, cls_token=True))
        assert emb.shape == (17, 16)
        np.testing.assert_array_equal(emb[0], np.zeros(16))

    def test_interpolate_identity_and_shape(self):
        emb = get_2d_sincos_pos_embed(16, 4, cls_token=True)[None]
        same = interpolate_pos_embed(emb, 4)
        np.testing.assert_allclose(np.asarray(same), np.asarray(emb))
        up = interpolate_pos_embed(emb, 8)
        assert up.shape == (1, 65, 16)
        np.testing.assert_allclose(np.asarray(up[0, 0]), np.zeros(16))


class TestMasking:
    def test_keep_count_and_mask_sum(self):
        x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
        xm, mask, ids_restore = random_masking(x, 4, jax.random.key(0))
        assert xm.shape == (2, 4, 4)
        assert mask.shape == (2, 16)
        np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), [12.0, 12.0])

    def test_kept_tokens_are_original(self):
        x = jnp.arange(1 * 8 * 2, dtype=jnp.float32).reshape(1, 8, 2)
        xm, mask, _ = random_masking(x, 2, jax.random.key(1))
        rows = {tuple(np.asarray(r)) for r in xm[0]}
        all_rows = {tuple(np.asarray(r)) for r in x[0]}
        assert rows <= all_rows
        # mask==0 exactly at kept positions
        kept_idx = {int(np.asarray(r)[0]) // 2 for r in xm[0]}
        zeros = set(np.flatnonzero(np.asarray(mask[0]) == 0).tolist())
        assert kept_idx == zeros

    def test_restore_tokens_roundtrip(self):
        x = jnp.arange(1 * 8 * 3, dtype=jnp.float32).reshape(1, 8, 3)
        xm, mask, ids_restore = random_masking(x, 8, jax.random.key(2))  # keep all
        restored = restore_tokens(xm, jnp.zeros(3), ids_restore)
        np.testing.assert_allclose(np.asarray(restored), np.asarray(x))

    def test_same_key_same_mask(self):
        x = jnp.ones((2, 16, 4))
        _, mask_a, _ = random_masking(x, 4, jax.random.key(7))
        _, mask_b, _ = random_masking(x, 4, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))


class TestImageOps:
    def test_normalize(self):
        imgs = jnp.ones((1, 2, 2, 3))
        out = normalize_images(imgs, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
        np.testing.assert_allclose(np.asarray(out), np.ones((1, 2, 2, 3)))

    def test_identity_crop_linear(self, rng_np):
        imgs = jnp.asarray(rng_np.normal(size=(2, 16, 16, 3)).astype(np.float32))
        boxes = jnp.tile(jnp.array([[0.0, 0.0, 16.0, 16.0]]), (2, 1))
        out = crop_resize(imgs, boxes, 16, "linear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)

    def test_upscale_2x_matches_jax_image(self, rng_np):
        imgs = jnp.asarray(rng_np.normal(size=(1, 8, 8, 1)).astype(np.float32))
        out = resize(imgs, 16, method="linear")
        ref = jax.image.resize(imgs, (1, 16, 16, 1), method="linear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_resample_matches_torch(self, rng_np):
        # The reference pipeline is torchvision-based; our cubic kernel uses
        # the torch convention (a=-0.75), not jax.image's (a=-0.5).
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = rng_np.normal(size=(1, 8, 8, 1)).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for ours_m, torch_m in [("cubic", "bicubic"), ("linear", "bilinear")]:
            out = np.asarray(resize(jnp.asarray(x), 16, method=ours_m))[0, :, :, 0]
            ref = F.interpolate(
                xt, size=(16, 16), mode=torch_m, align_corners=False
            ).numpy()[0, 0]
            np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_crop_quadrant(self):
        # Constant quadrants: cropping the top-left quadrant returns its value.
        imgs = np.zeros((1, 8, 8, 1), np.float32)
        imgs[:, :4, :4] = 1.0
        out = crop_resize(jnp.asarray(imgs), jnp.array([[0.0, 0.0, 4.0, 4.0]]), 4, "linear")
        np.testing.assert_allclose(np.asarray(out), np.ones((1, 4, 4, 1)), atol=1e-5)

    def test_sample_crop_boxes_ranges(self):
        boxes = np.asarray(
            sample_crop_boxes(jax.random.key(0), 512, 128, 128, (0.25, 0.75))
        )
        i, j, h, w = boxes.T
        assert (h <= 128 + 1e-3).all() and (w <= 128 + 1e-3).all()
        assert (i >= 0).all() and (j >= 0).all()
        assert (i + h <= 128 + 1e-3).all() and (j + w <= 128 + 1e-3).all()
        areas = h * w / (128.0 * 128.0)
        # aspect clamp can push area slightly out of range; check the bulk
        assert np.quantile(areas, 0.05) > 0.2 and np.quantile(areas, 0.95) < 0.8

    def test_random_resized_crop_shape_and_flips(self, rng_np):
        imgs = jnp.asarray(rng_np.normal(size=(4, 32, 32, 3)).astype(np.float32))
        out = random_resized_crop(jax.random.key(0), imgs, 32, (0.25, 0.75))
        assert out.shape == (4, 32, 32, 3)
        flipped = random_flips(jax.random.key(1), imgs)
        assert flipped.shape == imgs.shape
        # each image is either the original or a flip of it: same multiset of values
        np.testing.assert_allclose(
            np.sort(np.asarray(flipped).ravel()), np.sort(np.asarray(imgs).ravel()),
            atol=0,
        )

    def test_center_crop_resize(self, rng_np):
        imgs = jnp.asarray(rng_np.normal(size=(2, 146, 146, 3)).astype(np.float32))
        out = center_crop_resize(imgs, 128)
        assert out.shape == (2, 128, 128, 3)
