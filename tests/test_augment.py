"""Fused on-device augmentation tests."""

import numpy as np

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops.augment import make_eval_preprocess, make_pretrain_augment


def test_pretrain_augment_shapes_and_stats():
    aug = make_pretrain_augment((0.5, 0.5, 0.5), (0.25, 0.25, 0.25), 16)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 16, 16, 3), np.uint8)
    )
    out = aug(jax.random.key(0), batch)
    assert out.shape == (8, 16, 16, 3)
    assert out.dtype == jnp.float32
    # normalized uniform [0,1] with mean .5 std .25 -> roughly zero-mean
    assert abs(float(out.mean())) < 0.3


def test_pretrain_augment_randomness_keyed():
    aug = make_pretrain_augment((0.5,) * 3, (0.25,) * 3, 16)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 16, 16, 3), np.uint8)
    )
    a = aug(jax.random.key(1), batch)
    b = aug(jax.random.key(1), batch)
    c = aug(jax.random.key(2), batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_eval_preprocess_center_crop():
    pre = make_eval_preprocess((0.0,) * 3, (1.0,) * 3, 14)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 16, 16, 3), np.uint8)
    )
    out = pre(batch)
    assert out.shape == (2, 14, 14, 3)
    # already at input size: no resample
    batch2 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 14, 14, 3), np.uint8)
    )
    out2 = pre(batch2)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(batch2, np.float32) / 255.0, atol=1e-6
    )


def test_no_normalize_flag():
    # Sentinel/EuroSAT path: SentinelNormalize already applied host-side.
    aug = make_pretrain_augment((9.0,) * 3, (9.0,) * 3, 16, normalize=False)
    batch = jnp.full((2, 16, 16, 3), 255, jnp.uint8)
    out = aug(jax.random.key(0), batch)
    assert float(out.max()) <= 1.0 + 1e-6
