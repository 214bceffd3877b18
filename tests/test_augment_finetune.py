"""Finetune augmentation family: RandAugment / ColorJitter / RandomErasing
(ops/randaug.py) and mixup modes (train/mixup.py). The reference declares
these flags but never consumes them (main_finetune.py:188-268 vs
util/datasets.py:108-158); here they must actually transform pixels/targets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_scale_mae_tpu.ops.randaug import (
    RandAugmentConfig,
    _affine_params,
    _affine_sample,
    _autocontrast,
    _invert,
    _posterize,
    _solarize,
    color_jitter,
    parse_rand_augment,
    rand_augment,
    random_erasing,
)
from cross_scale_mae_tpu.train.mixup import mixup_cutmix


def _imgs(n=4, h=24, w=24, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, h, w, c)).astype(np.float32))


# ------------------------------------------------------------- parsing


def test_parse_rand_augment():
    cfg = parse_rand_augment("rand-m9-mstd0.5")
    assert cfg == RandAugmentConfig(num_layers=2, magnitude=9.0, mag_std=0.5)
    cfg = parse_rand_augment("rand-m7-mstd0.5-inc1-n3")
    assert cfg.num_layers == 3 and cfg.magnitude == 7.0
    assert parse_rand_augment(None) is None
    with pytest.raises(ValueError):
        parse_rand_augment("original")
    with pytest.raises(ValueError):
        parse_rand_augment("rand-zzz")


# ------------------------------------------------------------- pixel ops


def test_invert_and_solarize():
    x = _imgs()
    n = x.shape[0]
    m = jnp.full((n,), 0.9)
    s = jnp.ones((n,))
    np.testing.assert_allclose(np.asarray(_invert(x, m, s)), 1.0 - np.asarray(x))
    sol = np.asarray(_solarize(x, m, s))
    xh = np.asarray(x)
    high = xh >= 0.1  # thresh = 1 - 0.9
    np.testing.assert_allclose(sol[high], (1.0 - xh)[high])
    np.testing.assert_allclose(sol[~high], xh[~high])


def test_posterize_quantizes():
    x = _imgs()
    n = x.shape[0]
    out = np.asarray(_posterize(x, jnp.full((n,), 1.0), jnp.ones((n,))))
    # m=1 -> 4 bits dropped -> at most 16 levels per channel
    assert len(np.unique(np.round(out * 255))) <= 16 + 1


def test_equalize_matches_pil():
    from PIL import Image, ImageOps

    from cross_scale_mae_tpu.ops.randaug import _equalize

    rng = np.random.default_rng(3)
    arr = (rng.normal(0.5, 0.08, (2, 32, 32, 3)).clip(0, 1) * 255).astype(
        np.uint8)
    got = np.asarray(_equalize(
        jnp.asarray(arr / 255.0, jnp.float32), None, None)) * 255
    ref = np.stack([np.asarray(ImageOps.equalize(Image.fromarray(a)))
                    for a in arr])
    np.testing.assert_array_equal(got.round(), ref.astype(float))


def test_autocontrast_stretches_to_full_range():
    x = _imgs() * 0.4 + 0.3  # squeeze into [0.3, 0.7]
    out = np.asarray(_autocontrast(x, jnp.zeros((4,)), jnp.ones((4,))))
    assert out.min() == pytest.approx(0.0, abs=1e-5)
    assert out.max() == pytest.approx(1.0, abs=1e-5)


# ---------------------------------------------------------- geometric ops


def test_affine_identity_for_pixel_ops():
    x = _imgs()
    n = x.shape[0]
    op_idx = jnp.zeros((n,), jnp.int32)  # op 0 = pixel op -> identity affine
    params = _affine_params(op_idx, jnp.full((n,), 0.9), jnp.ones((n,)), 24, 24)
    out = _affine_sample(x, *params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_translate_moves_content():
    from cross_scale_mae_tpu.ops.randaug import NUM_OPS, _PIXEL_OPS

    x = jnp.zeros((1, 16, 16, 1)).at[:, 4:6, 4:6, :].set(1.0)
    trx_idx = len(_PIXEL_OPS) + 3  # translate_x
    assert trx_idx < NUM_OPS
    # m=0.3 -> shift = 0.45 * 0.3 * 16 ~ 2.2 px along x
    params = _affine_params(
        jnp.array([trx_idx]), jnp.array([0.3]), jnp.array([1.0]), 16, 16,
    )
    out = np.asarray(_affine_sample(x, *params, fill=0.0))
    # content moved: original hot region dimmed, shifted region lit
    assert out[0, 4:6, 4:6, 0].sum() < x[0, 4:6, 4:6, 0].sum()
    assert out[0, 4:6, 1:4, 0].sum() > 0.5  # blob now ~2.2 px to the left
    assert out.sum() == pytest.approx(float(x.sum()), rel=0.15)  # mass kept


def test_rand_augment_changes_pixels_and_stays_in_range():
    x = _imgs(n=8)
    out = rand_augment(jax.random.key(0), x, RandAugmentConfig())
    out_np = np.asarray(out)
    assert out.shape == x.shape
    assert np.isfinite(out_np).all()
    assert out_np.min() >= -1e-5 and out_np.max() <= 1.0 + 1e-5
    assert np.abs(out_np - np.asarray(x)).max() > 0.05  # actually transformed
    # deterministic under the same key
    out2 = rand_augment(jax.random.key(0), x, RandAugmentConfig())
    np.testing.assert_array_equal(out_np, np.asarray(out2))


def test_rand_augment_applies_each_layer_with_prob_half():
    """timm's rand policy wraps every op in AugmentOp(prob=0.5): with 2
    layers ~25% of samples should pass through untouched (plus identity-op
    mass); always-apply would leave <5% unchanged."""
    x = _imgs(n=256, h=16, w=16)
    out = np.asarray(rand_augment(jax.random.key(11), x, RandAugmentConfig()))
    unchanged = (np.abs(out - np.asarray(x)).max(axis=(1, 2, 3)) < 1e-6)
    assert 0.15 <= unchanged.mean() <= 0.55


def test_random_erasing_single_per_image_decision():
    """timm draws the erase decision once per image, then erases all
    `count` boxes on selected images — not an independent coin per box."""
    x = _imgs(n=400, h=16, w=16)
    out = np.asarray(random_erasing(jax.random.key(12), x, prob=0.25, count=3))
    erased = (np.abs(out - np.asarray(x)) > 1e-6).any(axis=(1, 2, 3))
    # per-box coins would give ~1 - 0.75^3 = 0.58
    assert 0.15 <= erased.mean() <= 0.35


# ------------------------------------------------------------ color jitter


def test_color_jitter():
    x = _imgs()
    out = color_jitter(jax.random.key(0), x, 0.4)
    assert np.abs(np.asarray(out) - np.asarray(x)).max() > 0.01
    ident = color_jitter(jax.random.key(0), x, 0.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), atol=1e-5)


# ---------------------------------------------------------- random erasing


def test_random_erasing_pixel_mode():
    x = _imgs(n=8)
    out = np.asarray(random_erasing(jax.random.key(0), x, prob=1.0))
    diff = (np.abs(out - np.asarray(x)) > 1e-6).any(axis=-1)  # (N, H, W)
    frac = diff.mean(axis=(1, 2))
    # every sample has an erased rectangle within the timm area range
    assert (frac > 0.01).all() and (frac < 0.5).all()
    ident = random_erasing(jax.random.key(0), x, prob=0.0)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))


def test_random_erasing_const_mode():
    x = _imgs(n=4) + 0.5
    out = np.asarray(
        random_erasing(jax.random.key(1), x, prob=1.0, mode="const"))
    assert (out == 0.0).any()


# ------------------------------------------------------------ mixup modes


def _recover_lams(targets, labels, num_classes):
    """With distinct labels and smoothing 0, target row i is
    lam*onehot(l_i) + (1-lam)*onehot(l_flip_i) -> lam = t[i, l_i]."""
    return np.asarray(targets)[np.arange(len(labels)), np.asarray(labels)]


@pytest.mark.parametrize("mode", ["batch", "pair", "elem"])
def test_mixup_modes(mode):
    n, c = 8, 16
    labels = jnp.arange(n) % c  # distinct within flip partners
    imgs = _imgs(n=n)
    mixed, targets = mixup_cutmix(
        jax.random.key(3), imgs, labels, c,
        mixup_alpha=0.8, cutmix_alpha=0.0, smoothing=0.0, mode=mode,
    )
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)
    lam = _recover_lams(targets, labels, c)
    if mode == "batch":
        assert np.allclose(lam, lam[0], atol=1e-5)
    elif mode == "pair":
        np.testing.assert_allclose(lam, lam[::-1], atol=1e-5)
    else:  # elem: independent draws — overwhelmingly distinct
        assert len(np.unique(np.round(lam, 4))) > 2


@pytest.mark.parametrize("mode", ["pair", "elem"])
def test_cutmix_modes_targets_match_patch_area(mode):
    n, c, h = 8, 16, 32
    labels = jnp.arange(n) % c
    imgs = jnp.zeros((n, h, h, 3))
    flip_imgs = jnp.ones((n, h, h, 3))
    # give each sample a distinguishable partner: imgs i = i/n constant
    imgs = imgs + (jnp.arange(n) / n)[:, None, None, None]
    mixed, targets = mixup_cutmix(
        jax.random.key(5), imgs, labels, c,
        mixup_alpha=0.0, cutmix_alpha=1.0, smoothing=0.0, mode=mode,
    )
    del flip_imgs
    lam = _recover_lams(targets, labels, c)
    # measured patch area must equal 1 - lam per sample
    src = np.asarray(imgs)
    out = np.asarray(mixed)
    replaced = (np.abs(out - src) > 1e-6).any(axis=-1).mean(axis=(1, 2))
    np.testing.assert_allclose(replaced, 1.0 - lam, atol=2e-2)


def test_cutmix_minmax_overrides_alpha():
    """timm cutmix_minmax: cut fractions drawn uniform in [min, max] per
    axis, box fully inside; enables cutmix even with alpha 0."""
    n, c, h = 64, 16, 32
    labels = jnp.arange(n) % c
    imgs = jnp.broadcast_to((jnp.arange(n) / n)[:, None, None, None],
                            (n, h, h, 3))
    mixed, targets = mixup_cutmix(
        jax.random.key(9), imgs, labels, c,
        mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.3, 0.6),
        smoothing=0.0, mode="elem",
    )
    lam = _recover_lams(targets, labels, c)
    replaced = (np.abs(np.asarray(mixed) - np.asarray(imgs)) > 1e-6).any(
        axis=-1).mean(axis=(1, 2))
    # whole-pixel box vs continuous lam: boundary quantization ~2/32 px
    np.testing.assert_allclose(replaced, 1.0 - lam, atol=4e-2)
    # area fraction = fh*fw with fh, fw ~ U[0.3, 0.6] -> within [0.09, 0.36]
    assert (replaced >= 0.07).all() and (replaced <= 0.38).all()


def test_mixup_pair_requires_even_batch():
    with pytest.raises(AssertionError):
        mixup_cutmix(
            jax.random.key(0), _imgs(n=3), jnp.zeros((3,), jnp.int32), 4,
            mode="pair",
        )


# -------------------------------------------------------- CLI + end-to-end


def test_finetune_parser_accepts_aug_flags():
    from cross_scale_mae_tpu.cli.finetune import get_args_parser

    a = get_args_parser().parse_args([
        "--aa", "rand-m9-mstd0.5", "--reprob", "0.25",
        "--color_jitter", "0.4", "--mixup_mode", "pair",
    ])
    assert a.aa == "rand-m9-mstd0.5" and a.reprob == 0.25
    assert a.color_jitter == 0.4 and a.mixup_mode == "pair"


def test_make_finetune_augment_full_chain():
    from cross_scale_mae_tpu.ops.augment import make_finetune_augment

    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    plain = make_finetune_augment((0.4,) * 3, (0.2,) * 3, 24)
    extra = make_finetune_augment(
        (0.4,) * 3, (0.2,) * 3, 24,
        aa="rand-m9-mstd0.5", reprob=0.25,
    )
    a = jax.jit(plain)(jax.random.key(0), jnp.asarray(batch))
    b = jax.jit(extra)(jax.random.key(0), jnp.asarray(batch))
    assert a.shape == b.shape == (4, 24, 24, 3)
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


def test_random_erasing_count_divides_area():
    """timm semantics: target area is drawn per-rectangle as
    uniform(min,max) * area / count, so the TOTAL erased fraction stays
    within ~area_range whatever --recount is."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((32, 64, 64, 3), jnp.float32)
    for count in (1, 4):
        out = np.asarray(random_erasing(
            jax.random.key(7), x, prob=1.0, mode="const", count=count))
        frac = (out == 0.0).all(axis=-1).mean(axis=(1, 2))
        # Upper bound: max_area (1/3) plus clamping slack; a /count
        # regression at count=4 would push the mean fraction toward ~0.6+.
        assert frac.mean() < 0.40, (count, float(frac.mean()))
        assert frac.max() <= 0.55, (count, float(frac.max()))
        assert frac.min() > 0.0  # every image got at least one rectangle
