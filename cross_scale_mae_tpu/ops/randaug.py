"""On-device RandAugment / ColorJitter / RandomErasing for finetune.

The reference declares ``--aa``, ``--color_jitter`` and ``--reprob/remode/
recount`` (main_finetune.py:188-232) but its dataset transform never consumes
them (util/datasets.py:108-158 builds a fixed chain) — the flags are dead.
Per the match-or-fix policy these are implemented as FUNCTIONAL on-device
augmentations with timm-compatible semantics, so the full finetune recipe
from the flags actually runs.

TPU design notes:

* One augmentation layer = a branchless select over the pixel-op pool (each
  candidate is cheap VPU work; a (N,) one-hot picks per sample) plus ONE
  per-sample affine resample shared by all geometric ops (shear/translate/
  rotate compose into a 2x3 matrix; identity for samples whose op is
  pixel-level). No data-dependent control flow — the whole thing jits into
  the train step.
* The affine resample is a vmapped bilinear ``map_coordinates`` (order=1,
  gray fill), fine at finetune resolutions (64-128 px).
* Op pool = timm's full `rand` policy including Equalize (histogram +
  LUT-apply expressed as chunked 256-bin comparisons — scatter/gather-free,
  see _equalize).
"""

from __future__ import annotations

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp

# ------------------------------------------------------------- pixel ops
# All operate on [0, 1] float NHWC images; magnitudes are per-sample (N,)
# in [0, 1] (m/10 in timm units) with per-sample random sign where timm
# uses one.

_GRAY = (0.2989, 0.587, 0.114)


def _gray(x):
    w = jnp.asarray(_GRAY, x.dtype)
    return jnp.einsum("nhwc,c->nhw", x[..., :3], w) if x.shape[-1] == 3 else (
        jnp.mean(x, axis=-1)
    )


def _blend(a, b, factor):
    """a + factor * (b - a), factor (N,) broadcast; clamps to [0, 1]."""
    return jnp.clip(a + factor[:, None, None, None] * (b - a), 0.0, 1.0)


def _brightness(x, m, sign):
    # factor = 1 + 0.9 * m * sign  (timm enhance range 0.1..1.9)
    return _blend(jnp.zeros_like(x), x, 1.0 + 0.9 * m * sign)


def _contrast(x, m, sign):
    gm = jnp.mean(_gray(x), axis=(1, 2))  # per-image mean gray
    base = jnp.broadcast_to(gm[:, None, None, None], x.shape)
    return _blend(base, x, 1.0 + 0.9 * m * sign)


def _color(x, m, sign):
    g = _gray(x)[..., None]
    base = jnp.broadcast_to(g, x.shape)
    return _blend(base, x, 1.0 + 0.9 * m * sign)


def _sharpness(x, m, sign):
    # Blend with a 3x3 smoothed image (PIL SMOOTH kernel: center 5, ring 1).
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]])
    k = (k / k.sum()).astype(x.dtype)
    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    smooth = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    # PIL leaves the 1-pixel border unsharpened; keep the border from x.
    h, w = x.shape[1], x.shape[2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1))
    smooth = jnp.where(interior[None, :, :, None], smooth, x)
    return _blend(smooth, x, 1.0 + 0.9 * m * sign)


def _posterize(x, m, sign):
    del sign  # timm posterize has no sign
    # timm PosterizeIncreasing ('inc1' policy, the reference finetune
    # default): bits kept = 4 - floor(4*m), i.e. 4 bits at m=0 down to
    # (clamped) 1 bit at m=1 — matching the other ops here, which also
    # implement the increasing-severity variants.
    bits = jnp.clip(4.0 - jnp.floor(4.0 * m), 1, 8)  # (N,)
    levels = 2.0 ** bits  # keep top `bits` bits of the 8-bit value
    q = jnp.floor(x * 255.0 / (256.0 / levels)[:, None, None, None])
    return jnp.clip(q * (256.0 / levels)[:, None, None, None] / 255.0, 0.0, 1.0)


def _solarize(x, m, sign):
    del sign
    thresh = (1.0 - m)[:, None, None, None]
    return jnp.where(x >= thresh, 1.0 - x, x)


def _solarize_add(x, m, sign):
    del sign
    add = (110.0 / 255.0 * m)[:, None, None, None]
    return jnp.where(x < 0.5, jnp.clip(x + add, 0.0, 1.0), x)


def _invert(x, m, sign):
    del m, sign
    return 1.0 - x


def _autocontrast(x, m, sign):
    del m, sign
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    return jnp.where(hi > lo, (x - lo) / jnp.maximum(hi - lo, 1e-6), x)


def _equalize(x, m, sign):
    """PIL ImageOps.equalize semantics, branchless on TPU.

    Histogram + LUT-apply are both expressed as chunked 256-bin comparisons
    (scatter/gather-free): hist[b] = sum(x_u8 == b) and
    y = sum_b lut[b] * (x_u8 == b), 32 bins at a time to bound the
    materialized compare tensor. PIL's LUT: step = (npix - hist[255]) // 255;
    lut[i] = (cumsum(hist)[:i] + step // 2) // step, identity when step==0.
    """
    del m, sign
    n, h, w, c = x.shape
    xu = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.int32)
    px = xu.reshape(n, h * w, c)
    chunk = 32
    hist_parts = []
    for b0 in range(0, 256, chunk):
        bins = jnp.arange(b0, b0 + chunk, dtype=jnp.int32)
        eq = px[:, :, :, None] == bins  # (N, P, C, chunk) bool
        hist_parts.append(jnp.sum(eq, axis=1, dtype=jnp.float32))
    hist = jnp.concatenate(hist_parts, axis=-1)  # (N, C, 256)
    npix = float(h * w)
    step = jnp.floor((npix - hist[..., 255]) / 255.0)  # (N, C)
    cum = jnp.cumsum(hist, axis=-1) - hist  # exclusive prefix sum
    lut = jnp.floor(
        (cum + jnp.floor(step / 2.0)[..., None])
        / jnp.maximum(step, 1.0)[..., None]
    )
    lut = jnp.clip(lut, 0, 255)
    ident = jnp.arange(256, dtype=jnp.float32)
    lut = jnp.where((step > 0)[..., None], lut, ident)
    y = jnp.zeros_like(px, dtype=jnp.float32)
    for b0 in range(0, 256, chunk):
        bins = jnp.arange(b0, b0 + chunk, dtype=jnp.int32)
        eq = (px[:, :, :, None] == bins).astype(jnp.float32)
        y = y + jnp.einsum("npcb,ncb->npc", eq, lut[:, :, b0:b0 + chunk])
    return (y / 255.0).reshape(n, h, w, c).astype(x.dtype)


_PIXEL_OPS = (
    ("autocontrast", _autocontrast),
    ("equalize", _equalize),
    ("invert", _invert),
    ("posterize", _posterize),
    ("solarize", _solarize),
    ("solarize_add", _solarize_add),
    ("color", _color),
    ("contrast", _contrast),
    ("brightness", _brightness),
    ("sharpness", _sharpness),
)
_GEOM_OPS = ("rotate", "shear_x", "shear_y", "translate_x", "translate_y")
NUM_OPS = len(_PIXEL_OPS) + len(_GEOM_OPS)


# ---------------------------------------------------------- geometric ops


def _affine_params(op_idx, m, sign, h, w):
    """Per-sample 2x3 affine (output px -> source px, center-origin) for the
    geometric ops; identity rows for samples whose op is pixel-level."""
    n_pix = len(_PIXEL_OPS)
    is_rot = op_idx == n_pix
    is_shx = op_idx == n_pix + 1
    is_shy = op_idx == n_pix + 2
    is_trx = op_idx == n_pix + 3
    is_try = op_idx == n_pix + 4

    theta = jnp.where(is_rot, jnp.deg2rad(30.0) * m * sign, 0.0)
    shear = 0.3 * m * sign
    shx = jnp.where(is_shx, shear, 0.0)
    shy = jnp.where(is_shy, shear, 0.0)
    tx = jnp.where(is_trx, 0.45 * m * sign * w, 0.0)
    ty = jnp.where(is_try, 0.45 * m * sign * h, 0.0)

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # rotation * shear composition (only one is ever non-identity per sample)
    a00 = cos
    a01 = -sin + shy
    a10 = sin + shx
    a11 = cos
    return a00, a01, a10, a11, ty, tx


def _affine_sample(x, a00, a01, a10, a11, ty, tx, fill=0.5):
    """Bilinear per-sample affine resample; coordinates map output->source
    around the image center; out-of-bounds fills with mid-gray (timm's
    gray fill)."""
    n, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    # (N, H, W) source coordinates: [sy, sx] = A @ [ys, xs] + [ty, tx]
    sy = a00[:, None, None] * ys + a01[:, None, None] * xs + cy + ty[:, None, None]
    sx = a10[:, None, None] * ys + a11[:, None, None] * xs + cx + tx[:, None, None]

    def one(img, syi, sxi):
        def ch(cimg):
            return jax.scipy.ndimage.map_coordinates(
                cimg, [syi, sxi], order=1, mode="constant", cval=fill
            )
        return jnp.stack([ch(img[..., i]) for i in range(c)], axis=-1)

    return jax.vmap(one)(x.astype(jnp.float32), sy, sx).astype(x.dtype)


# ------------------------------------------------------------- RandAugment


class RandAugmentConfig(NamedTuple):
    num_layers: int = 2
    magnitude: float = 9.0
    mag_std: float = 0.5


def parse_rand_augment(spec: str | None) -> RandAugmentConfig | None:
    """Parse a timm-style policy string: 'rand-m9-mstd0.5[-n2][-inc1]'.

    ``inc`` is accepted as a no-op because the op pool already implements
    the increasing-severity mappings (see note below)."""
    if not spec:
        return None
    if not spec.startswith("rand"):
        raise ValueError(f"only 'rand-*' auto-augment policies supported, "
                         f"got {spec!r}")
    # Op magnitude mappings implement timm's INCREASING-severity variants
    # (Posterize/Solarize/Color/Contrast/Brightness/Sharpness-Increasing) —
    # i.e. the '-inc1' policy, which is the reference finetune default
    # (main_finetune.py:197-205: 'rand-m9-mstd0.5-inc1').
    cfg = RandAugmentConfig()
    for tok in spec.split("-")[1:]:
        if m := re.fullmatch(r"m(\d+)", tok):
            cfg = cfg._replace(magnitude=float(m.group(1)))
        elif m := re.fullmatch(r"mstd([\d.]+)", tok):
            cfg = cfg._replace(mag_std=float(m.group(1)))
        elif m := re.fullmatch(r"n(\d+)", tok):
            cfg = cfg._replace(num_layers=int(m.group(1)))
        elif re.fullmatch(r"inc\d*", tok):
            pass
        else:
            raise ValueError(f"unknown rand-augment token {tok!r} in {spec!r}")
    return cfg


def rand_augment(
    rng: jax.Array, imgs: jnp.ndarray, cfg: RandAugmentConfig
) -> jnp.ndarray:
    """Apply ``cfg.num_layers`` random ops per sample. imgs: [0,1] NHWC."""
    n = imgs.shape[0]
    h, w = imgs.shape[1], imgs.shape[2]
    x = imgs
    for layer in range(cfg.num_layers):
        k_op, k_mag, k_sign, k_apply = jax.random.split(
            jax.random.fold_in(rng, layer), 4)
        op_idx = jax.random.randint(k_op, (n,), 0, NUM_OPS)
        m = jnp.clip(
            cfg.magnitude + cfg.mag_std * jax.random.normal(k_mag, (n,)),
            0.0, 10.0,
        ) / 10.0
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)), 1.0, -1.0)

        out = x
        for i, (_, fn) in enumerate(_PIXEL_OPS):
            sel = (op_idx == i)[:, None, None, None]
            out = jnp.where(sel, fn(x, m, sign), out)
        is_geom = (op_idx >= len(_PIXEL_OPS))[:, None, None, None]
        geo = _affine_sample(x, *_affine_params(op_idx, m, sign, h, w))
        transformed = jnp.where(is_geom, geo, out)
        # timm's rand policy applies each selected op with prob 0.5
        # (AugmentOp prob=0.5) — without this the recipe is ~2x stronger
        # than the flag names.
        apply = jax.random.bernoulli(k_apply, 0.5, (n,))[:, None, None, None]
        x = jnp.where(apply, transformed, x)
    return x


# ------------------------------------------------------------- ColorJitter


def color_jitter(
    rng: jax.Array, imgs: jnp.ndarray, factor: float
) -> jnp.ndarray:
    """torchvision ColorJitter(f, f, f) semantics: per-sample brightness/
    contrast/saturation factors ~ U[max(0, 1-f), 1+f]. Applied in fixed
    b->c->s order (torchvision randomizes the order per call; the
    difference is below augmentation noise and a fixed order keeps the
    program branchless). imgs: [0,1] NHWC."""
    n = imgs.shape[0]
    kb, kc, ks = jax.random.split(rng, 3)
    lo = max(0.0, 1.0 - factor)
    hi = 1.0 + factor
    fb = jax.random.uniform(kb, (n,), minval=lo, maxval=hi)
    fc = jax.random.uniform(kc, (n,), minval=lo, maxval=hi)
    fs = jax.random.uniform(ks, (n,), minval=lo, maxval=hi)
    x = _blend(jnp.zeros_like(imgs), imgs, fb)
    gm = jnp.mean(_gray(x), axis=(1, 2))
    x = _blend(jnp.broadcast_to(gm[:, None, None, None], x.shape), x, fc)
    g = jnp.broadcast_to(_gray(x)[..., None], x.shape)
    return _blend(g, x, fs)


# ---------------------------------------------------------- RandomErasing


def random_erasing(
    rng: jax.Array,
    imgs: jnp.ndarray,
    prob: float,
    mode: str = "pixel",
    count: int = 1,
    area_range: tuple[float, float] = (0.02, 1.0 / 3.0),
    aspect_range: tuple[float, float] = (0.3, 10.0 / 3.0),
) -> jnp.ndarray:
    """timm RandomErasing: per-sample, with probability ``prob``, erase
    ``count`` rectangles; 'pixel' mode fills with per-pixel N(0,1) noise
    (applied AFTER normalization, like timm), 'const' fills with 0.
    imgs: NHWC (normalized)."""
    if prob <= 0:
        return imgs
    assert mode in ("pixel", "const"), mode
    n, h, w, c = imgs.shape
    x = imgs
    # timm draws the erase decision ONCE per image, then erases all `count`
    # rectangles on the selected images (not an independent coin per box).
    apply = jax.random.bernoulli(jax.random.fold_in(rng, count), prob, (n,))
    for r in range(count):
        k = jax.random.fold_in(rng, r)
        _, k_area, k_aspect, k_y, k_x, k_noise = jax.random.split(k, 6)
        # timm divides the drawn target area by `count` (RandomErasing._erase:
        # `* area / count`) so the TOTAL erased fraction stays in area_range
        # regardless of --recount; without it count=3 erases ~3x the
        # intended area.
        area = jax.random.uniform(
            k_area, (n,), minval=area_range[0], maxval=area_range[1]
        ) * (h * w / count)
        log_ar = (jnp.log(aspect_range[0]), jnp.log(aspect_range[1]))
        ar = jnp.exp(jax.random.uniform(k_aspect, (n,), minval=log_ar[0],
                                        maxval=log_ar[1]))
        eh = jnp.minimum(jnp.sqrt(area * ar), float(h))
        ew = jnp.minimum(jnp.sqrt(area / ar), float(w))
        y0 = jax.random.uniform(k_y, (n,)) * (h - eh)
        x0 = jax.random.uniform(k_x, (n,)) * (w - ew)
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
        inside = (
            (ys >= y0[:, None, None]) & (ys < (y0 + eh)[:, None, None])
            & (xs >= x0[:, None, None]) & (xs < (x0 + ew)[:, None, None])
        )
        mask = (inside & apply[:, None, None])[..., None]
        fill = (
            jax.random.normal(k_noise, x.shape, x.dtype)
            if mode == "pixel" else jnp.zeros_like(x)
        )
        x = jnp.where(mask, fill, x)
    return x
