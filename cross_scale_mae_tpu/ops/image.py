"""On-device image augmentation, built for the MXU.

The reference does augmentation on CPU dataloader workers
(``util/datasets.py:123-138``) and one crop on-GPU via torchvision
(``models_mae/MAE_ViT_MsLd.py:29-35``). Here every augmentation runs inside
the jitted train step:

* **Crop+resize as two batched matmuls.** A per-sample crop box becomes a
  pair of interpolation-weight matrices ``W_y (out, H)`` and ``W_x (out, W)``;
  the resampled image is ``W_y @ img @ W_xᵀ`` per channel. XLA maps these
  einsums onto the MXU — no dynamic shapes, no serialized gathers.
* **Loop-free box sampling** following the BYOL/TF-TPU formulation the
  reference ships but never uses (``util/crop.py:21-41``): one uniform draw
  for area, one for log-aspect, two for position. (The torch version rounds
  box sizes to integer pixels; we keep them continuous — same distribution,
  XLA-friendly.)
* Flips are per-sample ``jnp.where`` selects on a reversed view (VPU moves).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def normalize_images(
    imgs: jnp.ndarray, mean: tuple | jnp.ndarray, std: tuple | jnp.ndarray
) -> jnp.ndarray:
    """(x - mean) / std per channel; NHWC. Reference: transforms.Normalize."""
    mean = jnp.asarray(mean, imgs.dtype)
    std = jnp.asarray(std, imgs.dtype)
    return (imgs - mean) / std


def denormalize_images(imgs, mean, std):
    mean = jnp.asarray(mean, imgs.dtype)
    std = jnp.asarray(std, imgs.dtype)
    return imgs * std + mean


def random_flips(
    rng: jax.Array, imgs: jnp.ndarray, horizontal: bool = True, vertical: bool = True
) -> jnp.ndarray:
    """Per-sample 0.5-probability H/V flips (reference: RandomHorizontal/VerticalFlip)."""
    n = imgs.shape[0]
    kh, kv = jax.random.split(rng)
    if horizontal:
        flip = jax.random.bernoulli(kh, 0.5, (n,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
    if vertical:
        flip = jax.random.bernoulli(kv, 0.5, (n,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, ::-1, :, :], imgs)
    return imgs


def random_rot90(rng: jax.Array, imgs: jnp.ndarray) -> jnp.ndarray:
    """Per-sample uniform k*90-degree rotation (reference NAIP transforms,
    util/naip_loader.py:17-57 flip/rotate augmentation). Square NHWC only."""
    n = imgs.shape[0]
    k = jax.random.randint(rng, (n,), 0, 4)
    r1 = jnp.rot90(imgs, 1, axes=(1, 2))
    r2 = jnp.rot90(imgs, 2, axes=(1, 2))
    r3 = jnp.rot90(imgs, 3, axes=(1, 2))
    out = jnp.where((k == 1)[:, None, None, None], r1, imgs)
    out = jnp.where((k == 2)[:, None, None, None], r2, out)
    return jnp.where((k == 3)[:, None, None, None], r3, out)


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel (the torch 'bicubic' convention, a=-0.75)."""
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    f1 = (a + 2) * at3 - (a + 3) * at2 + 1
    f2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, f1, jnp.where(at < 2, f2, 0.0))


def _resample_matrix(
    src_len: int, out_len: int, start: jnp.ndarray, length: jnp.ndarray, method: str
) -> jnp.ndarray:
    """Interpolation-weight matrix (out_len, src_len) for one axis of one sample.

    Maps output pixel o to source coordinate
    ``start + (o + 0.5) * (length / out_len) - 0.5`` (align_corners=False).
    ``start``/``length`` are scalars (may be traced). Built from one-hot
    scatters so the whole thing stays dense and batchable.
    """
    scale = length / out_len
    dst = jnp.arange(out_len, dtype=jnp.float32)
    src = start + (dst + 0.5) * scale - 0.5  # (out,)
    if method == "linear":
        taps, offs = 2, jnp.array([0.0, 1.0])
        base = jnp.floor(src)
        frac = src - base
        weights = jnp.stack([1.0 - frac, frac], axis=1)  # (out, 2)
    elif method == "cubic":
        taps, offs = 4, jnp.array([-1.0, 0.0, 1.0, 2.0])
        base = jnp.floor(src)
        frac = src - base
        t = frac[:, None] - offs[None, :]  # (out, 4) signed distances
        weights = _cubic_kernel(t)
        weights = weights / jnp.sum(weights, axis=1, keepdims=True)
    else:
        raise ValueError(f"unknown resample method {method!r}")
    idx = base[:, None] + offs[None, :]  # (out, taps)
    idx = jnp.clip(idx, 0, src_len - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, src_len, dtype=jnp.float32)  # (out, taps, src)
    return jnp.einsum("ot,ots->os", weights.astype(jnp.float32), onehot)


def crop_resize(
    imgs: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
    method: str = "linear",
    exact: bool = True,
) -> jnp.ndarray:
    """Batched per-sample crop+resize via weight-matrix matmuls.

    imgs: (N, H, W, C); boxes: (N, 4) rows of (top, left, height, width) in
    (possibly fractional) pixels. Returns (N, out_size, out_size, C).

    ``exact=True`` runs the einsums at fp32 HIGHEST precision (bit-parity
    with torch interpolate — used by metrics/eval/tests). ``exact=False``
    uses the fast MXU path (bf16 multipliers, fp32 accumulation) — plenty
    for training augmentation, ~8x the matmul rate.
    """
    n, h, w, c = imgs.shape
    row_mat = jax.vmap(
        lambda b: _resample_matrix(h, out_size, b[0], b[2], method)
    )(boxes)  # (N, out, H)
    col_mat = jax.vmap(
        lambda b: _resample_matrix(w, out_size, b[1], b[3], method)
    )(boxes)  # (N, out, W)
    dtype = imgs.dtype
    # Accumulate at fp32 — or wider when the input already is (fp64
    # equivalence runs must not round-trip through f32 here).
    acc = jnp.promote_types(dtype, jnp.float32)
    precision = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    tmp = jnp.einsum(
        "noh,nhwc->nowc", row_mat, imgs.astype(acc),
        preferred_element_type=acc, precision=precision,
    )
    out = jnp.einsum(
        "npw,nowc->nopc", col_mat, tmp,
        preferred_element_type=acc, precision=precision,
    )
    return out.astype(dtype)


def sample_crop_boxes(
    rng: jax.Array,
    n: int,
    height: int,
    width: int,
    scale: tuple[float, float],
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jnp.ndarray:
    """Loop-free RandomResizedCrop boxes (BYOL formulation, util/crop.py:21-41).

    Returns (N, 4) float boxes (top, left, h, w). Box sizes are clamped to the
    image; positions are uniform over the valid range.
    """
    k_area, k_ratio, k_i, k_j = jax.random.split(rng, 4)
    area = float(height * width)
    target_area = area * jax.random.uniform(
        k_area, (n,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = (jnp.log(ratio[0]), jnp.log(ratio[1]))
    aspect = jnp.exp(
        jax.random.uniform(k_ratio, (n,), minval=log_ratio[0], maxval=log_ratio[1])
    )
    w = jnp.minimum(jnp.sqrt(target_area * aspect), float(width))
    h = jnp.minimum(jnp.sqrt(target_area / aspect), float(height))
    i = jax.random.uniform(k_i, (n,)) * (height - h)
    j = jax.random.uniform(k_j, (n,)) * (width - w)
    return jnp.stack([i, j, h, w], axis=1)


def random_resized_crop(
    rng: jax.Array,
    imgs: jnp.ndarray,
    out_size: int,
    scale: tuple[float, float],
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "linear",
) -> jnp.ndarray:
    """Per-sample RandomResizedCrop, fully on-device.

    ``scale=(0.25, 0.75)`` with ``method='linear'`` reproduces the MsLd
    low-GSD view (MAE_ViT_MsLd.py:29-35, torchvision default bilinear);
    ``scale=(0.25, 1.0)`` with ``method='cubic'`` reproduces the dataset train
    augmentation (util/datasets.py:130-136). Training augmentation: uses the
    fast MXU path (exact=False).
    """
    n, h, w, _ = imgs.shape
    boxes = sample_crop_boxes(rng, n, h, w, scale, ratio)
    return crop_resize(imgs, boxes, out_size, method, exact=False)


def resize(imgs: jnp.ndarray, out_size: int, method: str = "cubic") -> jnp.ndarray:
    """Whole-image resize (shared weight matrix across the batch)."""
    n, h, w, c = imgs.shape
    boxes = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, float(h), float(w)]], jnp.float32), (n, 4)
    )
    return crop_resize(imgs, boxes, out_size, method)


def center_crop_resize(
    imgs: jnp.ndarray, out_size: int, crop_pct: float | None = None
) -> jnp.ndarray:
    """Eval transform: Resize(out/crop_pct) then CenterCrop(out), fused.

    Matches util/datasets.py:140-158: crop_pct = 224/256 for input <= 224,
    else 1.0. Equivalent to cropping a centered (crop_pct * min_side) box and
    resizing it to out_size.
    """
    n, h, w, _ = imgs.shape
    if crop_pct is None:
        crop_pct = 224.0 / 256.0 if out_size <= 224 else 1.0
    box_h, box_w = h * crop_pct, w * crop_pct
    top, left = (h - box_h) / 2.0, (w - box_w) / 2.0
    boxes = jnp.broadcast_to(
        jnp.array([[top, left, box_h, box_w]], jnp.float32), (n, 4)
    )
    return crop_resize(imgs, boxes, out_size, "cubic")
