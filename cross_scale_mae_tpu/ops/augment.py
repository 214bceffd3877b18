"""Fused on-device preprocessing pipelines (uint8 batch -> model input).

The reference runs this chain on CPU workers per image
(``util/datasets.py:123-158``): ToTensor -> Normalize -> HFlip -> VFlip ->
RandomResizedCrop(scale (0.25,1.0), bicubic) for train; Resize(x/0.875) ->
CenterCrop for eval. Here the same chain is a jit-able function executed on
device as part of the train step (BASELINE.json north-star requirement), so
the host ships raw uint8 and the augmentation rides the MXU/VPU.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops.image import (
    center_crop_resize,
    normalize_images,
    random_flips,
    random_resized_crop,
    random_rot90,
)


def make_pretrain_augment(
    mean: Sequence[float],
    std: Sequence[float],
    input_size: int,
    *,
    scale: tuple[float, float] = (0.25, 1.0),
    hflip: bool = True,
    vflip: bool = True,
    rot90: bool = False,
    method: str = "cubic",
    normalize: bool = True,
    dtype: str = "float32",
) -> Callable[[jax.Array, jnp.ndarray], jnp.ndarray]:
    """Train-time chain (util/datasets.py:123-138), fused on device.
    ``rot90`` adds the NAIP-style random rotation (util/naip_loader.py)."""

    def augment(rng: jax.Array, batch_u8: jnp.ndarray) -> jnp.ndarray:
        k_flip, k_rot, k_crop = jax.random.split(rng, 3)
        x = batch_u8.astype(jnp.dtype(dtype)) / 255.0
        if normalize:
            x = normalize_images(x, mean, std)
        x = random_flips(k_flip, x, hflip, vflip)
        if rot90:
            x = random_rot90(k_rot, x)
        x = random_resized_crop(k_crop, x, input_size, scale, method=method)
        return x

    return augment


def make_finetune_augment(
    mean: Sequence[float],
    std: Sequence[float],
    input_size: int,
    *,
    scale: tuple[float, float] = (0.25, 1.0),
    hflip: bool = True,
    vflip: bool = True,
    rot90: bool = False,
    color_jitter: float | None = None,
    aa: str | None = None,
    reprob: float = 0.0,
    remode: str = "pixel",
    recount: int = 1,
    method: str = "cubic",
    normalize: bool = True,
    dtype: str = "float32",
) -> Callable[[jax.Array, jnp.ndarray], jnp.ndarray]:
    """Finetune train chain with the full flag surface, fused on device.

    Order: flips -> RandomResizedCrop -> RandAugment (or ColorJitter —
    like timm, AA disables jitter) on [0,1] pixels -> Normalize ->
    RandomErasing on the normalized tensor. (timm's create_transform puts
    the crop before the flips; the two commute distributionally and this
    order keeps the pretrain chain's RNG draw sequence.) The
    reference DECLARES these flags (main_finetune.py:188-232) but its
    build_transform never consumes them — implemented functionally here
    (match-or-fix, SURVEY.md §7). With none of the extras set this chain is
    numerically the reference train transform (all its ops are linear and
    commute with the normalize).
    """
    from cross_scale_mae_tpu.ops.randaug import (
        color_jitter as jitter_fn,
        parse_rand_augment,
        rand_augment,
        random_erasing,
    )

    ra_cfg = parse_rand_augment(aa)

    def augment(rng: jax.Array, batch_u8: jnp.ndarray) -> jnp.ndarray:
        k_flip, k_rot, k_crop, k_aa, k_erase = jax.random.split(rng, 5)
        x = batch_u8.astype(jnp.float32) / 255.0
        x = random_flips(k_flip, x, hflip, vflip)
        if rot90:
            x = random_rot90(k_rot, x)
        x = random_resized_crop(k_crop, x, input_size, scale, method=method)
        if ra_cfg is not None:
            x = rand_augment(k_aa, x, ra_cfg)
        elif color_jitter:
            x = jitter_fn(k_aa, x, color_jitter)
        if normalize:
            x = normalize_images(x, mean, std)
        if reprob > 0:
            x = random_erasing(k_erase, x, reprob, mode=remode, count=recount)
        return x.astype(jnp.dtype(dtype))

    return augment


def make_eval_preprocess(
    mean: Sequence[float],
    std: Sequence[float],
    input_size: int,
    *,
    normalize: bool = True,
    dtype: str = "float32",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Eval chain: Normalize -> Resize(1/0.875) -> CenterCrop
    (util/datasets.py:140-158). The host canvas should be
    input_size/0.875-sized (data/datasets.py canvas_scale)."""

    def preprocess(batch_u8: jnp.ndarray) -> jnp.ndarray:
        x = batch_u8.astype(jnp.dtype(dtype)) / 255.0
        if normalize:
            x = normalize_images(x, mean, std)
        if x.shape[1] != input_size:
            x = center_crop_resize(x, input_size)
        return x

    return preprocess
