"""Masked reconstruction losses.

Re-implements the reference's string-dispatched loss registry
``forward_loss_{mse,l2,mae,l1,bce,ssim,ms_ssim,mse_ssim,mse_ms_ssim}``
(``models_mae/MAE_ViT_Shared.py:113-267``) as pure functions on
``(target, pred, mask)`` in patch space. The masked-mean reduction is
``(per_patch * mask).sum() / mask.sum()`` with mask 1 = reconstructed
(MAE_ViT_Shared.py:119). Everything is computed in fp32 regardless of the
activation dtype.

These same functions also serve as the latent / cross-predictor losses
(called with ``mask=None``, e.g. MAE_ViT_MsLdLe.py:44, MAE_ViT_MsLdCd.py:49-51).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops.numerics import at_least_f32
from cross_scale_mae_tpu.ops.patchify import unpatchify
from cross_scale_mae_tpu.ops.ssim import ms_ssim, ssim


def _masked_mean(per_patch: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(per_patch)
    mask = mask.astype(per_patch.dtype)
    return jnp.sum(per_patch * mask) / jnp.sum(mask)


def _f32(*xs):
    return tuple(at_least_f32(x) for x in xs)


def scale_01(x: jnp.ndarray) -> jnp.ndarray:
    """Global min-max rescale (MAE_ViT_Shared.py:93-94)."""
    return (x - x.min()) / (x.max() - x.min() + 1.0e-6)


def process_target(
    imgs: jnp.ndarray, patch_size: int, channels: int, norm_pix_loss: bool
) -> jnp.ndarray:
    """Patchify target images; optional per-patch normalization
    (MAE_ViT_Shared.py:97-111). imgs: NHWC."""
    from cross_scale_mae_tpu.ops.patchify import patchify

    target = patchify(at_least_f32(imgs), patch_size)
    if norm_pix_loss:
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True, ddof=1)  # torch unbiased var
        target = (target - mean) / jnp.sqrt(var + 1.0e-6)
    return target


def loss_mse(target, pred, mask=None, **kw):
    target, pred = _f32(target, pred)
    return _masked_mean(jnp.mean((pred - target) ** 2, axis=-1), mask)


def loss_l2(target, pred, mask=None, **kw):
    target, pred = _f32(target, pred)
    return _masked_mean(jnp.sum((pred - target) ** 2, axis=-1), mask)


def loss_mae(target, pred, mask=None, **kw):
    target, pred = _f32(target, pred)
    return _masked_mean(jnp.mean(jnp.abs(pred - target), axis=-1), mask)


def loss_l1(target, pred, mask=None, **kw):
    target, pred = _f32(target, pred)
    return _masked_mean(jnp.sum(jnp.abs(pred - target), axis=-1), mask)


def loss_bce(target, pred, mask=None, **kw):
    """BCE-with-logits against a 0-1 rescaled target (MAE_ViT_Shared.py:160-177)."""
    target, pred = _f32(target, pred)
    target = scale_01(target)
    # Numerically stable binary_cross_entropy_with_logits.
    per_elem = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return _masked_mean(jnp.mean(per_elem, axis=-1), mask)


def _ssim_family(
    target, pred, mask, patch_size, channels, fn, **fn_kw
):
    """Shared prep for ssim/ms_ssim losses (MAE_ViT_Shared.py:179-267):
    rescale both to [0,1], unpatchify to images, zero out visible patches."""
    target, pred = _f32(target, pred)
    target, pred = scale_01(target), scale_01(pred)
    assert patch_size is not None and channels is not None, (
        "ssim losses need patch_size/channels to unpatchify"
    )
    timg = unpatchify(target, patch_size, channels)
    pimg = unpatchify(pred, patch_size, channels)
    if mask is not None:
        mimg = unpatchify(
            jnp.repeat(at_least_f32(mask[:, :, None]),
                       patch_size * patch_size * channels, axis=-1),
            patch_size, channels,
        )
        timg, pimg = timg * mimg, pimg * mimg
    return 1.0 - fn(pimg, timg, data_range=1.0, size_average=True, **fn_kw)


def loss_ssim(target, pred, mask=None, patch_size=None, channels=None, **kw):
    return _ssim_family(
        target, pred, mask, patch_size, channels, ssim, nonnegative_ssim=True
    )


def loss_ms_ssim(target, pred, mask=None, patch_size=None, channels=None, **kw):
    return _ssim_family(target, pred, mask, patch_size, channels, ms_ssim)


def loss_mse_ssim(target, pred, mask=None, weight=0.1, **kw):
    return loss_mse(target, pred, mask=mask, **kw) + weight * loss_ssim(
        target, pred, mask=mask, **kw
    )


def loss_mse_ms_ssim(target, pred, mask=None, weight=0.1, **kw):
    return loss_mse(target, pred, mask=mask, **kw) + weight * loss_ms_ssim(
        target, pred, mask=mask, **kw
    )


RECON_LOSSES: dict[str, Callable] = {
    "mse": loss_mse,
    "l2": loss_l2,
    "mae": loss_mae,
    "l1": loss_l1,
    "bce": loss_bce,
    "ssim": loss_ssim,
    "ms_ssim": loss_ms_ssim,
    "mse_ssim": loss_mse_ssim,
    "mse_ms_ssim": loss_mse_ms_ssim,
}


def recon_loss(
    name: str,
    target: jnp.ndarray,
    pred: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    patch_size: Optional[int] = None,
    channels: Optional[int] = None,
) -> jnp.ndarray:
    """Dispatch by name — the registry at MAE_ViT_Shared.py:19."""
    try:
        fn = RECON_LOSSES[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown loss {name!r}; known: {sorted(RECON_LOSSES)}"
        ) from None
    return fn(target, pred, mask=mask, patch_size=patch_size, channels=channels)
