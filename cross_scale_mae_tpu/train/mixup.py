"""On-device Mixup / CutMix with label smoothing.

The reference uses ``timm.data.Mixup`` on the host (patched for device
placement, ``main_finetune.py:39-55``, configured at ``:517-530``). Here the
mix runs inside the jitted step: one lambda per batch (timm's default
``mode='batch'``), the mixing partner is the reversed batch, and CutMix uses
a rectangle mask built from broadcasted iotas (static shapes, no dynamic
slicing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_one_hot(
    labels: jnp.ndarray, num_classes: int, smoothing: float
) -> jnp.ndarray:
    # timm one_hot convention: on = 1 - smoothing + off (targets sum to 1).
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (1.0 - smoothing) + off


def _beta(rng: jax.Array, alpha: float) -> jnp.ndarray:
    """Beta(alpha, alpha) sample via Jöhnk's algorithm.

    ``jax.random.beta`` compiles the full gamma rejection sampler — far too
    heavy for one scalar per step. Jöhnk: U^(1/a), V^(1/a); accept when the
    sum <= 1; 16 parallel candidates make rejection failure ~1e-6 at
    alpha=0.8 (falls back to 0.5). Pure vector ops, trivial to compile.
    """
    ku, kv = jax.random.split(rng)
    u = jax.random.uniform(ku, (16,), minval=1e-7)
    v = jax.random.uniform(kv, (16,), minval=1e-7)
    x = u ** (1.0 / alpha)
    y = v ** (1.0 / alpha)
    s = x + y
    valid = s <= 1.0
    idx = jnp.argmax(valid)  # first accepted candidate
    lam = x[idx] / jnp.maximum(s[idx], 1e-12)
    return jnp.where(jnp.any(valid), lam, 0.5)


def _cutmix_mask(rng: jax.Array, h: int, w: int, lam: jnp.ndarray) -> jnp.ndarray:
    """Rectangle mask (1 inside the pasted box) with area ratio ~ (1-lam)."""
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = cut * h, cut * w
    ky, kx = jax.random.split(rng)
    cy = jax.random.uniform(ky) * h
    cx = jax.random.uniform(kx) * w
    y0, y1 = jnp.clip(cy - ch / 2, 0, h), jnp.clip(cy + ch / 2, 0, h)
    x0, x1 = jnp.clip(cx - cw / 2, 0, w), jnp.clip(cx + cw / 2, 0, w)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    return inside, 1.0 - (y1 - y0) * (x1 - x0) / (h * w)  # corrected lam


def mixup_cutmix(
    rng: jax.Array,
    imgs: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mixed_imgs, soft_targets). imgs: NHWC; labels: (N,) ints."""
    n, h, w, _ = imgs.shape
    k_apply, k_switch, k_lam, k_box = jax.random.split(rng, 4)
    targets = smooth_one_hot(labels, num_classes, smoothing)
    if mixup_alpha <= 0 and cutmix_alpha <= 0:
        return imgs, targets

    use_cutmix = (
        jax.random.bernoulli(k_switch, switch_prob)
        if (mixup_alpha > 0 and cutmix_alpha > 0)
        else jnp.asarray(cutmix_alpha > 0)
    )
    lam_mix = _beta(k_lam, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1.0)
    lam_cut = _beta(jax.random.fold_in(k_lam, 1), cutmix_alpha) if cutmix_alpha > 0 \
        else jnp.float32(1.0)

    flipped_imgs = imgs[::-1]
    flipped_targets = targets[::-1]

    box, lam_cut_adj = _cutmix_mask(k_box, h, w, lam_cut)
    cutmix_imgs = jnp.where(box[None, :, :, None], flipped_imgs, imgs)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    mixup_imgs = lam_mix * imgs + (1 - lam_mix) * flipped_imgs
    mixed = jnp.where(use_cutmix, cutmix_imgs, mixup_imgs.astype(imgs.dtype))

    apply = jax.random.bernoulli(k_apply, prob)
    out_imgs = jnp.where(apply, mixed, imgs)
    out_targets = jnp.where(
        apply, lam * targets + (1 - lam) * flipped_targets, targets
    )
    return out_imgs, out_targets


def soft_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """timm SoftTargetCrossEntropy: mean over batch of -sum(t * log_softmax)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))
