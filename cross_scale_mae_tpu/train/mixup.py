"""On-device Mixup / CutMix with label smoothing.

The reference uses ``timm.data.Mixup`` on the host (patched for device
placement, ``main_finetune.py:39-55``, configured at ``:517-530``). Here the
mix runs inside the jitted step with all three timm modes (``--mixup_mode``
batch/pair/elem, main_finetune.py:264): per-element (N,) lambda/switch/apply
vectors — broadcast for batch, mirrored across partner pairs for pair,
independent for elem. The mixing partner is the reversed batch and CutMix
uses rectangle masks built from broadcasted iotas (static shapes, no
dynamic slicing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops.numerics import at_least_f32


def smooth_one_hot(
    labels: jnp.ndarray, num_classes: int, smoothing: float
) -> jnp.ndarray:
    # timm one_hot convention: on = 1 - smoothing + off (targets sum to 1).
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (1.0 - smoothing) + off


def _beta(rng: jax.Array, alpha: float, shape: tuple = ()) -> jnp.ndarray:
    """Beta(alpha, alpha) samples via Jöhnk's algorithm, any shape.

    ``jax.random.beta`` compiles the full gamma rejection sampler — far too
    heavy for per-step scalars. Jöhnk: U^(1/a), V^(1/a); accept when the
    sum <= 1; 16 parallel candidates make rejection failure ~1e-6 at
    alpha=0.8 (falls back to 0.5). Pure vector ops, trivial to compile.
    """
    ku, kv = jax.random.split(rng)
    u = jax.random.uniform(ku, (16,) + shape, minval=1e-7)
    v = jax.random.uniform(kv, (16,) + shape, minval=1e-7)
    x = u ** (1.0 / alpha)
    s = x + v ** (1.0 / alpha)
    valid = s <= 1.0
    idx = jnp.argmax(valid, axis=0)  # first accepted candidate per element
    xs = jnp.take_along_axis(x, idx[None], axis=0)[0]
    ss = jnp.take_along_axis(s, idx[None], axis=0)[0]
    lam = xs / jnp.maximum(ss, 1e-12)
    return jnp.where(jnp.any(valid, axis=0), lam, 0.5)


def _cutmix_mask(
    rng: jax.Array, n: int, h: int, w: int, lam: jnp.ndarray,
    minmax: tuple[float, float] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample rectangle masks (N, H, W) with area ratio ~ (1-lam) each,
    plus the area-corrected lam (timm correct_lam=True). lam: (N,).

    With ``minmax`` (timm cutmix_minmax / rand_bbox_minmax): cut height and
    width fractions are drawn INDEPENDENTLY uniform in [min, max] and the
    box is placed fully inside the image; ``lam`` is ignored."""
    if minmax is not None:
        kh, kw, ky, kx = jax.random.split(rng, 4)
        ch = jax.random.uniform(kh, (n,), minval=minmax[0],
                                maxval=minmax[1]) * h
        cw = jax.random.uniform(kw, (n,), minval=minmax[0],
                                maxval=minmax[1]) * w
        y0 = jax.random.uniform(ky, (n,)) * (h - ch)
        x0 = jax.random.uniform(kx, (n,)) * (w - cw)
        y1, x1 = y0 + ch, x0 + cw
    else:
        cut = jnp.sqrt(1.0 - lam)  # (N,)
        ch, cw = cut * h, cut * w
        ky, kx = jax.random.split(rng)
        cy = jax.random.uniform(ky, (n,)) * h
        cx = jax.random.uniform(kx, (n,)) * w
        y0, y1 = jnp.clip(cy - ch / 2, 0, h), jnp.clip(cy + ch / 2, 0, h)
        x0, x1 = jnp.clip(cx - cw / 2, 0, w), jnp.clip(cx + cw / 2, 0, w)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    inside = (
        (ys >= y0[:, None, None]) & (ys < y1[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < x1[:, None, None])
    )
    lam_adj = 1.0 - (y1 - y0) * (x1 - x0) / (h * w)
    return inside, lam_adj


def _mirror_pairs(vals: jnp.ndarray) -> jnp.ndarray:
    """(N,) array where element i and its mixing partner N-1-i share the
    first half's draw (timm's pair mode mixes pairs symmetrically)."""
    half = vals[: vals.shape[0] // 2]
    return jnp.concatenate([half, half[::-1]])


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
    mode: str = "batch",
    cutmix_minmax: tuple[float, float] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mixed_imgs, soft_targets). imgs: NHWC; labels: (N,) ints.

    ``mode`` follows timm's Mixup (main_finetune.py:527 passes
    ``--mixup_mode`` through): 'batch' = one lambda/box for the whole batch,
    'elem' = independent per-sample draws, 'pair' = per-pair draws shared
    symmetrically between element i and its partner N-1-i (the reference's
    FixedDeviceMixup asserts an even batch for this, main_finetune.py:41).
    All three are one branchless program: per-element (N,) lambda/switch/
    apply vectors, drawn per the mode.
    """
    assert mode in ("batch", "pair", "elem"), mode
    n, h, w, _ = imgs.shape
    k_apply, k_switch, k_lam, k_box = jax.random.split(rng, 4)
    targets = smooth_one_hot(labels, num_classes, smoothing)
    if cutmix_minmax is not None:
        # timm: an explicit min/max cut-fraction range overrides the beta
        # draw and force-enables cutmix (Mixup.__init__).
        cutmix_alpha = 1.0
    if mixup_alpha <= 0 and cutmix_alpha <= 0:
        return imgs, targets
    if mode == "pair":
        assert n % 2 == 0, "pair mode needs an even batch"

    # Per-element draw shapes: batch broadcasts one scalar draw; pair draws
    # N/2 and mirrors; elem draws N.
    def draw(fn):
        if mode == "batch":
            return jnp.broadcast_to(fn(()), (n,))
        if mode == "pair":
            return _mirror_pairs(fn((n,)))  # uses first half's draws
        return fn((n,))

    use_cutmix = draw(
        lambda s: jax.random.bernoulli(k_switch, switch_prob, s)
        if (mixup_alpha > 0 and cutmix_alpha > 0)
        else jnp.broadcast_to(jnp.asarray(cutmix_alpha > 0), s)
    )
    lam_mix = draw(
        lambda s: _beta(k_lam, mixup_alpha, s)
        if mixup_alpha > 0 else jnp.ones(s)
    )
    lam_cut_raw = draw(
        lambda s: _beta(jax.random.fold_in(k_lam, 1), cutmix_alpha, s)
        if cutmix_alpha > 0 else jnp.ones(s)
    )
    apply = draw(lambda s: jax.random.bernoulli(k_apply, prob, s))

    flipped_imgs = imgs[::-1]
    flipped_targets = targets[::-1]

    # Boxes: per-element, with pair/batch modes sharing coordinates the same
    # way they share lambdas (mirror/broadcast the center draws).
    if mode == "batch":
        box, lam_cut = _cutmix_mask(k_box, 1, h, w, lam_cut_raw[:1],
                                    minmax=cutmix_minmax)
        box = jnp.broadcast_to(box, (n, h, w))
        lam_cut = jnp.broadcast_to(lam_cut, (n,))
    elif mode == "pair":
        box_half, lam_half = _cutmix_mask(
            k_box, n // 2, h, w, lam_cut_raw[: n // 2], minmax=cutmix_minmax
        )
        box = jnp.concatenate([box_half, box_half[::-1]])
        lam_cut = jnp.concatenate([lam_half, lam_half[::-1]])
    else:
        box, lam_cut = _cutmix_mask(k_box, n, h, w, lam_cut_raw,
                                    minmax=cutmix_minmax)

    cutmix_imgs = jnp.where(box[..., None], flipped_imgs, imgs)
    lam = jnp.where(use_cutmix, lam_cut, lam_mix)
    mixup_imgs = (
        lam_mix[:, None, None, None] * imgs
        + (1 - lam_mix)[:, None, None, None] * flipped_imgs
    )
    mixed = jnp.where(
        use_cutmix[:, None, None, None], cutmix_imgs,
        mixup_imgs.astype(imgs.dtype),
    )

    out_imgs = jnp.where(apply[:, None, None, None], mixed, imgs)
    lam_t = lam[:, None]
    out_targets = jnp.where(
        apply[:, None],
        lam_t * targets + (1 - lam_t) * flipped_targets,
        targets,
    )
    return out_imgs, out_targets


def soft_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """timm SoftTargetCrossEntropy: mean over batch of -sum(t * log_softmax)."""
    logp = jax.nn.log_softmax(at_least_f32(logits), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))
