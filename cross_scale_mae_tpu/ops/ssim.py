"""SSIM / MS-SSIM, matching pytorch_msssim semantics on TPU.

The reference uses ``pytorch_msssim.ssim/ms_ssim`` for the ssim-family
reconstruction losses (``models_mae/MAE_ViT_Shared.py:4, 170-267``) and eval
metrics (``util/metrics.py:36-46``). This is a from-scratch JAX version with
the same defaults: 11-tap Gaussian window (sigma 1.5), K=(0.01, 0.03),
separable depthwise convolution (valid padding), MS-SSIM weights
(0.0448, 0.2856, 0.3001, 0.2363, 0.1333) with 2x avg-pool between levels.

Layout is NHWC; the separable blur compiles to two depthwise convs the TPU
convolution emitter handles natively.
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(win_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, valid padding. x: (N, H, W, C)."""
    c = x.shape[-1]
    k = window.shape[0]
    kern_h = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x


def _ssim_maps(x, y, window, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1, mu2 = _blur(x, window), _blur(y, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(x * x, window) - mu1_sq
    sigma2_sq = _blur(y * y, window) - mu2_sq
    sigma12 = _blur(x * y, window) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map, cs_map


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
    nonnegative_ssim: bool = False,
) -> jnp.ndarray:
    """SSIM over NHWC images (pytorch_msssim.ssim parity)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    window = jnp.asarray(_gaussian_window(win_size, win_sigma))
    ssim_map, _ = _ssim_maps(x, y, window, data_range)
    # pytorch_msssim reduces to per-channel means (N, C) and applies the
    # nonnegative clamp per channel BEFORE averaging over channels — the
    # order matters when channels straddle zero.
    per_channel = jnp.mean(ssim_map, axis=(1, 2))
    if nonnegative_ssim:
        per_channel = jax.nn.relu(per_channel)
    return (
        jnp.mean(per_channel) if size_average else jnp.mean(per_channel, axis=1)
    )


def _avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x average pooling, matching pytorch_msssim's downsample exactly:
    ``F.avg_pool2d(kernel_size=2, padding=[s % 2 for s in shape])`` pads odd
    dims with one zero on BOTH sides and divides by the full kernel area
    (count_include_pad=True), so an odd dim's first window is (0, x[0]) and
    its trailing pad row goes unused."""
    n, h, w, c = x.shape
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    hh = (h + 2 * pad_h) // 2 * 2
    ww = (w + 2 * pad_w) // 2 * 2
    x = x[:, :hh, :ww]
    x = x.reshape(n, hh // 2, 2, ww // 2, 2, c)
    return jnp.sum(x, axis=(2, 4)) / 4.0


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
    weights: tuple = MS_SSIM_WEIGHTS,
) -> jnp.ndarray:
    """MS-SSIM over NHWC images; needs min(H, W) > 160 for 5 levels
    (util/metrics.py:39-40 notes the same constraint)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    smaller = min(x.shape[1], x.shape[2])
    assert smaller > (win_size - 1) * (2 ** (levels - 1)), (
        f"image too small for {levels}-level ms-ssim: {x.shape}"
    )
    window = jnp.asarray(_gaussian_window(win_size, win_sigma))
    # Per-channel (N, C) granularity throughout, as pytorch_msssim: the relu
    # clamps and the cross-level product happen per channel, and only the
    # final reduction averages channels.
    mcs = []
    ssim_val = None
    for level in range(levels):
        ssim_map, cs_map = _ssim_maps(x, y, window, data_range)
        ssim_val = jnp.mean(ssim_map, axis=(1, 2))
        if level < levels - 1:
            mcs.append(jax.nn.relu(jnp.mean(cs_map, axis=(1, 2))))
            x, y = _avg_pool_2x(x), _avg_pool_2x(y)
    ssim_val = jax.nn.relu(ssim_val)  # forced non-negative, as pytorch_msssim
    w = jnp.asarray(weights, jnp.float32)
    stacked = jnp.stack(mcs + [ssim_val], axis=0)  # (levels, N, C)
    out = jnp.prod(stacked ** w[:, None, None], axis=0)
    return jnp.mean(out) if size_average else jnp.mean(out, axis=1)
