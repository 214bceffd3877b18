"""Image <-> patch-sequence reshapes.

Matches the math of the reference's einsum reshapes
(``models_mae/MAE_ViT_Shared.py:24-55``) but in NHWC layout, the natural
layout for TPU image ops (channel-minor feeds the MXU/VPU lanes directly).
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, L, p*p*C) with L = (H/p)*(W/p).

    Per-patch feature ordering is (ph, pw, c) row-major, matching the
    reference's ``nchpwq->nhwpqc`` einsum (MAE_ViT_Shared.py:37-39) so that
    patch vectors are bit-compatible with PyTorch-trained checkpoints.
    """
    n, h, w, c = imgs.shape
    p = patch_size
    assert h == w and h % p == 0, f"bad shape {imgs.shape} for patch {p}"
    gh, gw = h // p, w // p
    x = imgs.reshape(n, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, gh, gw, p, p, c)
    return x.reshape(n, gh * gw, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int) -> jnp.ndarray:
    """(N, L, p*p*C) -> (N, H, W, C); inverse of :func:`patchify`."""
    n, l, d = x.shape
    p = patch_size
    g = int(round(l ** 0.5))
    assert g * g == l, f"L={l} is not a square grid"
    assert d == p * p * channels, f"patch dim {d} != {p}*{p}*{channels}"
    x = x.reshape(n, g, g, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, g, p, g, p, c)
    return x.reshape(n, g * p, g * p, channels)
