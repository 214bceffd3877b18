"""Per-sample random masking with keyed PRNG.

Same algorithm as the reference (argsort of uniform noise,
``models_mae/MAE_ViT_Shared.py:57-84``) but driven by an explicit
``jax.random`` key instead of the global ``torch.manual_seed`` hack
(``MAE_ViT_Baseline.py:301-302``). ``len_keep`` is static, so every shape is
static under jit — the gather/unshuffle compiles to plain XLA gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_masking(
    x: jnp.ndarray,
    len_keep: int,
    rng: jax.Array | None = None,
    noise: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Keep a random ``len_keep``-subset of tokens per sample.

    x: (N, L, D) token sequence. Pass either ``rng`` or precomputed ``noise``
    (N, L) — the latter lets the caller share one noise draw across the two
    scale views (the reference's ``consistent_mask`` / ``mask_seed`` path,
    MAE_ViT_MsLd.py:42-49).

    Returns ``(x_masked, mask, ids_restore)`` where ``x_masked`` is
    (N, len_keep, D), ``mask`` is (N, L) with 0=keep / 1=masked (reference
    convention), and ``ids_restore`` un-shuffles decoder tokens.
    """
    n, l, d = x.shape
    if noise is None:
        assert rng is not None, "need rng or noise"
        noise = jax.random.uniform(rng, (n, l))
    ids_shuffle = jnp.argsort(noise, axis=1)  # ascending: small = keep
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((n, l), jnp.float32).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def restore_tokens(
    visible: jnp.ndarray, mask_token: jnp.ndarray, ids_restore: jnp.ndarray
) -> jnp.ndarray:
    """Fill masked slots with ``mask_token`` and un-shuffle to image order.

    visible: (N, len_keep, D) decoder-embedded visible tokens (no cls).
    mask_token: (D,) learned token.
    Reproduces the gather-unshuffle at MAE_ViT_Baseline.py:273-280.
    """
    n, len_keep, d = visible.shape
    l = ids_restore.shape[1]
    mask_tokens = jnp.broadcast_to(
        mask_token.astype(visible.dtype), (n, l - len_keep, d)
    )
    full = jnp.concatenate([visible, mask_tokens], axis=1)
    return jnp.take_along_axis(full, ids_restore[:, :, None], axis=1)
