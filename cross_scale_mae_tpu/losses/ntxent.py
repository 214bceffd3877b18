"""NT-Xent (SimCLR) contrastive loss between the two scale views.

Matches ``util/contrast_loss.py:44-101`` exactly, including its
non-standard denominator (negatives only — the positive similarity is *not*
added back into the denominator) and the ``eps`` guard. The reference
rebuilds its boolean pos/neg masks every forward
(``MAE_ViT_MsLdCeCd.py:62``); here the masks are constants folded into the
XLA program at trace time — zero per-step cost.

The 2B x 2B similarity matrix is one fp32 matmul on the MXU (cosine
similarity = matmul of row-normalized features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops.numerics import at_least_f32


def ntxent_loss(
    zi: jnp.ndarray,
    zj: jnp.ndarray,
    tau: float = 0.5,
    cos_sim: bool = True,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """zi, zj: (B, D) projections of the two views. Returns scalar loss."""
    zi = at_least_f32(zi)
    zj = at_least_f32(zj)
    b = zi.shape[0]
    # Reference normalizes inputs first in both modes (contrast_loss.py:81).
    zi = zi / jnp.maximum(jnp.linalg.norm(zi, axis=1, keepdims=True), 1e-12)
    zj = zj / jnp.maximum(jnp.linalg.norm(zj, axis=1, keepdims=True), 1e-12)
    z = jnp.concatenate([zi, zj], axis=0)  # (2B, D)
    if cos_sim:
        # Inputs are already unit rows, but CosineSimilarity re-normalizes
        # with its own eps; after the first normalize this is the identity.
        sim = z @ z.T
    else:
        sim = z @ z.T
    sim = jnp.exp(sim / tau)

    idx = jnp.arange(2 * b)
    # Positive of row r is r±B (contrast_loss.py:21-29).
    pos_idx = jnp.where(idx < b, idx + b, idx - b)
    pos = sim[idx, pos_idx]  # (2B,)
    # Negatives: everything except the diagonal and the positive pair
    # (contrast_loss.py:36-41).
    eye = jnp.eye(2 * b, dtype=bool)
    pos_mask = eye[pos_idx]  # one-hot rows at pos_idx
    neg_mask = ~(eye | pos_mask)
    neg_sum = jnp.sum(jnp.where(neg_mask, sim, 0.0), axis=1)
    loss = -jnp.log(pos / (neg_sum + eps))
    return jnp.mean(loss)
