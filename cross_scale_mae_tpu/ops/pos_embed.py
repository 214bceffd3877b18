"""Fixed 2-D sine-cosine positional embeddings + resolution transfer.

Same tables as the reference (``util/pos_embed.py:16-63``) — frequencies
``1/10000**(2i/d)``, sin block then cos block, height-half then width-half.
Tables are init-time constants, so they are built in float64 numpy (exactly
like the reference) and handed to the device as float32.
``interpolate_pos_embed`` reproduces the bicubic resolution-transfer trick
(``util/pos_embed.py:92-125``) for loading checkpoints at a new input size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """pos: (M,) positions -> (M, embed_dim) sin-cos table (util/pos_embed.py:44-63)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", np.asarray(pos, np.float64).reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> jnp.ndarray:
    """(grid_size², D) fp32 table, optional zero cls row (util/pos_embed.py:16-41)."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    # Reference meshgrid(w, h): w varies fastest along rows (util/pos_embed.py:24),
    # then grid[0] (the w ramp) feeds the "h" half of the embedding.
    ww, hh = np.meshgrid(grid_w, grid_h)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, ww)
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, hh)
    emb = np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim), np.float32), emb], axis=0)
    return jnp.asarray(emb)


def _torch_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 1-D resample matrix reproducing torch's
    ``interpolate(mode='bicubic', align_corners=False)``: cubic-convolution
    kernel with A=-0.75, half-pixel source centers, border-clamped taps.

    jax.image.resize's bicubic uses the Keys kernel (A=-0.5), which differs
    from torch by up to ~8% per element — enough to drift released-checkpoint
    resolution transfer (util/pos_embed.py:117-122). Precomputing the exact
    torch weights as a static matrix makes the resample two matmuls.
    """
    A = -0.75

    def w(x):
        x = abs(x)
        if x <= 1.0:
            return (A + 2.0) * x**3 - (A + 3.0) * x**2 + 1.0
        if x < 2.0:
            return A * x**3 - 5.0 * A * x**2 + 8.0 * A * x - 4.0 * A
        return 0.0

    scale = in_size / out_size
    m = np.zeros((out_size, in_size), np.float64)
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        for k, dist in enumerate((1.0 + t, t, 1.0 - t, 2.0 - t)):
            col = min(max(i0 - 1 + k, 0), in_size - 1)
            m[o, col] += w(dist)
    return m


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_grid_size: int, num_extra_tokens: int = 1
) -> jnp.ndarray:
    """Bicubic-resample grid position tokens to a new grid size.

    pos_embed: (1, T, D) or (T, D) with T = num_extra_tokens + old_grid².
    Mirrors util/pos_embed.py:92-125 (extra tokens pass through unchanged),
    bit-faithful to the torch bicubic resample (see _torch_bicubic_matrix).
    """
    squeeze = pos_embed.ndim == 2
    if squeeze:
        pos_embed = pos_embed[None]
    _, t, d = pos_embed.shape
    old_grid = int(round((t - num_extra_tokens) ** 0.5))
    assert old_grid * old_grid == t - num_extra_tokens
    if old_grid == new_grid_size:
        return pos_embed[0] if squeeze else pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid_tokens = pos_embed[:, num_extra_tokens:].reshape(old_grid, old_grid, d)
    w = jnp.asarray(
        _torch_bicubic_matrix(old_grid, new_grid_size), grid_tokens.dtype
    )
    resized = jnp.einsum("oh,hwd,pw->opd", w, grid_tokens, w)
    out = jnp.concatenate(
        [extra, resized.reshape(1, new_grid_size * new_grid_size, d)], axis=1
    )
    return out[0] if squeeze else out
