"""Time-gap-stratified temporal-consistency evaluation.

The reference's temporal dataset parses capture timestamps
(``util/datasets.py:287-292``) but is dead code with no consumer. Here the
timestamps earn their keep: for each same-site pair this computes the
cosine similarity between the (mean-pooled) encoder embeddings of the two
captures — exactly the representation the NT-Xent term pulls together
(MAE_ViT_MsLdCeCd.py:62-69) — and stratifies it by the capture gap in
months. A good cross-scale/cross-temporal encoder should hold its
consistency as the gap grows; a sharp falloff localizes WHERE the
representation stops being time-invariant.

CLI face: ``cli/evalviz.py --temporal_csv pairs.csv``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _bucket_label(edges: Sequence[int], b: int) -> str:
    if b == 0:
        return f"0-{edges[0] - 1}mo"
    if b == len(edges):
        return f"{edges[-1]}+mo"
    return f"{edges[b - 1]}-{edges[b] - 1}mo"


def temporal_consistency_by_gap(
    params,
    cfg,
    dataset,
    batch_size: int = 32,
    bucket_edges: Sequence[int] = (6, 12, 24),
) -> dict:
    """Returns ``{"overall": {...}, "buckets": {label: {mean_cos, n}}}``.

    ``dataset`` must be a :class:`FmowTemporalDataset` (chronologically
    ordered pairs + ``time_gaps_months``). Embeddings are the unmasked
    encoder pass (``mae_encode``), mean-pooled over patch tokens and
    L2-normalized — the NT-Xent feature.
    """
    from cross_scale_mae_tpu.models.mae import mae_encode
    from cross_scale_mae_tpu.ops.image import center_crop_resize, normalize_images

    mean, std = dataset.mean, dataset.std

    @jax.jit
    def pooled(frames):  # (B, 2, S, S, C) normalized float
        b = frames.shape[0]
        flat = frames.reshape((b * 2,) + frames.shape[2:])
        emb = mae_encode(params, cfg, flat)
        f = jnp.mean(emb[:, 1:, :].astype(jnp.float32), axis=1)
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        f = f.reshape(b, 2, -1)
        return jnp.sum(f[:, 0] * f[:, 1], axis=-1)  # (B,) cosine sims

    gaps = dataset.time_gaps_months()
    n = len(dataset)
    if n == 0:
        raise ValueError(
            "temporal_consistency_by_gap: the pairs CSV has no rows — "
            "nothing to evaluate"
        )
    cos = np.empty((n,), np.float32)
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        stack = np.stack([dataset.load(i)[0] for i in idx])  # (b,2,S,S,C) u8
        x = jnp.asarray(stack, jnp.float32) / 255.0
        x = normalize_images(x, mean, std)
        if x.shape[2] != cfg.input_size:
            b = x.shape[0]
            x = center_crop_resize(
                x.reshape((b * 2,) + x.shape[2:]), cfg.input_size
            ).reshape((b, 2, cfg.input_size, cfg.input_size, x.shape[-1]))
        cos[start:start + x.shape[0]] = np.asarray(pooled(x))

    edges = list(bucket_edges)
    which = np.digitize(gaps, edges)  # 0..len(edges)
    buckets = {}
    for b in range(len(edges) + 1):
        sel = which == b
        if not sel.any():
            continue
        buckets[_bucket_label(edges, b)] = {
            "mean_cos": float(cos[sel].mean()),
            "n": int(sel.sum()),
        }
    return {
        "overall": {"mean_cos": float(cos.mean()), "n": int(n)},
        "gap_months": {"min": int(gaps.min()), "median": float(np.median(gaps)),
                       "max": int(gaps.max())},
        "buckets": buckets,
    }
