"""Downstream ViT classifier (finetune / linear probe).

Re-designs ``models_vit.py`` (timm VisionTransformer subclass) functionally:

* Fixed-init sin-cos position table that stays **trainable** (models_vit.py
  copies sin-cos values into timm's trainable ``pos_embed``, :24-29).
* Optional global-average-pool head: mean over patch tokens -> ``fc_norm``
  (replacing the final norm) -> head (models_vit.py:31-58).
* Optional frozen-affine BatchNorm in front of the head for the linear probe
  (``torch.nn.BatchNorm1d(embed_dim, affine=False, eps=1e-6)``,
  main_linprobe.py:517-520) — implemented as mutable state.
* Stochastic depth (drop-path) with the timm linear ramp across layers,
  threaded through the scanned block stack.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import ViTClassifierConfig
from cross_scale_mae_tpu.models import layers
from cross_scale_mae_tpu.ops.numerics import at_least_f32
from cross_scale_mae_tpu.ops.patchify import patchify
from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

Params = dict[str, Any]


def vit_init(rng: jax.Array, cfg: ViTClassifierConfig) -> tuple[Params, Params]:
    """Returns (params, state)."""
    keys = jax.random.split(rng, 6)
    d = cfg.embed_dim
    patch_dim = cfg.patch_size ** 2 * cfg.input_channels
    params: Params = {
        "patch_embed": layers.linear_init(keys[0], patch_dim, d),
        "cls_token": 0.02 * jax.random.normal(keys[1], (1, 1, d), jnp.float32),
        # Trainable, initialized to the fixed sin-cos table (models_vit.py:24-29).
        "pos_embed": get_2d_sincos_pos_embed(d, cfg.grid_size, cls_token=True)[None],
        "blocks": layers.stacked_blocks_init(
            keys[2], cfg.depth, d, cfg.mlp_ratio, cfg.attention_impl,
            cfg.num_patches + 1,
        ),
        "head": {
            # timm head init: trunc_normal(0.02); entry points re-init with
            # their own std (main_finetune.py:618 / main_linprobe.py).
            "kernel": 0.02 * jax.random.truncated_normal(
                keys[3], -2.0, 2.0, (d, cfg.num_classes), jnp.float32
            ),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }
    if cfg.global_pool:
        params["fc_norm"] = layers.layer_norm_init(d)
    else:
        params["norm"] = layers.layer_norm_init(d)
    state: Params = {}
    if cfg.use_bn_head:
        state["head_bn"] = {
            "mean": jnp.zeros((d,), jnp.float32),
            "var": jnp.ones((d,), jnp.float32),
        }
    return params, state


def _drop_path_scan(
    stacked: Params,
    x: jnp.ndarray,
    num_heads: int,
    impl: str,
    rates: jnp.ndarray,
    rng: jax.Array,
    remat: bool,
    gelu: str = "tanh",
    sp: bool = False,
) -> jnp.ndarray:
    """Scanned blocks with per-layer stochastic depth (timm linspace ramp)."""
    depth = rates.shape[0]
    keys = jax.random.split(rng, depth)
    if sp:
        x = layers.sp_constrain(x)

    def body(carry, xs):
        p, rate, key = xs
        out = layers.block(p, carry, num_heads, impl, gelu=gelu, sp=sp)
        # Per-sample residual drop of the whole block output (timm DropPath
        # semantics; applied to the block delta, scaled by keep prob).
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, (carry.shape[0], 1, 1))
        scale = (mask.astype(jnp.float32) / keep).astype(carry.dtype)
        out = carry + (out - carry) * scale
        return out, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, (stacked, rates, keys))
    return x


def vit_forward_features(
    params: Params,
    cfg: ViTClassifierConfig,
    imgs: jnp.ndarray,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """imgs NHWC -> (N, D) pooled features (models_vit.py:39-60)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    x = patchify(imgs, cfg.patch_size).astype(dtype)
    x = layers.linear(params["patch_embed"], x)
    n = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (n, 1, x.shape[2]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)
    if train and cfg.drop_path_rate > 0:
        assert rng is not None, "drop_path needs rng in train mode"
        rates = jnp.asarray(
            np.linspace(0.0, cfg.drop_path_rate, cfg.depth), jnp.float32
        )
        x = _drop_path_scan(
            params["blocks"], x, cfg.num_heads, cfg.attention_impl, rates, rng,
            cfg.remat, gelu=cfg.gelu, sp=cfg.sequence_parallel,
        )
    else:
        x = layers.run_blocks(
            params["blocks"], x, cfg.num_heads, cfg.attention_impl,
            remat=cfg.remat, scan=cfg.scan_blocks, gelu=cfg.gelu,
            sp=cfg.sequence_parallel,
        )
    if cfg.global_pool:
        feat = jnp.mean(x[:, 1:, :], axis=1)
        feat = layers.layer_norm(params["fc_norm"], feat)
    else:
        x = layers.layer_norm(params["norm"], x)
        feat = x[:, 0]
    return feat


def vit_apply(
    params: Params,
    state: Params,
    cfg: ViTClassifierConfig,
    imgs: jnp.ndarray,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    bn_momentum: float = 0.1,
    freeze_backbone: bool = False,
) -> tuple[jnp.ndarray, Params]:
    """Returns (logits (N, num_classes), new_state).

    ``freeze_backbone`` cuts the gradient at the feature boundary (the
    linear probe's torch ``requires_grad=False``, main_linprobe.py:521-525).
    optax.masked alone only masks the UPDATE — the backbone backward would
    still be computed and thrown away (measured: the whole linprobe step ran
    ~3x slower than necessary before this cut let XLA prune it)."""
    feat = vit_forward_features(params, cfg, imgs, train=train, rng=rng)
    if freeze_backbone:
        feat = jax.lax.stop_gradient(feat)
    new_state = dict(state)
    if cfg.use_bn_head:
        f32 = at_least_f32(feat)
        if train:
            mean = jnp.mean(f32, axis=0)
            var = jnp.var(f32, axis=0)
            nb = f32.shape[0]
            new_state["head_bn"] = {
                "mean": (1 - bn_momentum) * state["head_bn"]["mean"] + bn_momentum * mean,
                "var": (1 - bn_momentum) * state["head_bn"]["var"]
                + bn_momentum * var * nb / max(nb - 1, 1),
            }
        else:
            mean, var = state["head_bn"]["mean"], state["head_bn"]["var"]
        # affine=False (main_linprobe.py:517-520): no scale/bias.
        f32 = (f32 - mean) * jax.lax.rsqrt(var + 1e-6)
        feat = f32.astype(feat.dtype)
    logits = layers.linear(params["head"], feat)
    return at_least_f32(logits), new_state
