"""Optimizers: AdamW wiring, LARS, layer-wise lr decay, weight-decay masks.

Reference equivalents:

* AdamW(betas=(0.9, 0.95)) + timm ``add_weight_decay`` grouping
  (``main_pretrain.py:426-427``): here an optax ``adamw`` with a path-based
  decay mask (:func:`wd_mask`).
* ``util/lars.py:11-57`` (MoCo-v3 LARS, used by the linear probe,
  ``main_linprobe.py:557-558``): re-implemented as an optax
  GradientTransformation (:func:`lars`) with the same semantics — trust
  scaling and weight decay only for >1-D params.
* ``util/lr_decay.py:11-75`` (BEiT layer-wise lr decay): because block
  params are *stacked* for ``lax.scan``, the per-layer scale becomes a
  vector broadcast along the stack axis (:func:`layer_decay_scales`) —
  one multiply instead of 2·depth param groups.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Params = dict[str, Any]


# ----------------------------------------------------------- wd masks


def _path_names(path) -> list[str]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return names


def wd_mask(params: Params, extra_no_decay: tuple[str, ...] = ()) -> Params:
    """True = apply weight decay.

    Decay linear kernels and (for pretraining parity with timm
    ``add_weight_decay``) the cls/mask tokens; never decay biases, norm
    scales, or BatchNorm params. ``extra_no_decay`` names (e.g.
    ``("pos_embed", "cls_token")`` for finetune, per timm
    ``VisionTransformer.no_weight_decay``) are excluded by top-level key.
    """

    def decide(path, leaf):
        names = _path_names(path)
        if any(n in extra_no_decay for n in names):
            return False
        last = names[-1]
        if last == "kernel":
            return True
        if last in ("cls_token", "mask_token", "pos_embed"):
            return True
        return False

    return jax.tree_util.tree_map_with_path(decide, params)


# ----------------------------------------------------------- LARS


class LarsState(NamedTuple):
    mu: Params


def lars(
    learning_rate: Callable[[jnp.ndarray], jnp.ndarray] | float,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
) -> optax.GradientTransformation:
    """LARS with MoCo-v3 semantics (util/lars.py:27-57).

    >1-D params: add weight decay, scale by trust ratio
    ``tc * ||p|| / ||dp||`` (1 where either norm is 0), then momentum.
    <=1-D params: plain SGD momentum.
    Step counting lives in an inner count for the schedule.
    """

    def init_fn(params):
        return (
            LarsState(mu=jax.tree.map(jnp.zeros_like, params)),
            jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params=None):
        assert params is not None, "lars requires params"
        lars_state, count = state
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def compute_mu(g, p, mu):
            if p.ndim > 1:
                dp = g + weight_decay * p
                p_norm = jnp.linalg.norm(p)
                u_norm = jnp.linalg.norm(dp)
                q = jnp.where(
                    p_norm > 0.0,
                    jnp.where(u_norm > 0.0, trust_coefficient * p_norm / u_norm, 1.0),
                    1.0,
                )
                dp = dp * q
            else:
                dp = g
            return momentum * mu + dp

        new_mu = jax.tree.map(compute_mu, updates, params, lars_state.mu)
        new_updates = jax.tree.map(lambda m: -lr * m, new_mu)
        return new_updates, (LarsState(mu=new_mu), count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


# ------------------------------------------------- Adam with moment dtypes


class ScaleByAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Params
    nu: Params


def scale_by_adam_moment_dtypes(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """optax ``scale_by_adam`` semantics with independently castable moments.

    optax only exposes ``mu_dtype``; the second moment is the larger HBM
    stream in the fused optimizer pass (read+write of ν every step), so the
    bf16-ν experiment (VALIDATION §5, VERDICT r4 §next-3) needs this.
    Moments are upcast to the gradient dtype for the update math (all
    arithmetic in fp32 for fp32 params) and cast back for storage — the only
    numerics change vs optax is the storage rounding of each moment.
    Equivalence at fp32/fp32 is pinned by tests/test_optimizer_moments.py.
    """
    mu_dt = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dt = jnp.dtype(nu_dtype) if nu_dtype else None

    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=mu_dt or p.dtype), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=nu_dt or p.dtype), params)
        return ScaleByAdamState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu32 = jax.tree.map(
            lambda g, m: b1 * m.astype(g.dtype) + (1 - b1) * g, updates, state.mu
        )
        nu32 = jax.tree.map(
            lambda g, v: b2 * v.astype(g.dtype) + (1 - b2) * jnp.square(g),
            updates, state.nu,
        )
        b1c = 1 - jnp.asarray(b1, jnp.float32) ** count
        b2c = 1 - jnp.asarray(b2, jnp.float32) ** count
        new_updates = jax.tree.map(
            lambda m, v: (m / b1c) / (jnp.sqrt(v / b2c) + eps), mu32, nu32
        )
        mu = jax.tree.map(lambda m: m.astype(mu_dt) if mu_dt else m, mu32)
        nu = jax.tree.map(lambda v: v.astype(nu_dt) if nu_dt else v, nu32)
        return new_updates, ScaleByAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


# ----------------------------------------------------------- layer decay


def layer_decay_scales(params: Params, layer_decay: float, depth: int) -> Params:
    """Per-leaf lr multipliers for BEiT layer-wise decay (util/lr_decay.py).

    Layer ids (get_layer_id_for_vit, util/lr_decay.py:63-75):
    patch_embed / cls_token / pos_embed -> 0; blocks[i] -> i+1;
    everything else (norm, fc_norm, head, bn) -> num_layers = depth+1.
    Stacked block leaves get a per-layer *vector* broadcast on axis 0.
    """
    num_layers = depth + 1
    # layer_scales[i] = layer_decay ** (num_layers - i)
    scales = [layer_decay ** (num_layers - i) for i in range(num_layers + 1)]

    def assign(path, leaf):
        names = _path_names(path)
        top = names[0]
        if top in ("patch_embed", "cls_token", "pos_embed"):
            return jnp.asarray(scales[0], jnp.float32)
        if top == "blocks":
            vec = jnp.asarray(scales[1 : depth + 1], jnp.float32)  # (depth,)
            return vec.reshape((depth,) + (1,) * (leaf.ndim - 1))
        return jnp.asarray(scales[num_layers], jnp.float32)

    return jax.tree_util.tree_map_with_path(assign, params)


def scale_by_tree(scale_tree: Params) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by a (broadcastable) scale pytree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (
            jax.tree.map(lambda u, s: u * s.astype(u.dtype), updates, scale_tree),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


# ----------------------------------------------------------- build


def build_optimizer(
    params: Params,
    schedule: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    optimizer: str = "adamw",
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.95,
    clip_grad: Optional[float] = None,
    layer_decay: Optional[float] = None,
    depth: Optional[int] = None,
    no_decay_names: tuple[str, ...] = (),
    lars_momentum: float = 0.9,
    lars_trust_coefficient: float = 0.001,
    frozen_mask: Optional[Params] = None,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Assemble the full update rule used by the three entry points.

    ``frozen_mask`` (True = trainable) implements the linear probe's
    freeze-all-but-head (main_linprobe.py:521-525) via ``optax.masked``.

    ``mu_dtype='bfloat16'`` stores Adam's first moment in bf16 (halves its
    HBM); ``nu_dtype='bfloat16'`` the second moment (the riskier one — its
    dynamic range carries the adaptive scaling; divergence bounded by
    tests/test_optimizer_moments.py). Both off by default: they are a
    numerics change vs the reference's fp32 torch.optim.AdamW.
    """
    chain = []
    if clip_grad is not None:
        chain.append(optax.clip_by_global_norm(clip_grad))
    if optimizer == "adamw":
        mask = wd_mask(params, extra_no_decay=no_decay_names)
        if nu_dtype is not None:
            # optax.adamw has no nu_dtype; same chain, our scale_by_adam.
            chain.extend([
                scale_by_adam_moment_dtypes(
                    b1=b1, b2=b2, eps=1e-8,
                    mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                ),
                optax.add_decayed_weights(weight_decay, mask),
                optax.scale_by_learning_rate(schedule),
            ])
        else:
            chain.append(
                optax.adamw(
                    learning_rate=schedule, b1=b1, b2=b2, eps=1e-8,
                    weight_decay=weight_decay, mask=mask, mu_dtype=mu_dtype,
                )
            )
    elif optimizer == "lars":
        chain.append(
            lars(
                schedule, weight_decay=weight_decay, momentum=lars_momentum,
                trust_coefficient=lars_trust_coefficient,
            )
        )
    elif optimizer == "sgd":
        chain.append(optax.sgd(schedule, momentum=0.9))
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if layer_decay is not None and layer_decay != 1.0:
        assert depth is not None, "layer_decay needs depth"
        chain.append(scale_by_tree(layer_decay_scales(params, layer_decay, depth)))
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        # masked() leaves non-selected updates untouched (raw grads), so the
        # frozen complement must be explicitly zeroed.
        inverse = jax.tree.map(lambda t: not t, frozen_mask)
        tx = optax.chain(
            optax.masked(tx, frozen_mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
    return tx
