"""Fused multi-head attention kernels (Pallas/TPU) with an XLA reference.

The reference delegates attention to timm / xFormers CUDA kernels
(``models_mae/MAE_ViT_Baseline.py:94-188``; attention-variant flag at
``main_pretrain.py:101-119``). Here the canonical implementation is the XLA
einsum path in ``models/layers.py`` (XLA already emits fused TPU attention
for these shapes); this module adds a hand-written Pallas kernel selected by
``attention_impl='pallas'``.

Shape regime: Cross-Scale MAE sequences are tiny (17..257 tokens: 64-1024
patches + cls; SURVEY.md §2 "SP: N/A"), so the whole (L, L) score matrix of
one head fits comfortably in VMEM — no K/V streaming needed. The kernel
processes a *group* of heads per grid step so the second-to-last dims keep
the MXU/VPU busy, computes logits and softmax in fp32, and writes bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # Blocks: (G, L, hd) — G = heads-per-program group.
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # (G, L, L)
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # (G, L, hd)
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """q, k, v: (N, L, H, hd) -> (N, L, H, hd). Softmax(QKᵀ/√hd)V per head."""
    n, l, h, hd = q.shape
    scale = hd ** -0.5
    # Fold batch and heads; group heads so each program does a (G*L, ...)
    # amount of work that tiles well.
    bh = n * h
    group = 8
    while bh % group:
        group //= 2
    qf = q.transpose(0, 2, 1, 3).reshape(bh, l, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(bh, l, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(bh, l, hd)
    spec = pl.BlockSpec((group, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l, hd), q.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * l * hd,
            bytes_accessed=4 * bh * l * hd * q.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf)
    return out.reshape(n, h, l, hd).transpose(0, 2, 1, 3)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pallas MHA, auto-falling back to interpreter mode off-TPU (CPU tests)."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pallas_mha(q, k, v, interpret=interpret)


def xla_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference einsum attention (same contract as :func:`pallas_mha`)."""
    hd = q.shape[-1]
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)
