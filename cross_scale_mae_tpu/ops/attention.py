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


def _softmax_fp32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                    *, scale: float):
    """Full-recompute attention backward for one head-group block.

    With L <= 257 the whole (L, L) probability matrix sits in VMEM, so the
    flash-style streaming backward is unnecessary — one recompute pass:
      dV = Pᵀ dO;  dS = P ∘ (dP − rowsum(dP ∘ P));  dQ = dS·K;  dK = dSᵀ·Q.
    """
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    p = _softmax_fp32(logits)  # (G, L, L)
    dv = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, L, hd): sum_q p[q,l] do[q,d]
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, L, L)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


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


def _group_for(bh: int) -> int:
    group = 8
    while bh % group:
        group //= 2
    return group


def _fold(x):
    n, l, h, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n * h, l, hd)


def _unfold(x, n, h):
    bh, l, hd = x.shape
    return x.reshape(n, h, l, hd).transpose(0, 2, 1, 3)


def _mha_fwd_call(qf, kf, vf, interpret):
    bh, l, hd = qf.shape
    group = _group_for(bh)
    scale = hd ** -0.5
    spec = pl.BlockSpec((group, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l, hd), qf.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * l * hd,
            bytes_accessed=4 * bh * l * hd * qf.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha_folded(qf, kf, vf, interpret):
    return _mha_fwd_call(qf, kf, vf, interpret)


def _mha_folded_fwd(qf, kf, vf, interpret):
    return _mha_fwd_call(qf, kf, vf, interpret), (qf, kf, vf)


def _mha_folded_bwd(interpret, res, do):
    qf, kf, vf = res
    bh, l, hd = qf.shape
    group = _group_for(bh)
    scale = hd ** -0.5
    spec = pl.BlockSpec((group, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, l, hd), qf.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(bh // group,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * l * l * hd,
            bytes_accessed=7 * bh * l * hd * qf.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf, do)
    return dq, dk, dv


_mha_folded.defvjp(_mha_folded_fwd, _mha_folded_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """q, k, v: (N, L, H, hd) -> (N, L, H, hd). Softmax(QKᵀ/√hd)V per head.

    Differentiable: custom VJP with a one-pass full-recompute backward
    kernel (_mha_bwd_kernel)."""
    n, l, h, hd = q.shape
    out = _mha_folded(_fold(q), _fold(k), _fold(v), interpret)
    return _unfold(out, n, h)


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
