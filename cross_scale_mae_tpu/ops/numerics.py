"""Accumulation-dtype helpers.

The stability-sensitive spots (LN statistics, attention logits, loss
reductions) upcast bf16 activations to fp32. Those upcasts must never
DOWNCAST a wider input: fp64 runs (used by the long-horizon torch-lockstep
equivalence tests, which need float64 on both sides to hold 100+ optimizer
steps of numerical agreement) flow through the same code. ``at_least_f32``
is the promotion-safe spelling of ``.astype(jnp.float32)``: identity for
fp32/fp64, upcast for bf16/fp16.
"""

from __future__ import annotations

import jax.numpy as jnp


def at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast to fp32 unless the input is already wider (fp64 stays fp64)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def accum_dtype(dtype) -> jnp.dtype:
    """Matmul accumulation dtype: at least fp32, wider if the input is."""
    return jnp.promote_types(dtype, jnp.float32)
