"""Fused LayerNorm (Pallas/TPU) with a hand-written backward.

Motivation (round-3 profile, benchmarks/profile_step.py @ 108.9 ms/step):
LN work rides inside XLA's big fusions — ~8 ms of forward stats inside the
matmul fusions plus ~8 ms of LN backward inside "loop fusion" — because
XLA's LN decomposition re-reads the activation for every reduction pass
(mean, var, and two backward reductions). At flagship shapes the LN
activations are pure HBM traffic, so each avoided pass is wall-clock.

This kernel does the textbook fused schedule:

* forward: ONE read of x per row-tile -> mean/var in fp32 on the VPU ->
  one write of y. No stat tensors ever touch HBM (recomputed in bwd).
* backward: ONE read of (x, dy) -> recompute mean/rstd (VPU, free vs DMA)
  -> dx in one write, with dscale/dbias accumulated in a fp32 VMEM block
  across the sequential TPU grid and written once at the last step.

= 2 HBM passes forward, 3 backward — vs XLA's ~3/~5 measured.

Numerics match models/layers.layer_norm exactly: fp32 statistics
(biased variance), fp32 scale/shift, cast back to the activation dtype.
The reference computes LN via torch ``nn.LayerNorm`` in fp32
(models_mae/MAE_ViT_Baseline.py:80 ``norm_layer=nn.LayerNorm``); parity
tests pin ours to torch at 1e-6 fp32.

SPMD: a ``pallas_call`` is opaque to GSPMD and this kernel's backward has
cross-row *reduced* outputs (dscale/dbias), which need a psum under a
sharded batch — so the fused path engages only on single-device programs
(the per-chip hot path). Multi-device GSPMD programs keep the XLA
decomposition; ``--ddp_mode shard_map`` runs per-device bodies but its
device_count is still > 1 at trace time, so it too falls back (correct,
just not peak — same staging the attention kernels went through).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (T, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, scale_ref, dy_ref, dx_ref, dscale_ref, dbias_ref,
                   *, eps: float):
    x = x_ref[:].astype(jnp.float32)    # (T, D)
    dy = dy_ref[:].astype(jnp.float32)  # (T, D)
    d = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = c * rstd
    g = dy * scale_ref[:].astype(jnp.float32)
    c1 = jnp.sum(g * xhat, axis=-1, keepdims=True) * (1.0 / d)
    c2 = jnp.sum(g, axis=-1, keepdims=True) * (1.0 / d)
    dx = (g - c2 - xhat * c1) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # Param grads: fp32 accumulation across the (sequential) TPU grid.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _row_tile(m: int) -> int:
    """Largest power-of-2 tile (<= 1024) dividing the row count exactly.

    Must be a true divisor — a non-dividing tile leaves the tail rows
    unwritten (garbage dx). ln_applicable gates production shapes to
    m % 8 == 0, so the tile is >= 8 there; odd row counts still get a
    correct (if sublane-padded) 1/2/4-row tile for tests."""
    t = 1024
    while t > 1 and m % t:
        t //= 2
    return t


def _ln_fwd_call(x2, scale, bias, eps, interpret):
    m, d = x2.shape
    t = _row_tile(m)
    row_spec = pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, d), x2.dtype),
        grid=(m // t,),
        in_specs=[row_spec, par_spec, par_spec],
        out_specs=row_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * m * d,
            bytes_accessed=2 * m * d * x2.dtype.itemsize,
            transcendentals=m,
        ),
    )(x2, scale.reshape(1, d), bias.reshape(1, d))


def _ln_bwd_call(x2, scale, dy2, eps, interpret):
    m, d = x2.shape
    t = _row_tile(m)
    row_spec = pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        grid=(m // t,),
        in_specs=[row_spec, par_spec, row_spec],
        out_specs=(row_spec, par_spec, par_spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * m * d,
            bytes_accessed=3 * m * d * x2.dtype.itemsize,
            transcendentals=m,
        ),
    )(x2, scale.reshape(1, d), dy2)
    return dx, dscale.reshape(d), dbias.reshape(d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ln_pallas(x, scale, bias, eps, interpret):
    """Fused LayerNorm over the last axis. x: (..., D) -> (..., D)."""
    shape = x.shape
    y = _ln_fwd_call(x.reshape(-1, shape[-1]), scale, bias, eps, interpret)
    return y.reshape(shape)


def _ln_cvjp_fwd(x, scale, bias, eps, interpret):
    return ln_pallas(x, scale, bias, eps, interpret), (x, scale)


def _ln_cvjp_bwd(eps, interpret, res, dy):
    x, scale = res
    shape = x.shape
    d = shape[-1]
    dx, dscale, dbias = _ln_bwd_call(
        x.reshape(-1, d), scale, dy.reshape(-1, d), eps, interpret
    )
    return (
        dx.reshape(shape),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
    )


ln_pallas.defvjp(_ln_cvjp_fwd, _ln_cvjp_bwd)


def ln_applicable(x: jnp.ndarray) -> bool:
    """Engage the fused kernel: single-device TPU program, lane-aligned
    feature dim, row count tileable. Everything else -> XLA decomposition
    (identical numerics)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if jax.device_count() > 1:  # GSPMD / shard_map programs (see module doc)
        return False
    d = x.shape[-1]
    m = x.size // d
    return d % 128 == 0 and m % 8 == 0
