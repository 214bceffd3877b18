"""Ablation probes: where does the v3 attention kernel's time go?

Decoder-bwd shape (512, 65, 1536), 16 heads, G=8 — the most expensive
attention op in the flagship step (8 x 2 ms). Each probe keeps the same
blocks/DMA and strips kernel work from the inside out:

  dma      - load block, write one slice (DMA floor)
  extract  - all per-head lane extracts, trivial combine, no matmuls
  matmul   - extracts + the five bwd matmuls, no softmax
  full     - the real backward kernel

Run: python benchmarks/probe_attn_cost.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, L, D, H = 512, 65, 512, 16
HD = D // H
G = 8


def probe_dma(x_ref, do_ref, o_ref):
    o_ref[:, :, :D] = x_ref[:, :, :D]
    o_ref[:, :, D:2 * D] = do_ref[:]
    o_ref[:, :, 2 * D:] = x_ref[:, :, 2 * D:]


def probe_extract(x_ref, do_ref, o_ref):
    x = x_ref[:]
    do_full = do_ref[:]
    for g in range(H):
        o = g * HD
        q = x[:, :, o:o + HD]
        k = x[:, :, D + o:D + o + HD]
        v = x[:, :, 2 * D + o:2 * D + o + HD]
        do = do_full[:, :, o:o + HD]
        o_ref[:, :, o:o + HD] = q + do
        o_ref[:, :, D + o:D + o + HD] = k
        o_ref[:, :, 2 * D + o:2 * D + o + HD] = v


def probe_matmul(x_ref, do_ref, o_ref):
    x = x_ref[:]
    do_full = do_ref[:]
    scale = HD ** -0.5
    for g in range(H):
        o = g * HD
        q = x[:, :, o:o + HD]
        k = x[:, :, D + o:D + o + HD]
        v = x[:, :, 2 * D + o:2 * D + o + HD]
        do = do_full[:, :, o:o + HD]
        p = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        p_b = p.astype(x.dtype)
        dv = jax.lax.dot_general(
            p_b, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * dp * scale).astype(x.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dt = o_ref.dtype
        o_ref[:, :, o:o + HD] = dq.astype(dt)
        o_ref[:, :, D + o:D + o + HD] = dk.astype(dt)
        o_ref[:, :, 2 * D + o:2 * D + o + HD] = dv.astype(dt)


def run(kernel, name):
    x_spec = pl.BlockSpec((G, L, 3 * D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, L, 3 * D), jnp.bfloat16),
        grid=(N // G,),
        in_specs=[x_spec, do_spec],
        out_specs=x_spec,
    )
    fn = jax.jit(fn)
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((N, L, 3 * D)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((N, L, D)), jnp.bfloat16)
    out = fn(qkv, do)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        out = fn(qkv, do)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<10s} {dt:7.3f} ms")
    return dt


def main():
    run(probe_dma, "dma")
    run(probe_extract, "extract")
    run(probe_matmul, "matmul")
    from cross_scale_mae_tpu.ops.attention import _mha3_bwd_kernel
    run(functools.partial(_mha3_bwd_kernel, num_heads=H, head_dim=HD,
                          scale=HD ** -0.5), "full")


if __name__ == "__main__":
    main()
