"""Micro-probes to isolate which kernel construct crashes the Mosaic remote
compiler (tpu_compile_helper exit 1) — v2 (ref minor-dim slicing) and v3
(value lane slicing + concat) both die; find the exact culprit so a
compilable natural-layout attention kernel can be designed around it.

Run: python benchmarks/probe_mosaic.py
"""

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, L, H, HD = 8, 65, 12, 64
D = H * HD
N = 32


def call(kernel, out_d, **kw):
    in_spec = pl.BlockSpec((G, L, 3 * D), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, L, out_d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, L, 3 * D)), jnp.bfloat16
    )
    f = pl.pallas_call(
        functools.partial(kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((N, L, out_d), jnp.bfloat16),
        grid=(N // G,),
        in_specs=[in_spec],
        out_specs=out_spec,
    )
    y = jax.jit(f)(x)
    return float(jnp.sum(y.astype(jnp.float32)))


def probe(name, fn):
    try:
        v = fn()
        print(f"PASS {name}: sum={v:.3f}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}: {msg}", flush=True)


# A: pure value lane-slice copy of one head, no matmul, no concat.
def k_slice_copy(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x[:, :, 0:HD].astype(o_ref.dtype)


# B: value lane-slice at a NON-zero offset.
def k_slice_copy_off(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x[:, :, 5 * HD:6 * HD].astype(o_ref.dtype)


# C: concat of 12 slices, no matmul.
def k_concat(x_ref, o_ref):
    x = x_ref[:]
    outs = [x[:, :, g * HD:(g + 1) * HD] for g in range(H)]
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


# D: one-head attention from slices (matmul on sliced values), no concat.
def k_one_head(x_ref, o_ref):
    x = x_ref[:]
    q = x[:, :, 0:HD].astype(jnp.float32)
    k = x[:, :, D:D + HD].astype(jnp.float32)
    v = x[:, :, 2 * D:2 * D + HD].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[:] = out.astype(o_ref.dtype)


# E: full v3 but writing heads via ref minor-dim stores instead of concat.
def k_ref_store(x_ref, o_ref):
    x = x_ref[:]
    for g in range(H):
        o = g * HD
        q = x[:, :, o:o + HD].astype(jnp.float32)
        k = x[:, :, D + o:D + o + HD].astype(jnp.float32)
        v = x[:, :, 2 * D + o:2 * D + o + HD].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, o:o + HD] = out.astype(o_ref.dtype)


# F: full v3 (concat) — the known-failing case, for confirmation.
def k_v3(x_ref, o_ref):
    x = x_ref[:]
    outs = []
    for g in range(H):
        o = g * HD
        q = x[:, :, o:o + HD].astype(jnp.float32)
        k = x[:, :, D + o:D + o + HD].astype(jnp.float32)
        v = x[:, :, 2 * D + o:2 * D + o + HD].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(out.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


# G: 2-head concat only (smaller concat fan-in).
def k_two_head(x_ref, o_ref):
    x = x_ref[:]
    outs = []
    for g in range(2):
        o = g * HD
        q = x[:, :, o:o + HD].astype(jnp.float32)
        k = x[:, :, D + o:D + o + HD].astype(jnp.float32)
        v = x[:, :, 2 * D + o:2 * D + o + HD].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(out.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


if __name__ == "__main__":
    probe("A_slice_copy", lambda: call(k_slice_copy, HD))
    probe("B_slice_copy_off", lambda: call(k_slice_copy_off, HD))
    probe("C_concat12", lambda: call(k_concat, D))
    probe("D_one_head_attn", lambda: call(k_one_head, HD))
    probe("G_two_head_concat", lambda: call(k_two_head, 2 * HD))
    probe("E_ref_store", lambda: call(k_ref_store, D))
    probe("F_v3_full", lambda: call(k_v3, D))
