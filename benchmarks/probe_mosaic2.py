"""Round 2 of Mosaic probes: forward passed at (L=65, H=12, hd=64) — now
test the real model's other shapes and the backward kernel to find the
tpu_compile_helper crash."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cross_scale_mae_tpu.ops.attention import (
    _mha3_bwd_pallas,
    _mha3_fwd_pallas,
)


def probe(name, fn):
    try:
        v = fn()
        print(f"PASS {name}: {v:.3f}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}: {msg}", flush=True)


def fwd(n, l, h, hd):
    d = h * hd
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, l, 3 * d)), jnp.bfloat16
    )
    y = jax.jit(lambda q: _mha3_fwd_pallas(q, h, False))(x)
    return float(jnp.sum(y.astype(jnp.float32)))


def bwd(n, l, h, hd):
    d = h * hd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, l, 3 * d)), jnp.bfloat16)
    do = jnp.asarray(rng.normal(size=(n, l, d)), jnp.bfloat16)
    y = jax.jit(lambda q, g: _mha3_bwd_pallas(q, g, h, False))(x, do)
    return float(jnp.sum(y.astype(jnp.float32)))


if __name__ == "__main__":
    probe("fwd_enc_L17", lambda: fwd(32, 17, 12, 64))
    probe("fwd_dec_h16_hd32", lambda: fwd(32, 65, 16, 32))
    probe("bwd_enc_L65", lambda: bwd(32, 65, 12, 64))
    probe("bwd_enc_L17", lambda: bwd(32, 17, 12, 64))
    probe("bwd_dec_h16_hd32", lambda: bwd(32, 65, 16, 32))
