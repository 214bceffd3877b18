"""Microbenchmark: Pallas attention fwd+bwd on the flagship shapes.

Encoder: (512, 17, 2304) qkv, 12 heads; decoder: (512, 65, 1536), 16 heads.
Times each kernel via host readback (block_until_ready unreliable on axon).

Run: python benchmarks/bench_attention.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cross_scale_mae_tpu.ops.attention import mha_v3


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[0, 0]), out)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[0, 0]), out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    for name, (n, l, d, h) in {
        "encoder(512,17,768,h12)": (512, 17, 768, 12),
        "decoder(512,65,512,h16)": (512, 65, 512, 16),
    }.items():
        qkv = jnp.asarray(rng.standard_normal((n, l, 3 * d)), jnp.bfloat16)
        do = jnp.asarray(rng.standard_normal((n, l, d)), jnp.bfloat16)

        fwd = jax.jit(lambda q: mha_v3(q, h))
        t_fwd = timeit(fwd, qkv)

        def loss(q):
            return (mha_v3(q, h).astype(jnp.float32) *
                    do.astype(jnp.float32)).sum()

        grad = jax.jit(jax.grad(loss))
        t_both = timeit(grad, qkv)
        print(f"{name}: fwd {t_fwd:.3f} ms, fwd+bwd {t_both:.3f} ms")


if __name__ == "__main__":
    main()
