"""Round 3: bare kernels compile (probe 1+2); the full model crashes.
Bisect the integration: kernel fed by a matmul, kernel under grad, the
whole attention block, one transformer block, with/without remat/scan."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cross_scale_mae_tpu.ops.attention import pallas_mha_v3


def probe(name, fn):
    try:
        v = fn()
        print(f"PASS {name}: {v:.3f}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:140]
        print(f"FAIL {name}: {msg}", flush=True)


N, L, H, HD = 256, 17, 12, 64
D = H * HD
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, L, D)), jnp.bfloat16)
w_qkv = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)
w_proj = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)


def attn(x, w_qkv, w_proj):
    qkv = x @ w_qkv
    out = pallas_mha_v3(qkv, H, False)
    return out @ w_proj


def f_fwd_only():
    y = jax.jit(attn)(x, w_qkv, w_proj)
    return float(jnp.sum(y.astype(jnp.float32)))


def f_grad():
    g = jax.jit(
        jax.grad(lambda a, b, c: jnp.sum(attn(a, b, c).astype(jnp.float32)))
    )(x, w_qkv, w_proj)
    return float(jnp.sum(g.astype(jnp.float32)))


def f_grad_kernel_only():
    qkv = jnp.asarray(rng.normal(size=(N, L, 3 * D)), jnp.bfloat16)
    g = jax.jit(
        jax.grad(
            lambda q: jnp.sum(pallas_mha_v3(q, H, False).astype(jnp.float32))
        )
    )(qkv)
    return float(jnp.sum(g.astype(jnp.float32)))


def f_block_grad():
    from cross_scale_mae_tpu.models.layers import block, block_init

    p = block_init(jax.random.key(0), D)
    p = jax.tree.map(lambda a: a.astype(jnp.float32), p)

    def loss(p, x):
        return jnp.sum(
            block(p, x, H, impl="pallas_v3").astype(jnp.float32)
        )

    g = jax.jit(jax.grad(loss))(p, x)
    return float(jnp.sum(g["attn"]["qkv"]["kernel"]))


if __name__ == "__main__":
    probe("fwd_matmul_sandwich", f_fwd_only)
    probe("grad_kernel_only", f_grad_kernel_only)
    probe("grad_matmul_sandwich", f_grad)
    probe("grad_full_block", f_block_grad)
