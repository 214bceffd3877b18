"""Round 4: block-level grad passes at encoder shape. Probe decoder shape
and the real MAE model variants to find where tpu_compile_helper dies."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn):
    try:
        v = fn()
        print(f"PASS {name}: {v:.3f}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:140]
        print(f"FAIL {name}: {msg}", flush=True)


def block_grad(n, l, h, hd):
    from cross_scale_mae_tpu.models.layers import block, block_init

    d = h * hd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, l, d)), jnp.bfloat16)
    p = block_init(jax.random.key(0), d)

    def loss(p, x):
        return jnp.sum(block(p, x, h, impl="pallas_v3").astype(jnp.float32))

    g = jax.jit(jax.grad(loss))(p, x)
    return float(jnp.sum(g["attn"]["qkv"]["kernel"]))


def mae_grad(name, **kw):
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_loss_fn

    cfg = get_mae_config(
        name, input_size=128, patch_size=16, mask_ratio=0.75,
        compute_dtype="bfloat16", attention_impl="pallas_v3",
        scan_blocks=False, **kw,
    )
    params, state = mae_init(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 128, 128, 3)), jnp.float32
    )

    def loss(p):
        return mae_loss_fn(p, state, cfg, imgs, jax.random.key(1),
                           train=True).loss

    g = jax.jit(jax.grad(loss))(params)
    return float(jnp.sum(g["cls_token"].astype(jnp.float32)))


if __name__ == "__main__":
    probe("block_grad_dec_h16_hd32", lambda: block_grad(256, 65, 16, 32))
    probe("mae_base_plain", lambda: mae_grad("mae_vit_base"))
    probe("mae_base_msldcecd", lambda: mae_grad("mae_vit_base_MsLdCeCd"))
