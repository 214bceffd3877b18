"""Mosaic-compiler bisect probes for the natural-layout attention kernels.

One consolidated probe (rounds 1-4 of the investigation, previously
probe_mosaic{,2,3,4}.py) that isolates which Pallas kernel constructs this
toolchain's Mosaic remote compiler accepts (tpu_compile_helper). Run any
stage standalone; each prints PASS/FAIL per case.

Run: python benchmarks/probe_mosaic.py [--stage kernels|shapes|integration|model|all]

## FINDINGS (this toolchain, v5e via the axon tunnel)

| # | construct | verdict |
|---|---|---|
| 1 | value lane-slice copy (one head, zero / non-zero offset) | PASS |
| 2 | concat of 12 lane slices, no matmul | PASS |
| 3 | one-head attention from lane slices (matmul on sliced values) | PASS |
| 4 | 2-head and 12-head attention + concat (= v3 forward body) | PASS |
| 5 | per-head results written via **ref minor-dim stores** (`o_ref[:, :, o:o+HD] =`) | **FAIL** — tpu_compile_helper exit 1 |
| 6 | v3 fwd/bwd standalone at all model shapes (L=17/65, hd=64/32) | PASS |
| 7 | v3 kernel fed by / feeding matmuls, under grad, in a full block | PASS |
| 8 | full MAE model (plain + MsLdCeCd) with v3 under grad | PASS |

Conclusions the production code is built on:
* Slicing the **loaded value** (lane extracts inside VMEM) is fine; writing
  through a ref's minor dims is what kills the compiler. The v2 qkv-layout
  kernel (ops/attention.py `pallas_mha_qkv`) does exactly that ref-store in
  its backward — hence v2 stays experimental (interpreter-verified by
  tests/test_models.py::test_pallas_v2_qkv_matches_xla_fwd_and_vjp) and v3
  (value slices + one concat store) is the production kernel.
* The original round-3 crash was NOT shape-dependent: every real model
  shape compiles standalone (stage `shapes`) and integrated (stage
  `model`); the failure was construct #5 only.
* Scoped-VMEM limits interact with the decoder's G-batched backward —
  see probe_vmem_sweep.py (separate probe) and ROADMAP.md for the
  kernel-redesign dead ends (v4 packed-head, v5 sample-block-diagonal).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, L, H, HD = 8, 65, 12, 64
D = H * HD
N = 32


def probe(name, fn):
    try:
        v = fn()
        print(f"PASS {name}: {v:.3f}", flush=True)
    except Exception as e:  # noqa: BLE001 — report + continue bisecting
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}: {msg}", flush=True)


# ------------------------------------------------- stage 1: bare constructs

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


def _one_head_attn(x, o):
    q = x[:, :, o:o + HD].astype(jnp.float32)
    k = x[:, :, D + o:D + o + HD].astype(jnp.float32)
    v = x[:, :, 2 * D + o:2 * D + o + HD].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def k_slice_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, :, 0:HD].astype(o_ref.dtype)


def k_slice_copy_off(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, :, 5 * HD:6 * HD].astype(o_ref.dtype)


def k_concat(x_ref, o_ref):
    x = x_ref[:]
    outs = [x[:, :, g * HD:(g + 1) * HD] for g in range(H)]
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def k_one_head(x_ref, o_ref):
    o_ref[:] = _one_head_attn(x_ref[:], 0).astype(o_ref.dtype)


def k_heads_concat(n_heads):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        outs = [
            _one_head_attn(x, g * HD).astype(o_ref.dtype)
            for g in range(n_heads)
        ]
        o_ref[:] = jnp.concatenate(outs, axis=-1)

    return kernel


def k_ref_store(x_ref, o_ref):
    # The culprit construct (#5): minor-dim stores through the output ref.
    x = x_ref[:]
    for g in range(H):
        o = g * HD
        o_ref[:, :, o:o + HD] = _one_head_attn(x, o).astype(o_ref.dtype)


def stage_kernels():
    probe("A_slice_copy", lambda: call(k_slice_copy, HD))
    probe("B_slice_copy_off", lambda: call(k_slice_copy_off, HD))
    probe("C_concat12", lambda: call(k_concat, D))
    probe("D_one_head_attn", lambda: call(k_one_head, HD))
    probe("G_two_head_concat", lambda: call(k_heads_concat(2), 2 * HD))
    probe("F_v3_full_concat", lambda: call(k_heads_concat(H), D))
    probe("E_ref_store", lambda: call(k_ref_store, D))


# --------------------------------------------- stage 2: v3 at model shapes

def _fwd(n, l, h, hd):
    from cross_scale_mae_tpu.ops.attention import _mha3_fwd_pallas

    d = h * hd
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, l, 3 * d)), jnp.bfloat16
    )
    y = jax.jit(lambda q: _mha3_fwd_pallas(q, h, False))(x)
    return float(jnp.sum(y.astype(jnp.float32)))


def _bwd(n, l, h, hd):
    from cross_scale_mae_tpu.ops.attention import _mha3_bwd_pallas

    d = h * hd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, l, 3 * d)), jnp.bfloat16)
    do = jnp.asarray(rng.normal(size=(n, l, d)), jnp.bfloat16)
    y = jax.jit(lambda q, g: _mha3_bwd_pallas(q, g, h, False))(x, do)
    return float(jnp.sum(y.astype(jnp.float32)))


def stage_shapes():
    probe("fwd_enc_L17", lambda: _fwd(32, 17, 12, 64))
    probe("fwd_dec_h16_hd32", lambda: _fwd(32, 65, 16, 32))
    probe("bwd_enc_L65", lambda: _bwd(32, 65, 12, 64))
    probe("bwd_enc_L17", lambda: _bwd(32, 17, 12, 64))
    probe("bwd_dec_h16_hd32", lambda: _bwd(32, 65, 16, 32))


# ------------------------------------- stage 3: v3 integrated with matmuls

def stage_integration():
    from cross_scale_mae_tpu.ops.attention import pallas_mha_v3

    n, l, h, hd = 256, 17, 12, 64
    d = h * hd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, l, d)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.02, jnp.bfloat16)
    w_proj = jnp.asarray(rng.normal(size=(d, d)) * 0.02, jnp.bfloat16)

    def attn(x, a, b):
        return pallas_mha_v3(x @ a, h, False) @ b

    probe("fwd_matmul_sandwich", lambda: float(jnp.sum(
        jax.jit(attn)(x, w_qkv, w_proj).astype(jnp.float32))))
    probe("grad_kernel_only", lambda: float(jnp.sum(jax.jit(jax.grad(
        lambda q: jnp.sum(pallas_mha_v3(q, h, False).astype(jnp.float32))
    ))(jnp.asarray(rng.normal(size=(n, l, 3 * d)), jnp.bfloat16))
        .astype(jnp.float32))))
    probe("grad_matmul_sandwich", lambda: float(jnp.sum(jax.jit(jax.grad(
        lambda a, b, c: jnp.sum(attn(a, b, c).astype(jnp.float32))
    ))(x, w_qkv, w_proj).astype(jnp.float32))))

    def block_grad(n, l, h, hd):
        from cross_scale_mae_tpu.models.layers import block, block_init

        d = h * hd
        xx = jnp.asarray(
            np.random.default_rng(0).normal(size=(n, l, d)), jnp.bfloat16)
        p = block_init(jax.random.key(0), d)

        def loss(p, x):
            return jnp.sum(block(p, x, h, impl="pallas_v3")
                           .astype(jnp.float32))

        g = jax.jit(jax.grad(loss))(p, xx)
        return float(jnp.sum(g["attn"]["qkv"]["kernel"]))

    probe("grad_full_block_enc", lambda: block_grad(256, 17, 12, 64))
    probe("grad_full_block_dec", lambda: block_grad(256, 65, 16, 32))


# -------------------------------------------- stage 4: full model variants

def stage_model():
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_loss_fn

    def mae_grad(name, **kw):
        cfg = get_mae_config(
            name, input_size=128, patch_size=16, mask_ratio=0.75,
            compute_dtype="bfloat16", attention_impl="pallas_v3",
            scan_blocks=False, **kw,
        )
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(16, 128, 128, 3)),
            jnp.float32,
        )

        def loss(p):
            return mae_loss_fn(p, state, cfg, imgs, jax.random.key(1),
                               train=True).loss

        g = jax.jit(jax.grad(loss))(params)
        return float(jnp.sum(g["cls_token"].astype(jnp.float32)))

    probe("mae_base_plain", lambda: mae_grad("mae_vit_base"))
    probe("mae_base_msldcecd", lambda: mae_grad("mae_vit_base_MsLdCeCd"))


STAGES = {
    "kernels": stage_kernels,
    "shapes": stage_shapes,
    "integration": stage_integration,
    "model": stage_model,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", *STAGES])
    args = ap.parse_args()
    for name, fn in STAGES.items():
        if args.stage in ("all", name):
            print(f"== stage {name} ==", flush=True)
            fn()
