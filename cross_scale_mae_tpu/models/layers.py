"""Functional transformer building blocks on plain-pytree params.

Replaces the reference's timm ``Block``/``PatchEmbed`` dependency
(``models_mae/MAE_ViT_Baseline.py:7, 160-188``) with from-scratch JAX:

* Parameters are nested dicts of fp32 arrays; linear kernels are (in, out).
* **Layer stacks are scanned**: per-layer params are stacked on a leading
  axis and the stack runs under ``jax.lax.scan`` — one trace and one HLO body
  regardless of depth (compile time and code size stay O(1) in layers), with
  optional ``jax.checkpoint`` rematerialization per layer.
* Compute dtype is configurable (bf16 by default); LayerNorm statistics and
  softmax run in fp32.
* Init matches the reference: xavier-uniform linear weights / zero bias
  (MAE_ViT_Baseline.py:233-241), normal(0.02) tokens (:229-230).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.ops.numerics import accum_dtype, at_least_f32

Params = dict[str, Any]


# ---------------------------------------------------------------- init utils


def xavier_uniform(rng: jax.Array, shape: tuple[int, ...], fan_in: int, fan_out: int):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


def linear_init(rng: jax.Array, d_in: int, d_out: int) -> Params:
    return {
        "kernel": xavier_uniform(rng, (d_in, d_out), d_in, d_out),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def block_init(
    rng: jax.Array, dim: int, mlp_ratio: int = 4,
    attn_variant: str | None = None, seq_len: int | None = None,
) -> Params:
    """One pre-LN transformer block (timm Block layout, qkv fused).

    ``attn_variant='linformer'`` adds the learned sequence-projection
    matrices E/F (xFormers LinformerAttention; k = seq_len//4), sized to the
    declared ``seq_len`` = num_patches+1 (MAE_ViT_Baseline.py:110)."""
    k_qkv, k_proj, k_fc1, k_fc2, k_e, k_f = jax.random.split(rng, 6)
    hidden = dim * mlp_ratio
    attn: Params = {
        # Reference init treats the fused qkv as one Linear(dim, 3*dim)
        # (MAE_ViT_Baseline.py:233-238 xavier over the full matrix).
        "qkv": linear_init(k_qkv, dim, 3 * dim),
        "proj": linear_init(k_proj, dim, dim),
    }
    if attn_variant == "linformer":
        assert seq_len is not None, "linformer needs seq_len at init"
        proj_k = max(seq_len // 4, 1)
        attn["e_proj"] = xavier_uniform(k_e, (seq_len, proj_k), seq_len, proj_k)
        attn["f_proj"] = xavier_uniform(k_f, (seq_len, proj_k), seq_len, proj_k)
    return {
        "norm1": layer_norm_init(dim),
        "attn": attn,
        "norm2": layer_norm_init(dim),
        "mlp": {
            "fc1": linear_init(k_fc1, dim, hidden),
            "fc2": linear_init(k_fc2, hidden, dim),
        },
    }


def stacked_blocks_init(
    rng: jax.Array, num_layers: int, dim: int, mlp_ratio: int = 4,
    attn_variant: str | None = None, seq_len: int | None = None,
) -> Params:
    """num_layers blocks with leading stack axis on every leaf."""
    keys = jax.random.split(rng, num_layers)
    blocks = [
        block_init(k, dim, mlp_ratio, attn_variant, seq_len) for k in keys
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


# --------------------------------------------------------------- apply utils


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LN with (at least) fp32 statistics regardless of activation dtype."""
    dtype = x.dtype
    ct = accum_dtype(dtype)
    x32 = x.astype(ct)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(ct) + p["bias"].astype(ct)
    return y.astype(dtype)


def _attention_pallas_t(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Pallas attention with the head transpose fused into the projections.

    The v1 kernel wants (N*H, L, hd); materializing that from (N, L, H, hd)
    costs explicit HBM transposes (~28 ms/step in the round-1 profile).
    Here the qkv matmul itself emits head-major output
    (einsum 'nld,dshk->nshlk') and the proj matmul consumes it back
    ('nhlk,hkd->nld') — the relayout rides the MXU epilogue instead of a
    standalone transpose pass."""
    import jax

    n, l, d = x.shape
    hd = d // num_heads
    wq = p["qkv"]["kernel"].astype(x.dtype).reshape(d, 3, num_heads, hd)
    bq = p["qkv"]["bias"].astype(x.dtype).reshape(3, num_heads, hd)
    qkv = jnp.einsum(
        "nld,dshk->nshlk", x, wq, preferred_element_type=x.dtype
    ) + bq[None, :, :, None, :]
    q = qkv[:, 0].reshape(n * num_heads, l, hd)
    k = qkv[:, 1].reshape(n * num_heads, l, hd)
    v = qkv[:, 2].reshape(n * num_heads, l, hd)
    from cross_scale_mae_tpu.ops.attention import _mha_folded

    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _mha_folded(q, k, v, interpret).reshape(n, num_heads, l, hd)
    wp = p["proj"]["kernel"].astype(x.dtype).reshape(num_heads, hd, d)
    return jnp.einsum(
        "nhlk,hkd->nld", out, wp, preferred_element_type=x.dtype
    ) + p["proj"]["bias"].astype(x.dtype)


def attention(p: Params, x: jnp.ndarray, num_heads: int, impl: str = "xla") -> jnp.ndarray:
    """Multi-head self-attention with fused qkv (timm Attention layout).

    Perf note (measured, round 1): explicitly flattening (N, L, D) ->
    (N*L, D) for the qkv/proj matmuls REGRESSED the full step 105->117 ms —
    XLA already folds batched matmuls onto the MXU efficiently here and the
    extra reshapes cost copies. Keep the natural batched layout."""
    if impl == "pallas_t":
        return _attention_pallas_t(p, x, num_heads)
    if impl == "pallas_v3":
        # Natural-layout kernel: consumes the qkv matmul output directly and
        # returns proj's input layout — no head fold/unfold transposes
        # (ops/attention.py v3; GSPMD-partitionable via custom_partitioning).
        from cross_scale_mae_tpu.ops.attention import mha_v3

        return linear(p["proj"], mha_v3(linear(p["qkv"], x), num_heads))
    n, l, d = x.shape
    head_dim = d // num_heads
    qkv = linear(p["qkv"], x)  # (N, L, 3D)
    qkv = qkv.reshape(n, l, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (N, L, H, hd)
    if impl == "pallas":
        # v1 head-folded kernel. (The transpose-free v2 layout crashes the
        # Mosaic compiler on this toolchain — see ops/attention.py v2 notes.)
        from cross_scale_mae_tpu.ops.attention import mha

        out = mha(q, k, v)
    elif impl == "linformer":
        from cross_scale_mae_tpu.ops.attention import linformer_mha

        out = linformer_mha(q, k, v, p["e_proj"], p["f_proj"])
    elif impl == "nystrom":
        from cross_scale_mae_tpu.ops.attention import nystrom_mha

        out = nystrom_mha(q, k, v)
    elif impl == "orthoformer":
        from cross_scale_mae_tpu.ops.attention import orthoformer_mha

        out = orthoformer_mha(q, k, v)
    elif impl == "local":
        from cross_scale_mae_tpu.ops.attention import local_mha

        out = local_mha(q, k, v)
    elif impl == "fourier_mix":
        from cross_scale_mae_tpu.ops.attention import fourier_mix

        out = fourier_mix(q)
    else:
        scale = head_dim ** -0.5
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k,
            preferred_element_type=accum_dtype(q.dtype),
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v)
    out = out.reshape(n, l, d)
    return linear(p["proj"], out)


def sp_constrain(x: jnp.ndarray) -> jnp.ndarray:
    """Megatron-style sequence-parallel residual constraint.

    Pins the residual stream's token axis to the ``'model'`` mesh axis (the
    batch axis stays on ``'data'``): LayerNorms and residual adds then run
    sequence-sharded, and GSPMD implements the tensor-parallel block-boundary
    reductions as reduce-scatter + all-gather pairs instead of all-reduces —
    same bytes on the wire, but the activations between blocks live 1/tp-sized
    per chip. Shapes: (N, L, D) carries shard L; the flat (N*L, D) carry
    shards the fused token axis over both mesh axes.

    Requires tracing inside a mesh context (the step builders enter
    ``with mesh:`` when given ``mesh=``; see train/pretrain.py).
    """
    from jax.sharding import PartitionSpec as P

    spec = P("data", "model", None) if x.ndim == 3 else P(("data", "model"), None)
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except RuntimeError as e:
        raise RuntimeError(
            "sequence_parallel=True needs the ('data','model') mesh in "
            "context at trace time — pass mesh= to the step builder (or "
            "wrap the traced call in `with mesh:`)"
        ) from e


_SQRT_HALF = float(np.sqrt(0.5))


@jax.custom_vjp
def gelu_exact_fastbwd(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU with the tanh-GELU derivative as backward
    (``gelu='exact_tanhbwd'``).

    Forward is BIT-IDENTICAL to ``jax.nn.gelu(x, approximate=False)`` (torch
    nn.GELU / timm Block numerics, MAE_ViT_Baseline.py:160-188): the same
    ``0.5 * x * erfc(-x/sqrt(2))`` op sequence in the input dtype, verified
    exhaustively over ALL 65536 bf16 bit patterns
    (tests/test_models.py::TestGeluFastBwd).

    The backward skips autodiff-through-erfc (which re-derives the erf over
    the full (N, L, 4D) activation — the dominant cost of ``gelu='exact'``)
    and uses the tanh-GELU derivative instead: measured deviation from the
    exact backward <= one bf16 ulp (max 2^-7 abs over a dense [-8, 8] grid),
    i.e. rounding-level for bf16 training. Flagship-measured on-chip
    (round 5): 2196 imgs/s/chip vs 2047 for 'exact' (+7.3%), recovering
    ~40% of the tanh<->exact gap at strict forward parity. A
    'exact_savephi' variant (same fwd, but SAVE ``h`` as a residual and
    differentiate analytically: ``d = 0.5*h + x*exp(-x^2/2)/sqrt(2*pi)``)
    measured 2028 — the extra activation residual's HBM traffic and lost
    fusion cost more than the saved erf recompute; not carried (formula
    above suffices to reproduce). Intended for bf16 training; fp32 parity
    work should use 'exact' (autodiff backward).
    """
    return jax.nn.gelu(x, approximate=False)


def _gelu_fb_fwd(x):
    h = jax.lax.erfc(-x * jnp.asarray(_SQRT_HALF, x.dtype))
    return (0.5 * x * h).astype(x.dtype), (x,)


def _gelu_fb_bwd(res, g):
    (x,) = res
    xf = at_least_f32(x)
    c = float(np.sqrt(2.0 / np.pi))
    t = jnp.tanh(c * (xf + 0.044715 * xf**3))
    d = 0.5 * (1.0 + t) + 0.5 * xf * (1.0 - t * t) * c * (
        1.0 + 3.0 * 0.044715 * xf * xf
    )
    return ((at_least_f32(g) * d).astype(x.dtype),)


gelu_exact_fastbwd.defvjp(_gelu_fb_fwd, _gelu_fb_bwd)


def mlp(p: Params, x: jnp.ndarray, gelu: str = "tanh") -> jnp.ndarray:
    """MLP with GELU. ``gelu='tanh'`` (default) is the TPU-fast approximation
    computed in bf16; ``'exact'`` matches torch nn.GELU (timm Block / the
    reference) bit-for-bit but costs ~15% of the flagship step: XLA
    evaluates erfc in fp32 over the full (N, L, 4D) activation and
    bit-packs a sign predicate for the backward (profiled round 2,
    130.8 -> 112.2 ms/step). ``'exact_tanhbwd'`` keeps the bit-exact
    forward but swaps the backward for the tanh-GELU derivative (see
    :func:`gelu_exact_fastbwd`; +7.3% flagship). Golden-parity tests
    force 'exact'."""
    h = linear(p["fc1"], x)
    if gelu == "exact_tanhbwd":
        a = gelu_exact_fastbwd(h)
    else:
        a = jax.nn.gelu(h, approximate=(gelu != "exact"))
    return linear(p["fc2"], a)


def block(p: Params, x: jnp.ndarray, num_heads: int, impl: str = "xla",
          norm_style: str = "pre", gelu: str = "tanh",
          sp: bool = False) -> jnp.ndarray:
    """Transformer block. 'pre' = timm Block (x + f(ln(x))); 'post' mirrors the
    xFormers residual_norm_style='post' option (MAE_ViT_Baseline.py:33).
    ``sp=True`` pins the residual stream sequence-sharded after each join
    (see :func:`sp_constrain`)."""
    c = sp_constrain if sp else (lambda a: a)
    if norm_style == "pre":
        x = c(x + attention(p["attn"], layer_norm(p["norm1"], x), num_heads, impl))
        x = c(x + mlp(p["mlp"], layer_norm(p["norm2"], x), gelu))
    else:
        x = c(layer_norm(p["norm1"], x + attention(p["attn"], x, num_heads, impl)))
        x = c(layer_norm(p["norm2"], x + mlp(p["mlp"], x, gelu)))
    return x


def run_blocks(
    stacked: Params,
    x: jnp.ndarray,
    num_heads: int,
    impl: str = "xla",
    norm_style: str = "pre",
    remat: bool = False,
    scan: bool = True,
    gelu: str = "tanh",
    sp: bool = False,
) -> jnp.ndarray:
    """Apply a stack of blocks (leading axis = layer).

    ``scan=True`` runs under ``lax.scan`` (O(1) compile in depth).
    ``scan=False`` unrolls a Python loop over static layer slices —
    **measured faster in training**: the scan backward stacks every
    per-layer residual with dynamic-update-slice copies (~36% of the
    flagship step in the round-1 profile); unrolled, residuals are plain
    buffers with no stacking traffic. Compile time grows with depth, so
    scan stays the default for tests/interactive use.

    ``sp=True`` = sequence parallelism: the carry enters and leaves every
    block sequence-sharded over the 'model' mesh axis (:func:`sp_constrain`).
    """
    if sp:
        x = sp_constrain(x)
    if not scan:
        depth = jax.tree.leaves(stacked)[0].shape[0]
        blk = (jax.checkpoint(block, static_argnums=(2, 3, 4, 5, 6))
               if remat else block)
        for i in range(depth):
            layer = jax.tree.map(lambda a: a[i], stacked)
            x = blk(layer, x, num_heads, impl, norm_style, gelu, sp)
        return x

    def body(carry, layer_params):
        out = block(layer_params, carry, num_heads, impl, norm_style, gelu, sp)
        return out, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked)
    return x


def _attention_flat(p: Params, xf: jnp.ndarray, n: int, l: int, num_heads: int,
                    impl: str) -> jnp.ndarray:
    """Attention on a flattened (N*L, D) activation (see run_blocks_flat).

    Only the 'xla', 'pallas' and 'pallas_v3' implementations are wired on
    this (non-default) path; anything else must fail loudly — silently
    computing scaled-dot-product for, say, 'linformer' would train a
    different model than requested (its projection params would sit
    unused with zero gradient)."""
    if impl not in ("xla", "pallas", "pallas_v3"):
        raise NotImplementedError(
            f"flat_blocks supports attention_impl 'xla', 'pallas' or "
            f"'pallas_v3', got {impl!r} — use the default (non-flat) block "
            f"path for variant attentions"
        )
    d = xf.shape[-1]
    head_dim = d // num_heads
    if impl == "pallas_v3":
        # Natural-layout kernel on the flat carry: the qkv matmul runs on
        # (N*L, D) unpadded; only the kernel call sees the (N, L, 3D)
        # sequence layout (the flat design's contract — measured round 5,
        # VALIDATION flat+v3 note).
        from cross_scale_mae_tpu.ops.attention import mha_v3

        qkv3 = linear(p["qkv"], xf).reshape(n, l, 3 * d)
        return linear(p["proj"], mha_v3(qkv3, num_heads).reshape(n * l, d))
    qkv = linear(p["qkv"], xf).reshape(n, l, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if impl == "pallas":
        from cross_scale_mae_tpu.ops.attention import mha

        out = mha(q, k, v)
    else:
        scale = head_dim ** -0.5
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k,
            preferred_element_type=accum_dtype(q.dtype),
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(xf.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v)
    return linear(p["proj"], out.reshape(n * l, d))


def run_blocks_flat(
    stacked: Params,
    x: jnp.ndarray,
    num_heads: int,
    impl: str = "xla",
    norm_style: str = "pre",
    remat: bool = False,
    gelu: str = "tanh",
    sp: bool = False,
) -> jnp.ndarray:
    """Scanned stack with a FLAT (N*L, D) carry.

    Sequences here are 17-65 tokens; a (N, L, D) carry keeps L in the
    sublane-tiled dim (padded 17->32 for bf16) on every elementwise op.
    Flattening once around the whole stack — rather than per block — keeps
    all LN/residual/MLP traffic unpadded; only attention's own reshape sees
    the sequence axis.

    ``sp=True``: the flat carry is sharded over BOTH mesh axes on its fused
    token dim (:func:`sp_constrain`) — LN/residual/MLP run fully sharded and
    only attention's (n, l, ...) reshape gathers the sequence."""
    n, l, d = x.shape
    xf = x.reshape(n * l, d)
    c = sp_constrain if sp else (lambda a: a)
    xf = c(xf)

    def body(carry, p):
        if norm_style == "pre":
            carry = c(carry + _attention_flat(
                p["attn"], layer_norm(p["norm1"], carry), n, l, num_heads, impl
            ))
            carry = c(carry + mlp(p["mlp"], layer_norm(p["norm2"], carry), gelu))
        else:
            carry = c(layer_norm(
                p["norm1"],
                carry + _attention_flat(p["attn"], carry, n, l, num_heads, impl),
            ))
            carry = c(layer_norm(p["norm2"], carry + mlp(p["mlp"], carry, gelu)))
        return carry, None

    if remat:
        body = jax.checkpoint(body)
    xf, _ = jax.lax.scan(body, xf, stacked)
    return xf.reshape(n, l, d)


# --------------------------------------------------- predictor MLP (+ BN)


def predictor_init(rng: jax.Array, dim: int, num_tokens: int, hidden: int) -> Params:
    """Reference predictor MLP (models_mae/MLP.py): Linear -> BatchNorm1d over
    the *token* axis (channel = num_patches) -> ReLU -> Linear."""
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": linear_init(k1, dim, hidden),
        "bn": {
            "scale": jnp.ones((num_tokens,), jnp.float32),
            "bias": jnp.zeros((num_tokens,), jnp.float32),
        },
        "fc2": linear_init(k2, hidden, dim),
    }


def predictor_state_init(num_tokens: int) -> Params:
    return {
        "bn": {
            "mean": jnp.zeros((num_tokens,), jnp.float32),
            "var": jnp.ones((num_tokens,), jnp.float32),
        }
    }


def predictor_apply(
    p: Params,
    state: Params,
    x: jnp.ndarray,
    train: bool = True,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, Params]:
    """x: (N, T, D). BatchNorm normalizes over (N, D) per token position T —
    exactly torch BatchNorm1d(num_patches) on an (N, C=T, L=D) input.

    Batch statistics are local to the device shard (the reference's DDP
    BatchNorm behaves the same way). Returns (out, new_state).
    """
    h = linear(p["fc1"], x)  # (N, T, hidden)
    h32 = at_least_f32(h)
    if train:
        mean = jnp.mean(h32, axis=(0, 2))  # (T,)
        var = jnp.var(h32, axis=(0, 2))
        n = h32.shape[0] * h32.shape[2]
        unbiased = var * n / max(n - 1, 1)  # torch tracks unbiased running var
        new_state = {
            "bn": {
                "mean": (1 - momentum) * state["bn"]["mean"] + momentum * mean,
                "var": (1 - momentum) * state["bn"]["var"] + momentum * unbiased,
            }
        }
    else:
        mean, var = state["bn"]["mean"], state["bn"]["var"]
        new_state = state
    h32 = (h32 - mean[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + eps)
    h32 = h32 * p["bn"]["scale"][None, :, None] + p["bn"]["bias"][None, :, None]
    h = jax.nn.relu(h32).astype(h.dtype)
    return linear(p["fc2"], h), new_state
