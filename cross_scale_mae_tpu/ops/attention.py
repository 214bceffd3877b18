"""Fused multi-head attention kernels (Pallas/TPU) with an XLA reference.

The reference delegates attention to timm / xFormers CUDA kernels
(``models_mae/MAE_ViT_Baseline.py:94-188``; attention-variant flag at
``main_pretrain.py:101-119``). Here the canonical implementation is the XLA
einsum path in ``models/layers.py`` (XLA already emits fused TPU attention
for these shapes); this module adds a hand-written Pallas kernel selected by
``attention_impl='pallas'``.

Shape regime: Cross-Scale MAE sequences are tiny (17..257 tokens: 64-1024
patches + cls; SURVEY.md §2 "SP: N/A"), so the whole (L, L) score matrix of
one head fits comfortably in VMEM — no K/V streaming needed. The kernel
processes a *group* of heads per grid step so the second-to-last dims keep
the MXU/VPU busy, computes logits and softmax in fp32, and writes bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_fp32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                    *, scale: float):
    """Full-recompute attention backward for one head-group block.

    With L <= 257 the whole (L, L) probability matrix sits in VMEM, so the
    flash-style streaming backward is unnecessary — one recompute pass:
      dV = Pᵀ dO;  dS = P ∘ (dP − rowsum(dP ∘ P));  dQ = dS·K;  dK = dSᵀ·Q.
    """
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    p = _softmax_fp32(logits)  # (G, L, L)
    dv = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, L, hd): sum_q p[q,l] do[q,d]
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, L, L)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # Blocks: (G, L, hd) — G = heads-per-program group.
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # (G, L, L)
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # (G, L, hd)
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _group_for(bh: int) -> int:
    group = 8
    while bh % group:
        group //= 2
    return group


def _fold(x):
    n, l, h, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n * h, l, hd)


def _unfold(x, n, h):
    bh, l, hd = x.shape
    return x.reshape(n, h, l, hd).transpose(0, 2, 1, 3)


def _mha_fwd_call(qf, kf, vf, interpret):
    bh, l, hd = qf.shape
    group = _group_for(bh)
    scale = hd ** -0.5
    spec = pl.BlockSpec((group, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l, hd), qf.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * l * hd,
            bytes_accessed=4 * bh * l * hd * qf.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha_folded(qf, kf, vf, interpret):
    return _mha_fwd_call(qf, kf, vf, interpret)


def _mha_folded_fwd(qf, kf, vf, interpret):
    return _mha_fwd_call(qf, kf, vf, interpret), (qf, kf, vf)


def _mha_folded_bwd(interpret, res, do):
    qf, kf, vf = res
    bh, l, hd = qf.shape
    group = _group_for(bh)
    scale = hd ** -0.5
    spec = pl.BlockSpec((group, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, l, hd), qf.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(bh // group,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * l * l * hd,
            bytes_accessed=7 * bh * l * hd * qf.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf, do)
    return dq, dk, dv


_mha_folded.defvjp(_mha_folded_fwd, _mha_folded_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """q, k, v: (N, L, H, hd) -> (N, L, H, hd). Softmax(QKᵀ/√hd)V per head.

    Differentiable: custom VJP with a one-pass full-recompute backward
    kernel (_mha_bwd_kernel)."""
    n, l, h, hd = q.shape
    out = _mha_folded(_fold(q), _fold(k), _fold(v), interpret)
    return _unfold(out, n, h)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pallas MHA, auto-falling back to interpreter mode off-TPU (CPU tests)."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pallas_mha(q, k, v, interpret=interpret)


# --------------------------------------------------------------------------
# v2 (EXPERIMENTAL — currently unused): transpose-free layout. The round-1
# profile showed the _fold/_unfold transposes around the v1 kernels cost
# ~28 ms/step of HBM copy/transpose traffic, so v2 consumes the raw qkv
# projection output layout directly. STATUS: numerically correct in
# interpreter mode, but slicing the second-minor head axis inside the kernel
# crashes this toolchain's Mosaic remote compiler (tpu_compile_helper exit 1)
# for both rank-5 and rank-4 block formulations. Kept for a future toolchain;
# models/layers.py uses the v1 head-folded kernel.
# --------------------------------------------------------------------------


def _mha2_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float):
    # qkv_ref: (1, L, 3H, hd) with q heads at [0,H), k at [H,2H), v at [2H,3H);
    # o_ref: (1, L, H, hd). Rank-4 blocks (rank-5 breaks Mosaic).
    h = num_heads
    for g in range(num_heads):
        q = qkv_ref[0, :, g, :].astype(jnp.float32)  # (L, hd)
        k = qkv_ref[0, :, h + g, :].astype(jnp.float32)
        v = qkv_ref[0, :, 2 * h + g, :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = _softmax_fp32(logits)
        out = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, g, :] = out.astype(o_ref.dtype)


def _mha2_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int, scale: float):
    # Recompute backward per head; dqkv written in qkv layout.
    h = num_heads
    for g in range(num_heads):
        q = qkv_ref[0, :, g, :].astype(jnp.float32)
        k = qkv_ref[0, :, h + g, :].astype(jnp.float32)
        v = qkv_ref[0, :, 2 * h + g, :].astype(jnp.float32)
        do = do_ref[0, :, g, :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = _softmax_fp32(logits)  # (L, L)
        dv = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (L, hd): sum_q p[q,l] do[q,:]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (L, L)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row) * scale
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqkv_ref[0, :, g, :] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, h + g, :] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * h + g, :] = dv.astype(dqkv_ref.dtype)


def _mha2_fwd_call(qkv, num_heads, interpret):
    n, l, three_h, hd = qkv.shape
    h = num_heads
    assert three_h == 3 * h
    scale = hd ** -0.5
    in_spec = pl.BlockSpec((1, l, 3 * h, hd), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, l, h, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha2_kernel, num_heads=h, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, l, h, hd), qkv.dtype),
        grid=(n,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * l * l * hd,
            bytes_accessed=4 * n * l * h * hd * qkv.dtype.itemsize,
            transcendentals=n * h * l * l,
        ),
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pallas_mha_qkv(qkv, num_heads, interpret):
    """qkv: (N, L, 3*H, hd) -> (N, L, H, hd), no layout changes anywhere."""
    return _mha2_fwd_call(qkv, num_heads, interpret)


def _mha2_cvjp_fwd(qkv, num_heads, interpret):
    return _mha2_fwd_call(qkv, num_heads, interpret), (qkv,)


def _mha2_cvjp_bwd(num_heads, interpret, res, do):
    (qkv,) = res
    n, l, three_h, hd = qkv.shape
    h = num_heads
    scale = hd ** -0.5
    qkv_spec = pl.BlockSpec((1, l, 3 * h, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, l, h, hd), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_mha2_bwd_kernel, num_heads=h, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(n,),
        in_specs=[qkv_spec, do_spec],
        out_specs=qkv_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * h * l * l * hd,
            bytes_accessed=7 * n * l * h * hd * qkv.dtype.itemsize,
            transcendentals=n * h * l * l,
        ),
    )(qkv, do)
    return (dqkv,)


pallas_mha_qkv.defvjp(_mha2_cvjp_fwd, _mha2_cvjp_bwd)


def mha_qkv(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Transpose-free Pallas MHA on the raw qkv projection output.

    SPMD note: a pallas_call is opaque to GSPMD, so under a multi-chip mesh
    prefer ``attention_impl='xla'`` (default) or wrap the model in shard_map.
    The Pallas path is the single-chip speed king (bench.py).
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pallas_mha_qkv(qkv, num_heads, interpret)


# --------------------------------------------------------------------------
# v3: natural-layout kernel. The round-1 profile charged ~28 ms/step to the
# HBM fold/unfold transposes around the v1 kernel ((N,L,H,hd) <->
# (N*H,L,hd)). v3 consumes the qkv projection's OWN output layout
# (N, L, 3D) as a full-width VMEM block and splits heads by slicing the
# loaded *value* (lane extracts inside VMEM) — unlike v2, no ref is ever
# sliced along a minor dim, which is what crashed this toolchain's Mosaic
# compiler. Output is written back in (N, L, D), the exact layout the proj
# matmul wants. Zero HBM relayouts end to end.
# --------------------------------------------------------------------------


def _mha3_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int, scale: float):
    # Heads are written into o_ref one at a time: accumulating all heads in
    # a list + concatenate keeps every per-head tensor live simultaneously
    # and blows the 16 MB VMEM stack (measured: 22.2 MB for the decoder
    # backward). Per-head ref stores bound liveness to one head.
    # MXU mode: operands stay bf16 (fp32 accumulate via
    # preferred_element_type) — casting to fp32 first would force the ~4x
    # slower fp32 MXU path for zero information gain (inputs ARE bf16).
    # Softmax runs on the exact fp32 logits; probabilities are rounded to
    # bf16 for the AV matmul (the standard TPU flash-attention recipe).
    x = qkv_ref[:]  # (G, L, 3D) value; all slicing below is on the value.
    d = num_heads * head_dim
    for g in range(num_heads):
        o = g * head_dim
        q = x[:, :, o:o + head_dim]
        k = x[:, :, d + o:d + o + head_dim]
        v = x[:, :, 2 * d + o:2 * d + o + head_dim]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _softmax_fp32(logits).astype(x.dtype)
        out = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, o:o + head_dim] = out.astype(o_ref.dtype)


def _mha3_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int,
                     head_dim: int, scale: float):
    # bf16 MXU operands + fp32 accumulate throughout (see fwd kernel note);
    # softmax/dS algebra stays fp32, matmul inputs are rounded to bf16.
    x = qkv_ref[:]          # (G, L, 3D)
    do_full = do_ref[:]     # (G, L, D)
    d = num_heads * head_dim
    for g in range(num_heads):
        o = g * head_dim
        q = x[:, :, o:o + head_dim]
        k = x[:, :, d + o:d + o + head_dim]
        v = x[:, :, 2 * d + o:2 * d + o + head_dim]
        do = do_full[:, :, o:o + head_dim]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _softmax_fp32(logits)
        p_b = p.astype(x.dtype)
        dv = jax.lax.dot_general(
            p_b, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row) * scale).astype(x.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dt = dqkv_ref.dtype
        # Store per head (see fwd kernel note on VMEM-stack liveness).
        dqkv_ref[:, :, o:o + head_dim] = dq.astype(dt)
        dqkv_ref[:, :, d + o:d + o + head_dim] = dk.astype(dt)
        dqkv_ref[:, :, 2 * d + o:2 * d + o + head_dim] = dv.astype(dt)


def _group3_for(n: int, l: int, three_d: int, itemsize: int, bwd: bool) -> int:
    """Largest power-of-2 batch group whose double-buffered VMEM blocks fit
    the scoped-VMEM budget. Bigger groups mean more rows per head-matmul =>
    better MXU utilization. The budget is env-dependent: 12 MB under the
    compiler's default 16 MB scoped-VMEM limit, 15 MB when the package
    init raised the limit to >= 24 MB via LIBTPU_INIT_ARGS (which admits
    the decoder backward at G=16; the encoder's short L=17 blocks take
    G=32 either way)."""
    d = three_d // 3
    # True per-item double-buffered block footprint: the forward reads qkv
    # (3d wide) and writes attn-out (d) = 4d*l; the backward reads qkv (3d)
    # + do (d) and WRITES dqkv (3d) = 7d*l. (An earlier version counted the
    # backward output as d wide — a 40% undercount that the tuned budgets
    # compensated for; formula and budgets are now consistent.)
    per_item = (3 * d + d + (3 * d if bwd else 0)) * itemsize * l
    # Budget = scoped-VMEM limit minus headroom for the kernel stack and
    # operands XLA keeps VMEM-resident (S(1)) in the full program. 12 MB
    # under the default 16 MB limit keeps the empirically validated groups
    # (decoder bwd G=8 at 7.5 MB — G=16's 14.9 MB OOMs the full step there;
    # encoder bwd G=32 at 11.7 MB fits). With the package-init raise to
    # 24 MB, a 15 MB budget admits exactly the decoder backward at G=16
    # (3% faster flagship step, 112.2 -> 108.7 ms) and nothing larger.
    from cross_scale_mae_tpu import scoped_vmem_limit_kib

    budget_mb = 15 if scoped_vmem_limit_kib() >= 24576 else 12
    group = 32
    while group > 1 and (n % group or 2 * group * per_item > budget_mb * 2 ** 20):
        group //= 2
    return group


def _mha3_fwd_pallas(qkv, num_heads, interpret):
    n, l, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    group = _group3_for(n, l, three_d, qkv.dtype.itemsize, bwd=False)
    scale = hd ** -0.5
    in_spec = pl.BlockSpec((group, l, three_d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((group, l, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha3_kernel, num_heads=num_heads, head_dim=hd,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, l, d), qkv.dtype),
        grid=(n // group,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * num_heads * l * l * hd,
            bytes_accessed=4 * n * l * d * qkv.dtype.itemsize,
            transcendentals=n * num_heads * l * l,
        ),
    )(qkv)


def _mha3_bwd_pallas(qkv, do, num_heads, interpret):
    n, l, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    group = _group3_for(n, l, three_d, qkv.dtype.itemsize, bwd=True)
    scale = hd ** -0.5
    qkv_spec = pl.BlockSpec((group, l, three_d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((group, l, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha3_bwd_kernel, num_heads=num_heads, head_dim=hd,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(n // group,),
        in_specs=[qkv_spec, do_spec],
        out_specs=qkv_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * num_heads * l * l * hd,
            bytes_accessed=7 * n * l * d * qkv.dtype.itemsize,
            transcendentals=n * num_heads * l * l,
        ),
    )(qkv, do)


# GSPMD integration (VERDICT r1: "Pallas usable on the default multi-chip
# path"): pallas_call is opaque to the partitioner, so both kernels are
# wrapped in custom_partitioning with a batch-dim rule — each shard runs the
# kernel on its local batch, exactly like the shard_map mode but composable
# with TP/ZeRO shardings elsewhere in the program.


def _batch_shard_partition(n_operands):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def partition(num_heads, interpret, mesh, arg_shapes, result_shape):
        batch = arg_shapes[0].sharding.spec[0] if arg_shapes[0].sharding.spec else None
        arg_sh = tuple(
            NamedSharding(mesh, P(batch, None, None)) for _ in range(n_operands)
        )
        out_sh = NamedSharding(mesh, P(batch, None, None))

        def lower(*args):
            if n_operands == 1:
                return _mha3_fwd_pallas(args[0], num_heads, interpret)
            return _mha3_bwd_pallas(args[0], args[1], num_heads, interpret)

        return mesh, lower, out_sh, arg_sh

    return partition


from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

_mha3_fwd_cp = custom_partitioning(_mha3_fwd_pallas, static_argnums=(1, 2))
_mha3_fwd_cp.def_partition(
    partition=_batch_shard_partition(1),
    sharding_rule="b l x -> b l y",
)
_mha3_bwd_cp = custom_partitioning(_mha3_bwd_pallas, static_argnums=(2, 3))
_mha3_bwd_cp.def_partition(
    partition=_batch_shard_partition(2),
    sharding_rule="b l x, b l y -> b l x",
)


def _use_cp() -> bool:
    # The custom_partitioning wrapper is only needed on a multi-device
    # program (it makes GSPMD shard the kernel batch-wise). On the 1-chip
    # axon platform it additionally trips a Mosaic remote-compiler crash
    # (tpu_compile_helper exit 1 — the bare kernels compile fine, probed in
    # benchmarks/probe_mosaic*.py), so bypass it there.
    return jax.device_count() > 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pallas_mha_v3(qkv, num_heads, interpret):
    """qkv: (N, L, 3D) in the raw projection layout -> (N, L, D).

    Heads live contiguously in the last dim ([q0..qH, k0..kH, v0..vH], each
    head_dim wide), matching ``reshape(N, L, 3, H, hd)`` semantics in
    models/layers.py. Differentiable (recompute backward) and GSPMD-
    partitionable (batch-dim custom_partitioning)."""
    fwd = _mha3_fwd_cp if _use_cp() else _mha3_fwd_pallas
    return fwd(qkv, num_heads, interpret)


def _mha3_cvjp_fwd(qkv, num_heads, interpret):
    fwd = _mha3_fwd_cp if _use_cp() else _mha3_fwd_pallas
    return fwd(qkv, num_heads, interpret), (qkv,)


def _mha3_cvjp_bwd(num_heads, interpret, res, do):
    (qkv,) = res
    bwd = _mha3_bwd_cp if _use_cp() else _mha3_bwd_pallas
    return (bwd(qkv, do, num_heads, interpret),)


pallas_mha_v3.defvjp(_mha3_cvjp_fwd, _mha3_cvjp_bwd)


def mha_v3(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """v3 Pallas MHA on the raw qkv projection output (no HBM relayouts),
    auto-falling back to interpreter mode off-TPU (CPU tests)."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pallas_mha_v3(qkv, num_heads, interpret)


def xla_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference einsum attention (same contract as :func:`pallas_mha`)."""
    hd = q.shape[-1]
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


# --------------------------------------------------------------------------
# Alternative attention variants. The reference exposes xFormers research
# attentions behind ``--attn_name`` (main_pretrain.py:101-119: linformer,
# orthoformer, nystrom, fourier_mix, local, shunted). At 17-257 tokens none
# of them buys anything on TPU (SURVEY.md §2 marks them optional), but all
# six xFormers-backed names are carried for flag-surface parity — including
# the parameterized ones (linformer's learned sequence projections live in
# each block's attn params). 'shunted' maps to the four missing
# models_mae_shunted modules (reference defect #1) and stays out of scope.
# --------------------------------------------------------------------------


def linformer_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    e_proj: jnp.ndarray, f_proj: jnp.ndarray,
) -> jnp.ndarray:
    """Linformer attention (Wang et al. 2020; xFormers 'linformer').

    K and V are projected along the SEQUENCE axis by learned matrices E/F of
    shape (seq_len, proj_k) sized at init to the declared seq_len
    (num_patches+1, MAE_ViT_Baseline.py:110); when the actual sequence is
    shorter (masked encoder), the projection rows are sliced to L."""
    n, l, h, hd = q.shape
    e = e_proj[:l].astype(q.dtype)   # (L, m)
    f = f_proj[:l].astype(q.dtype)
    k_p = jnp.einsum("nlhd,lm->nmhd", k, e)
    v_p = jnp.einsum("nlhd,lm->nmhd", v, f)
    logits = jnp.einsum(
        "nqhd,nmhd->nhqm", q, k_p, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nhqm,nmhd->nqhd", probs, v_p)


def _iterative_pinv(s: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Newton-Schulz Moore-Penrose pseudo-inverse of a row-stochastic
    (..., m, m) matrix (the Nystromformer recipe, 6 iterations)."""
    m = s.shape[-1]
    eye = jnp.eye(m, dtype=s.dtype)
    # init: z = sT / (max row sum * max col sum) guarantees convergence
    denom = (
        jnp.max(jnp.sum(jnp.abs(s), axis=-1), axis=-1, keepdims=True)
        * jnp.max(jnp.sum(jnp.abs(s), axis=-2), axis=-1, keepdims=True)
    )[..., None]
    z = jnp.swapaxes(s, -1, -2) / denom
    for _ in range(iters):
        sz = s @ z
        z = 0.25 * z @ (13 * eye - sz @ (15 * eye - sz @ (7 * eye - sz)))
    return z


def _segment_means(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """(N, L, H, hd) -> (N, m, H, hd) segment means along L.

    The remainder is DISTRIBUTED across segments (first ``l % m`` segments
    get one extra row) so every landmark covers real tokens. The previous
    uniform ceil(l/m)-sized scheme left the tail landmarks covering only
    zero padding whenever l is just over m — e.g. L=65 with 64 landmarks
    produced 31 zero landmarks, silently degrading the Nystrom
    approximation at the flagship sequence lengths."""
    n, l, h, hd = x.shape
    base, rem = divmod(l, m)
    # segment id per row: first `rem` segments have (base+1) rows
    row = jnp.arange(l)
    cut = rem * (base + 1)
    seg_id = jnp.where(
        row < cut,
        row // max(base + 1, 1),
        rem + jnp.where(base > 0, (row - cut) // max(base, 1), 0),
    ).astype(jnp.int32)
    counts = jnp.zeros((m,), x.dtype).at[seg_id].add(1.0)
    sums = jnp.zeros((n, m, h, hd), x.dtype).at[:, seg_id].add(x)
    return sums / jnp.clip(counts, 1.0, None)[None, :, None, None]


def nystrom_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_landmarks: int = 64
) -> jnp.ndarray:
    """Nystromformer attention (Xiong et al. 2021; xFormers 'nystrom'):
    softmax(Q K̃ᵀ) · pinv(softmax(Q̃ K̃ᵀ)) · softmax(Q̃ Kᵀ) V with landmark
    segment means and an iterative pseudo-inverse. Falls back to exact
    attention when L <= num_landmarks."""
    n, l, h, hd = q.shape
    if l <= num_landmarks:
        return xla_mha(q, k, v)
    scale = hd ** -0.5
    m = num_landmarks
    q_l = _segment_means(q, m)  # (N, m, H, hd)
    k_l = _segment_means(k, m)
    f1 = jax.nn.softmax(
        jnp.einsum("nqhd,nmhd->nhqm", q, k_l,
                   preferred_element_type=jnp.float32) * scale, axis=-1)
    f2 = jax.nn.softmax(
        jnp.einsum("nahd,nbhd->nhab", q_l, k_l,
                   preferred_element_type=jnp.float32) * scale, axis=-1)
    f3 = jax.nn.softmax(
        jnp.einsum("nmhd,nkhd->nhmk", q_l, k,
                   preferred_element_type=jnp.float32) * scale, axis=-1)
    out = f1 @ _iterative_pinv(f2) @ (
        f3 @ v.transpose(0, 2, 1, 3).astype(jnp.float32)
    )  # (N, H, L, hd)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def orthoformer_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_landmarks: int = 32
) -> jnp.ndarray:
    """Orthoformer-style landmark attention (Motionformer; xFormers
    'orthoformer'): queries attend to a landmark subset of Q, landmarks
    attend to all of K/V — O(L·m). Landmarks are a deterministic strided
    subset of the queries (the xFormers OMP selection is replaced by
    striding, which is XLA-friendly; at 17-257 tokens the approximation
    quality is equivalent). Falls back to exact attention for L <= m."""
    n, l, h, hd = q.shape
    if l <= num_landmarks:
        return xla_mha(q, k, v)
    scale = hd ** -0.5
    idx = jnp.linspace(0, l - 1, num_landmarks).astype(jnp.int32)
    q_l = q[:, idx]  # (N, m, H, hd)
    attn1 = jax.nn.softmax(
        jnp.einsum("nqhd,nmhd->nhqm", q, q_l,
                   preferred_element_type=jnp.float32) * scale, axis=-1)
    attn2 = jax.nn.softmax(
        jnp.einsum("nmhd,nkhd->nhmk", q_l, k,
                   preferred_element_type=jnp.float32) * scale, axis=-1)
    out = attn1 @ (attn2 @ v.transpose(0, 2, 1, 3).astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def local_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window: int = 5
) -> jnp.ndarray:
    """Sliding-window attention: token i attends to |i-j| <= window//2.

    With L <= 257 the banded mask is applied to the full score matrix — the
    masked softmax costs nothing extra at these lengths."""
    n, l, h, hd = q.shape
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    ii = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    band = jnp.abs(ii - jj) <= window // 2
    logits = jnp.where(band[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


def fourier_mix(q: jnp.ndarray) -> jnp.ndarray:
    """FNet-style token mixing (xFormers FourierMix): real part of a 2-D FFT
    over (sequence, features); k/v are unused, like the xFormers block."""
    n, l, h, hd = q.shape
    x = q.reshape(n, l, h * hd).astype(jnp.float32)
    out = jnp.fft.fft(jnp.fft.fft(x, axis=-1), axis=-2).real
    return out.reshape(n, l, h, hd).astype(q.dtype)
