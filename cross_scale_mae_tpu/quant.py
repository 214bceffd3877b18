"""Weight-only int8 quantization for the serving path.

TPU serving at low batch is weight-bandwidth-bound: every request streams
the full parameter set from HBM while the MXU idles. Storing matmul
kernels as int8 with per-output-channel scales cuts that stream (and the
exported artifact) ~4x; activations and compute stay in the model's
compute dtype, and the dequantize (``q.astype(dtype) * scale``) is a
trivially fusable elementwise op XLA folds into the consumer matmul's
operand. Training is untouched — this is a post-training transform
applied by ``cli/serve.py --quantize int8`` and ``cli/export.py
--quantize int8``.

Scheme: symmetric, per-output-channel. For a kernel ``(..., in, out)`` the
scale is ``max|w|`` over the ``in`` axis (axis -2), kept broadcastable, so
stacked block kernels ``(layers, in, out)`` get per-(layer, out-channel)
scales. Only leaves *named* ``kernel`` with ndim >= 2 are quantized —
biases, norm scales, cls/pos embeddings, and BN state keep full precision
(quantizing an additive table would inject bias for ~zero bandwidth win).

The reference has no quantization (or serving) story; this is
beyond-reference capability, validated by round-trip + output-parity
tests (tests/test_quant.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np

_Q = "__int8__"


def quantize_params_int8(params: Any) -> Any:
    """Params pytree -> same-structure tree with matmul kernels replaced by
    ``{"__int8__": int8 codes, "scale": f32 per-out-channel}`` nodes."""
    import jax

    def q(path, leaf):
        name = str(getattr(path[-1], "key", getattr(path[-1], "name", "")))
        if name != "kernel" or getattr(leaf, "ndim", 0) < 2:
            return leaf
        w = np.asarray(leaf, np.float32)
        scale = np.max(np.abs(w), axis=-2, keepdims=True) / 127.0
        scale = np.maximum(scale, 1e-12)  # all-zero channels
        codes = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return {_Q: codes, "scale": scale.astype(np.float32)}

    return jax.tree_util.tree_map_with_path(q, params)


def dequantize_params(qparams: Any, dtype: Any = None) -> Any:
    """Inverse transform, for use INSIDE a jitted forward: the stored
    arrays stay int8 in HBM; XLA fuses the cast+multiply into the
    consuming matmul's operand read."""
    import jax.numpy as jnp

    def is_qnode(x):
        return isinstance(x, dict) and _Q in x

    def dq(x):
        if is_qnode(x):
            w = x[_Q].astype(dtype or jnp.float32) * x["scale"].astype(
                dtype or jnp.float32)
            return w
        return x

    import jax

    return jax.tree_util.tree_map(dq, qparams, is_leaf=is_qnode)


def quantized_bytes(qparams: Any) -> tuple[int, int]:
    """(quantized tree bytes, what the fp32 tree would be) — for logging."""
    import jax

    q_total = fp_total = 0
    for leaf in jax.tree_util.tree_leaves(qparams):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        q_total += n * np.dtype(leaf.dtype).itemsize
        fp_total += n * (4 if leaf.dtype == np.int8 else
                         np.dtype(leaf.dtype).itemsize)
    return q_total, fp_total
