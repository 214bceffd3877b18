"""Device mesh + sharding rules.

The reference's only distribution strategy is NCCL DDP
(``main_pretrain.py:417-420``; gradient all-reduce inside
``scaler.backward``, ``util/misc.py:314``). The TPU-native equivalent
(SURVEY.md §2 "parallelism table"): one ``Mesh`` over all chips with axes
``('data', 'model')``;

* batch arrays are sharded on ``data`` — XLA then inserts the gradient
  all-reduce (psum over ICI) automatically when replicated params meet
  sharded activations, which *is* DDP, fused into the backward;
* the ``model`` axis is the tensor-parallel hook (not needed for parity —
  ViT-L fits one chip — but wired): attention qkv/fc1 kernels shard on the
  output feature dim, proj/fc2 on the input feature dim (Megatron split), so
  each block needs exactly one psum at each of the two residual joins.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]


def make_mesh(
    devices: Optional[list] = None,
    model_parallel: int = 1,
    num_slices: int = 1,
) -> Mesh:
    """('data', 'model') mesh over all devices.

    Device ORDER inside the mesh decides which collective hops ride ICI vs
    DCN (scaling-book recipe): on real TPU the layout comes from
    ``mesh_utils.create_device_mesh`` (ICI-topology-aware ordering), and
    for multi-slice jobs ``num_slices > 1`` uses
    ``create_hybrid_device_mesh`` so the model axis stays inside a slice
    (ICI) and only the data axis crosses DCN. Virtual/CPU device sets have
    no topology metadata — they fall back to a plain reshape, which is
    also the bit-stable layout the tests pin."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp = model_parallel
    assert n % (tp * num_slices) == 0, (n, tp, num_slices)
    arr = None
    if devices[0].platform == "tpu":
        from jax.experimental import mesh_utils

        try:
            if num_slices > 1:
                arr = mesh_utils.create_hybrid_device_mesh(
                    (n // (tp * num_slices), tp), (num_slices, 1),
                    devices=devices,
                )
            else:
                arr = mesh_utils.create_device_mesh(
                    (n // tp, tp), devices=devices
                )
        except Exception as e:
            if num_slices > 1:
                # An EXPLICIT multi-slice request must not silently degrade
                # to a DCN-oblivious layout (large silent perf cliff).
                raise ValueError(
                    f"--num_slices {num_slices} could not build a hybrid "
                    f"DCN x ICI mesh over {n} devices: {e}"
                ) from e
            arr = None  # single chip / exotic topology: reshape below
    if arr is None:
        arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules keyed by (parent, leaf) name patterns. Kernel shapes:
# plain linear (in, out); stacked block leaves carry a leading layer axis.
_COL_PARALLEL = ("qkv", "fc1")   # shard output features
_ROW_PARALLEL = ("proj", "fc2")  # shard input features


def _spec_for(path_names: list[str], leaf) -> P:
    parent = path_names[-2] if len(path_names) >= 2 else ""
    stacked = any("blocks" in n for n in path_names)
    if path_names[-1] == "kernel" and parent in _COL_PARALLEL:
        return P(None, None, "model") if stacked else P(None, "model")
    if path_names[-1] == "kernel" and parent in _ROW_PARALLEL:
        return P(None, "model", None) if stacked else P("model", None)
    if path_names[-1] == "bias" and parent in _COL_PARALLEL:
        return P(None, "model") if stacked else P("model")
    return P()


def _largest_divisible_axis(shape: tuple, n: int, taken=()) -> Optional[int]:
    """Largest axis divisible by ``n`` and not already sharded; None if no
    axis qualifies (the leaf then stays replicated along that mesh axis)."""
    best = None
    for axis, dim in enumerate(shape):
        if axis in taken:
            continue
        if dim % n == 0 and dim >= n and (best is None or dim > shape[best]):
            best = axis
    return best


def param_shardings(
    mesh: Mesh,
    params: Params,
    tensor_parallel: bool = True,
    fsdp: bool = False,
) -> Params:
    """NamedSharding pytree for params.

    Default (DDP semantics, the reference's only mode): fully replicated.

    ``tensor_parallel=True`` on a mesh with ``model > 1`` applies the
    Megatron split rules above.

    ``fsdp=True`` additionally shards each large leaf (size > 1024) over the
    ``data`` axis on its largest not-already-sharded dimension — fully
    sharded data parallelism (ZeRO-3 storage). XLA's SPMD partitioner
    inserts the per-use all-gather in the forward and the reduce-scatter in
    the backward automatically; numerics match replicated DP up to float
    summation order (all-reduce vs reduce-scatter — params agree to ~1e-4
    after a step, ``tests/test_parallel.py::test_fsdp_matches_replicated_dp``;
    NOT bitwise, so don't compare checksums across --fsdp on/off). Composes
    with TP: the 'model'-sharded axis is excluded, so a leaf can be sharded
    on both mesh axes at once. Small leaves (norm scales, cls token, biases)
    stay replicated — gathering them costs more than storing them."""
    dp = mesh.shape["data"]
    tp_on = tensor_parallel and mesh.shape["model"] > 1

    def assign(path, leaf):
        spec = P()
        if tp_on:
            names = []
            for p in path:
                names.append(str(getattr(p, "key", getattr(p, "name", p))))
            spec = _spec_for(names, leaf)
        if fsdp and dp > 1 and getattr(leaf, "size", 0) > 1024:
            entries = list(spec) + [None] * (leaf.ndim - len(spec))
            taken = {i for i, s in enumerate(entries) if s is not None}
            ax = _largest_divisible_axis(leaf.shape, dp, taken)
            if ax is not None:
                entries[ax] = "data"
                spec = P(*entries)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def _zero1_spec(mesh: Mesh, shape: tuple) -> P:
    """ZeRO-1 sharding for an optimizer-moment leaf: split the largest axis
    divisible by the data-axis size; fall back to replicated."""
    best = _largest_divisible_axis(shape, mesh.shape["data"])
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def shard_train_state(
    mesh: Mesh, state, tensor_parallel: bool = True, zero1: bool = False,
    fsdp: bool = False,
):
    """Place a TrainState on the mesh: params per rules, opt/model state to
    match (optimizer moments share the param layout), scalars replicated.

    ``zero1=True`` shards optimizer moments over the ``data`` axis instead
    (ZeRO-1): each chip keeps 1/N of the Adam/LARS state; XLA's SPMD
    partitioner computes the update shard-wise and all-gathers the applied
    params — trades a collective for N-fold optimizer-state memory. Only
    worthwhile when optimizer state pressures HBM (ViT-H-scale).

    ``fsdp=True`` shards the params themselves over ``data`` (ZeRO-3
    storage; see :func:`param_shardings`); optimizer moments then follow the
    param layout automatically, which subsumes ZeRO-1 — passing both raises.
    """
    if fsdp and zero1:
        raise ValueError(
            "--fsdp already shards optimizer moments with the params "
            "(ZeRO-3 subsumes ZeRO-1); drop --zero1"
        )
    p_shard = param_shardings(mesh, state.params, tensor_parallel, fsdp=fsdp)
    params = jax.tree.map(jax.device_put, state.params, p_shard)
    # Optimizer state: leaves with the same shape as a param get that param's
    # sharding (Adam m/v, LARS mu); everything else is replicated.
    # Keyed on shape ONLY — a moment may live in a different dtype than its
    # param (``--adam_mu_dtype bfloat16``) and must still follow its layout
    # under FSDP/TP. Ambiguity (same shape, different shardings) -> replicated.
    shape_map: dict[tuple, Any] = {}
    for (pp, pl), (sp, sl) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(p_shard),
    ):
        key = pl.shape
        if key in shape_map and shape_map[key] != sl:
            shape_map[key] = replicated(mesh)
        else:
            shape_map[key] = sl

    def place_opt(x):
        if hasattr(x, "shape"):
            if zero1 and x.ndim >= 1 and x.size > 1024:
                return jax.device_put(
                    x, NamedSharding(mesh, _zero1_spec(mesh, x.shape))
                )
            sh = shape_map.get(x.shape, replicated(mesh))
            return jax.device_put(x, sh)
        return x

    opt_state = jax.tree.map(place_opt, state.opt_state)
    model_state = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)),
                               state.model_state)
    step = jax.device_put(state.step, replicated(mesh))
    return state.replace(
        step=step, params=params, model_state=model_state, opt_state=opt_state
    )
