"""Cross-Scale MAE, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``aicip/Cross-Scale-MAE`` (NeurIPS 2023): self-supervised multi-scale masked
autoencoder pretraining for remote-sensing imagery, plus supervised finetune
and linear-probe evaluation of the pretrained encoder.

Design principles (TPU-first, not a port):

* **One XLA program per step.** Augmentation (normalize / flips / loop-free
  RandomResizedCrop), patchify, per-sample masking, the two-view forward,
  every loss term, the backward pass and the optimizer all compile into a
  single ``jit`` step. The reference pays three host syncs per step
  (``engine_pretrain.py:55,72,79``); here metrics are fetched asynchronously.
* **Functional core.** Parameters are plain pytrees; models are pure
  ``init`` / ``apply`` functions driven by frozen dataclass configs. The
  reference's seven ``MAE_ViT_Ms*`` subclasses collapse into one model with a
  set of composable loss terms (``models/mae.py``).
* **SPMD via mesh + shardings.** Data parallelism is batch sharding over a
  ``jax.sharding.Mesh`` axis; gradient reduction is inserted by XLA (the
  NCCL-DDP equivalent), with a tensor-parallel ``model`` axis hook.
* **MXU-shaped compute.** bf16 activations, fp32 params/optimizer; patch
  embedding is an explicit reshape+matmul; the two scale views are batched
  into one forward so every matmul is twice as large.
"""

__version__ = "0.1.0"

import os as _os

# Raise the TPU compiler's scoped-VMEM budget from its 16 MB default: the
# Pallas attention backward then fits batch-group 16 (vs 8), worth ~3% on
# the flagship step (112.2 -> 108.7 ms, bit-identical loss; see
# docs/VALIDATION.md). libtpu snapshots LIBTPU_INIT_ARGS at first backend
# initialization, so the mutation only happens while no backend is
# initialized yet. Opt out with CSMAE_NO_VMEM_OVERRIDE=1.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=24576"


def _parse_scoped_vmem_env() -> "int | None":
    """A limit configured through EITHER env channel the compiler honors."""
    import re as _re

    for _var in ("LIBTPU_INIT_ARGS", "XLA_FLAGS"):
        _m = _re.search(
            r"xla_tpu_scoped_vmem_limit_kib=(\d+)",
            _os.environ.get(_var, ""),
        )
        if _m:
            return int(_m.group(1))
    return None


# This single module variable owns the effective limit; kernel batch-group
# sizing (ops/attention._group3_for) reads it via scoped_vmem_limit_kib()
# instead of re-parsing env strings (which misses XLA_FLAGS and the
# too-late-to-raise case).
_SCOPED_VMEM_LIMIT_KIB = 16384  # TPU compiler default

_env_limit = _parse_scoped_vmem_env()
if _env_limit is not None:
    _SCOPED_VMEM_LIMIT_KIB = _env_limit
elif not _os.environ.get("CSMAE_NO_VMEM_OVERRIDE"):
    try:
        from jax._src import xla_bridge as _xb

        _too_late = _xb.backends_are_initialized()
    except Exception:
        _too_late = True  # can't tell -> don't risk a budget mismatch
    if not _too_late:
        _os.environ["LIBTPU_INIT_ARGS"] = (
            _os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
        ).strip()
        _SCOPED_VMEM_LIMIT_KIB = 24576


def scoped_vmem_limit_kib() -> int:
    """The scoped-VMEM limit the TPU compiler actually snapshotted (KiB)."""
    return _SCOPED_VMEM_LIMIT_KIB

from cross_scale_mae_tpu import configs  # noqa: F401
