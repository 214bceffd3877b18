"""Multi-host bootstrap.

Replaces ``util/misc.py:255-296`` (env-var / OMPI / SLURM NCCL bootstrap +
barrier) with single-controller JAX: each host calls
``jax.distributed.initialize`` once; afterwards ``jax.devices()`` spans the
whole slice and one Mesh covers it. Per-host data sharding replaces
``DistributedSampler`` (main_pretrain.py:380): each host loads
``1/process_count`` of the index (see data/loader.py).
"""

from __future__ import annotations

import os

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize multi-host JAX if requested via args or env.

    Single-host runs are a no-op (the common case on one v4-8 board, like
    the reference's single-node torchrun). Returns a summary dict.
    """
    import jax

    global _initialized
    want_dist = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if want_dist and not _initialized:
        # Cross-process collectives on the CPU backend need gloo (the
        # multi-host simulation used by tests; TPU uses ICI/DCN). Read the
        # configured platform WITHOUT touching jax.devices()/default_backend —
        # distributed.initialize must run before any backend initializes.
        platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        # Empty/unset platform means JAX will auto-resolve — which lands on
        # CPU when no accelerator is attached, the exact case that hangs in
        # the first psum without gloo. Enable gloo unless a non-CPU platform
        # is explicitly configured (on TPU/GPU platforms the setting is
        # simply unused).
        explicit_non_cpu = bool(platforms) and "cpu" not in str(platforms)
        if not explicit_non_cpu:
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception as e:
                import warnings

                warnings.warn(
                    f"could not enable gloo CPU collectives ({e}); "
                    f"multi-process CPU runs may hang in the first psum"
                )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True  # idempotent: a second CLI run in-process
        # (e.g. train then resume) must not re-initialize
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )


def is_main_process() -> bool:
    """Rank-0 check (util/misc.py:246-247) for logging/checkpoint writes."""
    import jax

    return jax.process_index() == 0
