"""Qualitative evaluation / visualization harness."""

from cross_scale_mae_tpu.viz.temporal import temporal_consistency_by_gap
from cross_scale_mae_tpu.viz.recon import (
    add_noise,
    plot_reconstruction,
    prepare_image,
    prepare_model,
    run_eval,
    run_one_image,
)

__all__ = [
    "add_noise",
    "plot_reconstruction",
    "prepare_image",
    "prepare_model",
    "run_eval",
    "run_one_image",
    "temporal_consistency_by_gap",
]
