"""Data pipeline: dataset indexes (host), decode workers (native C++ / PIL),
batching + device transfer. Augmentation runs on device (ops/image.py)."""

from cross_scale_mae_tpu.data.datasets import (
    DATASET_STATS,
    build_dataset,
    Dataset,
    FmowRgbDataset,
    FmowTemporalDataset,
    GlobDataset,
    EurosatDataset,
    NaipDataset,
    SyntheticDataset,
)
from cross_scale_mae_tpu.data.loader import DataLoader

__all__ = [
    "DATASET_STATS",
    "build_dataset",
    "Dataset",
    "FmowRgbDataset",
    "FmowTemporalDataset",
    "GlobDataset",
    "EurosatDataset",
    "NaipDataset",
    "SyntheticDataset",
    "DataLoader",
]
