"""Model family: Cross-Scale MAE (all variants) + downstream ViT classifier."""

from cross_scale_mae_tpu.models.mae import (
    MAEOutput,
    mae_apply,
    mae_encode,
    mae_forward_encoder,
    mae_init,
    mae_loss_fn,
)
from cross_scale_mae_tpu.models.vit import vit_apply, vit_init

__all__ = [
    "MAEOutput",
    "mae_apply",
    "mae_forward_encoder",
    "mae_init",
    "mae_loss_fn",
    "vit_apply",
    "vit_init",
]
