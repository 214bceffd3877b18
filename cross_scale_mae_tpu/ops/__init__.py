"""Pure numeric building blocks (patchify, pos-embed, masking, image ops, SSIM)."""

from cross_scale_mae_tpu.ops.patchify import patchify, unpatchify
from cross_scale_mae_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
    interpolate_pos_embed,
)
from cross_scale_mae_tpu.ops.masking import random_masking, restore_tokens

__all__ = [
    "patchify",
    "unpatchify",
    "get_2d_sincos_pos_embed",
    "get_1d_sincos_pos_embed_from_grid",
    "interpolate_pos_embed",
    "random_masking",
    "restore_tokens",
]
