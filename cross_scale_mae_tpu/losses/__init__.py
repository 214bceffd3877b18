"""Loss functions: masked reconstruction family, NT-Xent, perceptual."""

from cross_scale_mae_tpu.losses.recon import (
    RECON_LOSSES,
    process_target,
    recon_loss,
)
from cross_scale_mae_tpu.losses.ntxent import ntxent_loss

__all__ = ["RECON_LOSSES", "process_target", "recon_loss", "ntxent_loss"]
