"""Analytic FLOP accounting for the MAE train step, and MFU.

The reference publishes no FLOP counts; its per-step cost is fully
determined by the config shapes (SURVEY.md §6). This module derives the
useful-FLOP count per image for one optimizer step analytically from an
``MAEConfig`` so bench.py can report MFU (model FLOPs utilization) as a
machine-readable output rather than a docs-prose claim.

Conventions:
* FLOPs = 2 x MACs (one multiply-accumulate = 2 FLOPs).
* Training step = 3 x forward (backward ~= 2x forward for matmul-dominated
  transformer workloads — the standard accounting used by MFU literature).
* Only matmul/attention/conv FLOPs are counted ("useful" FLOPs): LayerNorm,
  GELU, softmax, masking gathers, the optimizer update, and the NT-Xent
  similarity matrix (< 0.1% of the total at the flagship batch) are
  excluded, matching how MFU is conventionally reported.
"""

from __future__ import annotations

# bf16 peak matmul throughput per chip, FLOPs/sec. Sources: public TPU
# datasheets (v4: 275 TFLOPS bf16; v5e "v5 lite": 197; v5p: 459;
# v6e "Trillium": 918). Keys match jax Device.device_kind strings.
DEVICE_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_flops(device_kind: str) -> float | None:
    """Peak bf16 FLOPs/sec for a jax ``device_kind`` string, or None."""
    return DEVICE_PEAK_BF16_FLOPS.get(device_kind)


def _block_flops(n: int, d: int, ffn_ratio: int) -> float:
    """One pre-LN transformer block forward on ``n`` tokens of width ``d``.

    qkv projection (d->3d) + two attention matmuls (QK^T, AV) + output
    projection + 2-layer MLP (d -> r*d -> d).
    """
    qkv = 2 * n * d * 3 * d
    attn = 2 * 2 * n * n * d
    proj = 2 * n * d * d
    mlp = 2 * 2 * n * d * ffn_ratio * d
    return float(qkv + attn + proj + mlp)


def mae_forward_flops_per_image(cfg) -> float:
    """Forward-pass FLOPs per image for one MAE forward (all views).

    Mirrors the model structure in models/mae.py: patch-embed conv, masked
    encoder (timm-Block stack on kept tokens + cls), decoder embed, decoder
    stack on the full token grid, pixel head; doubled for the dual-scale
    (Ms*) view and extended with the Ce/Cd predictor MLPs when enabled.
    Reference shapes: MAE_ViT_Baseline.py:75-191, MLP.py:4-10.
    """
    grid = cfg.input_size // cfg.patch_size
    n_patch = grid * grid
    n_keep = int(round(n_patch * (1.0 - cfg.mask_ratio)))
    n_enc = n_keep + 1  # + cls token
    n_dec = n_patch + 1
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.input_channels

    patch_embed = 2 * n_patch * patch_dim * cfg.dim_model
    encoder = cfg.encoder_num_layers * _block_flops(
        n_enc, cfg.dim_model, cfg.ffn_ratio
    )
    dec_embed = 2 * n_enc * cfg.dim_model * cfg.decoder_embed_dim
    decoder = cfg.decoder_num_layers * _block_flops(
        n_dec, cfg.decoder_embed_dim, cfg.ffn_ratio
    )
    pixel_head = 2 * n_dec * cfg.decoder_embed_dim * patch_dim

    per_view = patch_embed + encoder + dec_embed + decoder + pixel_head
    views = 2 if getattr(cfg, "multi_scale", False) else 1
    total = views * per_view

    # Cross-predictor MLPs run once (crop view -> orig view), on patch
    # tokens only (cls dropped): Linear(d->h) + Linear(h->d).
    hidden = getattr(cfg, "predictor_hidden_size", 2048)
    if getattr(cfg, "use_cd_pred", False):
        total += 2 * 2 * n_patch * cfg.decoder_embed_dim * hidden
    if getattr(cfg, "use_ce_pred", False):
        total += 2 * 2 * n_keep * cfg.dim_model * hidden
    return float(total)


def mae_train_flops_per_image(cfg) -> float:
    """Per-image useful FLOPs for one full optimizer step (fwd + bwd)."""
    return 3.0 * mae_forward_flops_per_image(cfg)


def mfu(imgs_per_sec_per_chip: float, flops_per_image: float,
        device_kind: str) -> float | None:
    """Model FLOPs utilization against the chip's bf16 peak, or None."""
    peak = device_peak_flops(device_kind)
    if peak is None:
        return None
    return imgs_per_sec_per_chip * flops_per_image / peak
