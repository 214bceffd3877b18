"""Typed model/train configs and the string-name registry.

Replaces the reference's argparse-namespace splatting (``main_pretrain.py:398``
``models_mae.__dict__[args.model](**vars(args))``) and the size presets at
``models_mae/__init__.py:23-67`` with frozen dataclasses. The string-name CLI
surface (``mae_vit_base_MsLdCeCd`` etc.) is preserved via :func:`get_mae_config`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Mapping

# GELU flavors (implemented in models/layers.py: mlp / gelu_exact_fastbwd).
# 'tanh' = TPU-fast approximation; 'exact' = torch nn.GELU parity;
# 'exact_tanhbwd' = bit-exact forward + tanh-derivative backward.
GELU_MODES = ("tanh", "exact", "exact_tanhbwd")


@dataclass(frozen=True)
class ViTSize:
    """Encoder/decoder stack dimensions (reference: models_mae/__init__.py:23-67)."""

    dim_model: int
    encoder_num_layers: int
    encoder_num_heads: int
    decoder_embed_dim: int
    decoder_num_layers: int
    decoder_num_heads: int


# Size presets mirror models_mae/__init__.py:23-67 (note: the reference's
# "tiny"/"small" are nonstandard on purpose; kept for config parity).
VIT_SIZES: Mapping[str, ViTSize] = {
    "tiny": ViTSize(128, 4, 8, 256, 4, 8),
    "small": ViTSize(512, 8, 8, 512, 8, 16),
    "base": ViTSize(768, 12, 12, 512, 8, 16),
    "large": ViTSize(1024, 24, 16, 512, 8, 16),
    "huge": ViTSize(1280, 32, 16, 512, 8, 16),
}


@dataclass(frozen=True)
class MAEConfig:
    """Full Cross-Scale-MAE model configuration.

    A single config describes every reference variant: the ``MAE_ViT_Baseline``
    class plus its Ms* subclasses (``models_mae/MAE_ViT_*.py``) become one
    model whose behavior is selected by the ``use_*`` loss-term flags.
    """

    # Input (reference: MAE_ViT_Baseline.py:19-23)
    input_size: int = 128
    input_channels: int = 3
    patch_size: int = 16
    mask_ratio: float = 0.75

    # Encoder / decoder stacks (MAE_ViT_Baseline.py:24-31)
    dim_model: int = 768
    encoder_num_layers: int = 12
    encoder_num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_num_layers: int = 8
    decoder_num_heads: int = 16
    ffn_ratio: int = 4

    # Reconstruction loss (MAE_ViT_Shared.py:9-21): one of
    # mse|l2|mae|l1|bce|ssim|ms_ssim|mse_ssim|mse_ms_ssim
    loss: str = "mse"
    norm_pix_loss: bool = False

    # Reference quirk (MAE_ViT_Baseline.py:264): encoder_norm output is
    # discarded. Keep False to match released checkpoints; True applies it.
    apply_encoder_norm: bool = False

    # Multi-scale (Ms) view (MAE_ViT_MsLd.py:14-35)
    multi_scale: bool = False
    ms_range: tuple[float, float] = (0.25, 0.75)
    ms_aspect_ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    ms_decoder_loss_reduction: str = "sum"  # "sum" | "mean"
    # The reference applies ONE torchvision crop to the whole batch
    # (nn.Sequential(T.RandomResizedCrop), MAE_ViT_MsLd.py:29-35 — batched
    # call shares get_params). True = stronger per-sample boxes (default);
    # False = reference batch-shared behavior.
    ms_per_sample_crop: bool = True

    # Loss terms composed on top of the dual-view reconstruction:
    use_le: bool = False        # latent distance loss (MAE_ViT_MsLdLe.py:44)
    use_ce_pred: bool = False   # cross-encoder MLP predictor (MAE_ViT_MsLdCe.py:46-48)
    use_cd_pred: bool = False   # cross-decoder MLP predictor (MAE_ViT_MsLdCd.py:49-51)
    use_ce_ntxent: bool = False  # NT-Xent contrastive (MAE_ViT_MsLdCeCd.py:62-69)
    loss_e: str | None = None   # default: same as `loss`
    loss_ce: str | None = None
    loss_cd: str | None = None
    ntxent_tau: float = 0.5     # MAE_ViT_MsLdCeCd.py:62
    ntxent_cos_sim: bool = True
    predictor_hidden_size: int = 2048  # MLP.py / MAE_ViT_MsLdCd.py:22-24

    # Optional VGG-style perceptual loss (util/vggloss.py — vestigial in the
    # reference but listed in BASELINE.json's north star).
    use_perceptual: bool = False
    perceptual_weight: float = 1.0

    # Block norm placement: "pre" = timm Block (use_xformers=False path);
    # "post" mirrors xFormers residual_norm_style="post" (MAE_ViT_Baseline.py:33).
    residual_norm_style: str = "pre"

    # Compute policy (TPU-specific; no reference equivalent).
    compute_dtype: str = "bfloat16"   # activations
    param_dtype: str = "float32"
    attention_impl: str = "xla"       # xla | pallas | pallas_v3 | linformer
                                      # | orthoformer | nystrom | local
                                      # | fourier_mix
    remat: bool = False               # jax.checkpoint each block
    # GELU flavor: "tanh" (TPU-fast, bf16) or "exact" (torch nn.GELU /
    # timm-Block parity — fp32 erfc, ~15% of the flagship step; see
    # layers.mlp). Golden torch-parity tests force "exact".
    gelu: str = "tanh"
    # Flat (N*L, D) scan carry: avoids sublane padding of the tiny
    # sequence dim (see layers.run_blocks_flat).
    flat_blocks: bool = False
    # Megatron-style sequence parallelism: residual stream (LN/adds) stays
    # sharded over the 'model' mesh axis between blocks; only meaningful
    # with tensor parallelism (model axis > 1) under the GSPMD step. The
    # step must be traced in a mesh context (pass mesh= to the builder).
    # See layers.sp_constrain.
    sequence_parallel: bool = False
    # False = unrolled layer loop (no scan residual-stacking copies —
    # measurably faster in training; slower to compile). See layers.run_blocks.
    scan_blocks: bool = True

    @property
    def grid_size(self) -> int:
        assert self.input_size % self.patch_size == 0
        return self.input_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def len_keep(self) -> int:
        # Static token-keep count (MAE_ViT_Shared.py:63-64) — keeps shapes
        # static under jit.
        return int(self.num_patches * (1 - self.mask_ratio))

    @property
    def patch_dim(self) -> int:
        return self.patch_size ** 2 * self.input_channels

    def loss_name(self, term: str) -> str:
        value = {"e": self.loss_e, "ce": self.loss_ce, "cd": self.loss_cd}[term]
        return (value or self.loss).lower()

    def replace(self, **kw: Any) -> "MAEConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "MAEConfig":
        d = json.loads(s)
        for k in ("ms_range", "ms_aspect_ratio"):
            if k in d and d[k] is not None:
                d[k] = tuple(d[k])
        # Checkpoint-compat: configs written before the gelu field existed
        # were trained with torch-exact GELU (the then-hardcoded behavior);
        # rehydrating them as the new 'tanh' default would silently change
        # the activation under a resumed/evaluated checkpoint.
        d.setdefault("gelu", "exact")
        if d["gelu"] not in GELU_MODES:
            raise ValueError(f"unknown gelu flavor {d['gelu']!r}")
        # Execution-layout detail, not model semantics (numerics are
        # identical with/without): rehydration consumers (viz, serving,
        # finetune weight transfer) run without a mesh context, where a
        # stale True would crash at trace. Training re-enables it from its
        # own --sequence_parallel flag.
        d["sequence_parallel"] = False
        return cls(**d)


# Variant flag sets, mirroring the factory functions at
# models_mae/__init__.py:71-124.
_VARIANTS: Mapping[str, Mapping[str, Any]] = {
    "": {},
    "MsLd": dict(multi_scale=True),
    "MsLdLe": dict(multi_scale=True, use_le=True),
    "MsLdCe": dict(multi_scale=True, use_ce_pred=True),
    "MsLdCd": dict(multi_scale=True, use_cd_pred=True),
    "MsLdCeCd": dict(multi_scale=True, use_cd_pred=True, use_ce_ntxent=True),
    "MsLdLeCd": dict(multi_scale=True, use_le=True, use_cd_pred=True),
}


def mae_model_names() -> list[str]:
    names = []
    for size in VIT_SIZES:
        for variant in _VARIANTS:
            suffix = f"_{variant}" if variant else ""
            names.append(f"mae_vit_{size}{suffix}")
    return names


def get_mae_config(name: str, **overrides: Any) -> MAEConfig:
    """Resolve a reference-style model name (e.g. ``mae_vit_base_MsLdCeCd``)."""
    if not name.startswith("mae_vit_"):
        raise ValueError(f"unknown model name: {name!r}")
    rest = name[len("mae_vit_"):]
    parts = rest.split("_", 1)
    size_name = parts[0]
    variant = parts[1] if len(parts) > 1 else ""
    if size_name not in VIT_SIZES:
        raise ValueError(f"unknown ViT size {size_name!r} in {name!r}")
    if variant not in _VARIANTS:
        raise ValueError(f"unknown variant {variant!r} in {name!r}")
    size = VIT_SIZES[size_name]
    kw: dict[str, Any] = dict(
        dim_model=size.dim_model,
        encoder_num_layers=size.encoder_num_layers,
        encoder_num_heads=size.encoder_num_heads,
        decoder_embed_dim=size.decoder_embed_dim,
        decoder_num_layers=size.decoder_num_layers,
        decoder_num_heads=size.decoder_num_heads,
    )
    kw.update(_VARIANTS[variant])
    kw.update(overrides)
    return MAEConfig(**kw)


@dataclass(frozen=True)
class ViTClassifierConfig:
    """Downstream classifier (reference: models_vit.py:17-99)."""

    input_size: int = 224
    input_channels: int = 3
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    num_classes: int = 1000
    global_pool: bool = False
    drop_path_rate: float = 0.0
    # linprobe: frozen-affine BatchNorm before the head (main_linprobe.py:517-520)
    use_bn_head: bool = False
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    attention_impl: str = "xla"
    remat: bool = False
    gelu: str = "tanh"        # "tanh" | "exact" (see MAEConfig.gelu)
    scan_blocks: bool = True  # False = unrolled layer loop (see layers.run_blocks)
    sequence_parallel: bool = False  # see MAEConfig.sequence_parallel

    @property
    def grid_size(self) -> int:
        assert self.input_size % self.patch_size == 0
        return self.input_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    def replace(self, **kw: Any) -> "ViTClassifierConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "ViTClassifierConfig":
        d = json.loads(s)
        d.setdefault("gelu", "exact")  # see MAEConfig.from_json
        if d["gelu"] not in GELU_MODES:
            raise ValueError(f"unknown gelu flavor {d['gelu']!r}")
        d["sequence_parallel"] = False  # see MAEConfig.from_json
        return cls(**d)


_VIT_SIZES = {
    # models_vit.py:63-99
    "vit_base_patch16": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16),
    "vit_large_patch16": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16),
    "vit_huge_patch14": dict(embed_dim=1280, depth=32, num_heads=16, patch_size=14),
}


def get_vit_config(name: str, **overrides: Any) -> ViTClassifierConfig:
    if name not in _VIT_SIZES:
        raise ValueError(f"unknown classifier {name!r}; have {sorted(_VIT_SIZES)}")
    kw = dict(_VIT_SIZES[name])
    kw.update(overrides)
    return ViTClassifierConfig(**kw)


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule/runtime knobs shared by the three entry points."""

    epochs: int = 400
    warmup_epochs: int = 40
    batch_size: int = 512            # per-process global batch (reference: per GPU)
    accum_iter: int = 1
    blr: float = 5e-5                # lr = blr * eff_batch / 256 (main_pretrain.py:411)
    lr: float | None = None
    min_lr: float = 0.0
    weight_decay: float = 0.05
    adam_b1: float = 0.9
    adam_b2: float = 0.95            # main_pretrain.py:427
    clip_grad: float | None = None
    layer_decay: float | None = None  # finetune: 0.75 (main_finetune.py:176)
    optimizer: str = "adamw"          # "adamw" | "lars" | "sgd"
    lars_momentum: float = 0.9
    lars_trust_coefficient: float = 0.001
    label_smoothing: float = 0.1
    mixup: float = 0.0
    cutmix: float = 0.0
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    mixup_mode: str = "batch"        # "batch" | "pair" | "elem" (main_finetune.py:264)
    cutmix_minmax: "tuple[float, float] | None" = None  # overrides cutmix alpha (main_finetune.py:240)
    seed: int = 0
    log_interval: int = 20
    ckpt_interval_epochs: int = 25   # main_pretrain.py:579
    mask_seed: int | None = None
    consistent_mask: bool = False
    # wandb.watch equivalent (main_pretrain.py:537): per-subtree gradient
    # norms computed IN-GRAPH (full histograms would force a host fetch of
    # every gradient tensor each step — a pipeline stall on TPU; the
    # per-layer norm carries the same vanishing/exploding signal).
    watch_gradients: bool = False

    def resolved_lr(self, world_batch: int) -> float:
        if self.lr is not None:
            return self.lr
        return self.blr * world_batch / 256.0

    def replace(self, **kw: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        return cls(**json.loads(s))
