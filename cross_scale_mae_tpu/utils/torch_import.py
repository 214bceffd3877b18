"""PyTorch-checkpoint importer: reference ``.pth`` -> our param pytrees.

The reference ships released ViT-B/L MAE checkpoints (``README.md:27-43``).
This module imports them (and any reference-format checkpoint) for parity
validation and downstream transfer, handling:

* timm-layout MAE checkpoints (``encoder.N.*`` / ``decoder.N.*`` blocks,
  conv patch-embed) and xFormers-layout ones (``encoder.encoders.N.wrap_*``,
  separate q/k/v projections) — the same remaps as
  ``main_finetune.py:556-586``, done **correctly**: the reference then loads
  the *wrong dict* (``main_finetune.py:591``) so its pretrained weights are
  silently dropped; that defect is fixed here, not replicated (SURVEY.md §7).
* conv(OIHW) -> matmul(in,out) patch-embed conversion and torch
  Linear(out,in) -> (in,out) transposition,
* per-layer stacking for the scanned block representation,
* bicubic pos-embed interpolation on resolution mismatch
  (``util/pos_embed.py:92-125``) for the classifier's trainable table.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from cross_scale_mae_tpu.configs import MAEConfig, ViTClassifierConfig
from cross_scale_mae_tpu.ops.pos_embed import interpolate_pos_embed

Params = dict[str, Any]

_XFORMER_MAPPINGS = {
    # main_finetune.py:556-566 — xFormers block internals -> timm names.
    ".wrap_att.norm.": ".norm1.",
    ".wrap_att.sublayer.layer.in_proj_container.q_proj.": ".attn.q_proj.",
    ".wrap_att.sublayer.layer.in_proj_container.k_proj.": ".attn.k_proj.",
    ".wrap_att.sublayer.layer.in_proj_container.v_proj.": ".attn.v_proj.",
    ".wrap_att.sublayer.layer.proj.": ".attn.proj.",
    ".wrap_ff.norm.": ".norm2.",
    ".wrap_ff.sublayer.layer.mlp.0.": ".mlp.fc1.",
    ".wrap_ff.sublayer.layer.mlp.3.": ".mlp.fc2.",
}


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a .pth checkpoint to numpy (handles the {'model': ...} wrapper
    written by util/misc.py:358-379)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def normalize_torch_keys(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Canonicalize xFormers naming to timm naming; fuse split q/k/v."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        name = k
        if ".wrap_att." in name or ".wrap_ff." in name:
            for src, dst in _XFORMER_MAPPINGS.items():
                if src in name:
                    name = name.replace(src, dst)
            name = name.replace("encoder.encoders", "encoder")
            name = name.replace("decoder.encoders", "decoder")
        out[name] = v
    # Fuse q/k/v projections into timm's fused qkv.
    fused: dict[str, np.ndarray] = {}
    for name in list(out):
        m = re.match(r"(.*\.attn)\.q_proj\.(weight|bias)$", name)
        if m:
            base, kind = m.groups()
            q = out.pop(f"{base}.q_proj.{kind}")
            kk = out.pop(f"{base}.k_proj.{kind}")
            vv = out.pop(f"{base}.v_proj.{kind}")
            fused[f"{base}.qkv.{kind}"] = np.concatenate([q, kk, vv], axis=0)
    out.update(fused)
    return out


def _linear(sd, prefix) -> Params:
    return {
        "kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _norm(sd, prefix) -> Params:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _patch_embed(sd, prefix="patch_embed.proj") -> Params:
    w = sd[f"{prefix}.weight"]  # (D, C, p, p) conv OIHW
    d, c, p, _ = w.shape
    # Our patch features are (ph, pw, c)-ordered (ops/patchify.py).
    kernel = w.transpose(2, 3, 1, 0).reshape(p * p * c, d)
    return {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _stack_blocks(sd, prefix: str, n_layers: int) -> Params:
    blocks = []
    for i in range(n_layers):
        b = f"{prefix}.{i}"
        blocks.append({
            "norm1": _norm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "norm2": _norm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        })
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)


def import_mae_checkpoint(path: str, cfg: MAEConfig) -> Params:
    """Reference MAE .pth -> mae params pytree (MAE_ViT_Baseline layout)."""
    sd = normalize_torch_keys(load_torch_state_dict(path))
    params: Params = {
        "patch_embed": _patch_embed(sd),
        "cls_token": jnp.asarray(sd["cls_token"]),
        "mask_token": jnp.asarray(sd["mask_token"]),
        "encoder_blocks": _stack_blocks(sd, "encoder", cfg.encoder_num_layers),
        "encoder_norm": _norm(sd, "encoder_norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "decoder_blocks": _stack_blocks(sd, "decoder", cfg.decoder_num_layers),
        "decoder_norm": _norm(sd, "decoder_norm"),
        "decoder_pred": _linear(sd, "decoder_pred"),
    }
    # Optional predictor MLP (MsLdCd/MsLdCeCd variants; models_mae/MLP.py).
    if "predictor.0.weight" in sd and (cfg.use_cd_pred or cfg.use_ce_pred):
        key = "predictor_cd" if cfg.use_cd_pred else "predictor_ce"
        params[key] = {
            "fc1": _linear(sd, "predictor.0"),
            "bn": {
                "scale": jnp.asarray(sd["predictor.1.weight"]),
                "bias": jnp.asarray(sd["predictor.1.bias"]),
            },
            "fc2": _linear(sd, "predictor.3"),
        }
    return params


def mae_encoder_to_classifier(
    mae_params: Params, cfg: ViTClassifierConfig
) -> tuple[Params, list[str]]:
    """Initialize classifier params from a pretrained MAE encoder.

    The reference does this by key remap + strict-asserts
    (main_linprobe.py:452-512): everything except head/fc_norm/norm must come
    from the encoder. Returns (partial params, missing top-level keys).
    """
    out: Params = {
        "patch_embed": mae_params["patch_embed"],
        "cls_token": mae_params["cls_token"],
        "blocks": mae_params["encoder_blocks"],
    }
    missing = ["pos_embed", "head"]
    if cfg.global_pool:
        missing.append("fc_norm")  # fresh, like main_linprobe.py:504-512
    else:
        out["norm"] = mae_params["encoder_norm"]
    return out, missing


def import_classifier_checkpoint(path: str, cfg: ViTClassifierConfig) -> Params:
    """timm-layout classifier .pth (models_vit.py) -> vit params pytree."""
    sd = normalize_torch_keys(load_torch_state_dict(path))
    params: Params = {
        "patch_embed": _patch_embed(sd),
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": interpolate_pos_embed(
            jnp.asarray(sd["pos_embed"]), cfg.grid_size
        ),
        "blocks": _stack_blocks(sd, "blocks", cfg.depth),
        "head": _linear(sd, "head"),
    }
    if "fc_norm.weight" in sd:
        params["fc_norm"] = _norm(sd, "fc_norm")
    if "norm.weight" in sd:
        params["norm"] = _norm(sd, "norm")
    return params


def merge_pretrained(template: Params, pretrained: Params, _path: str = "") -> Params:
    """Overlay pretrained subtrees onto a freshly-initialized template
    (= load_state_dict(strict=False) with shape checks). A shape mismatch —
    e.g. loading a ViT-B MAE into a ViT-L classifier — raises an actionable
    error naming the parameter and both shapes (vs. the reference's bare
    assert, main_linprobe.py:504-512)."""
    out = dict(template)
    for k, v in pretrained.items():
        if k not in template:
            continue
        key = f"{_path}/{k}" if _path else str(k)
        if isinstance(v, dict) and isinstance(template[k], dict):
            out[k] = merge_pretrained(template[k], v, key)
        else:
            if template[k].shape != v.shape:
                raise ValueError(
                    f"pretrained checkpoint does not fit this model: "
                    f"param '{key}' has shape {tuple(v.shape)} in the "
                    f"checkpoint but {tuple(template[k].shape)} in the model "
                    f"— check --model/--embed_dim/--depth/--num_heads "
                    f"against the pretrained encoder's size"
                )
            out[k] = v.astype(template[k].dtype)
    return out
