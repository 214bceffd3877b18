"""PyTorch-checkpoint exporter: our param pytrees -> reference ``.pth``.

The exact inverse of ``utils/torch_import.py``, closing the migration loop:
a user can pretrain on TPU with this framework and hand the resulting
checkpoint straight back to the reference stack — ``main_finetune.py`` /
``main_linprobe.py`` key-remap it like any of their own pretrain
checkpoints, and ``util/viz.py:prepare_model`` can rebuild the model from
the stored ``args`` (``util/viz.py:74-84``).

Format notes (all verified against the reference sources):

* schema = ``{"model": state_dict, "args": argparse.Namespace, "epoch": N}``
  — the subset of ``util/misc.py:358-379``'s payload every reference load
  path actually reads (optimizer/scaler state are torch-optimizer-specific
  and meaningless across frameworks; loads use ``ckpt["model"]`` and
  ``vars(ckpt["args"])`` only).
* timm-layout module names from ``MAE_ViT_Baseline.__init__`` with
  ``use_xformers=False``: ``encoder.N.*`` / ``decoder.N.*`` blocks,
  ``patch_embed.proj`` conv (OIHW), fused ``attn.qkv``
  (``MAE_ViT_Baseline.py:75-199``).
* the fixed sin-cos tables are persistent ``nn.Parameter``s in the
  reference (``encoder_pos_embed`` / ``decoder_pos_embed``,
  ``MAE_ViT_Baseline.py:81-90``), so they appear in its ``state_dict`` and
  must be present for a strict load — they are recomputed here from the
  same formula (``ops/pos_embed.py`` == ``util/pos_embed.py:16-63``).
* the predictor MLP (``models_mae/MLP.py``) is ``nn.Sequential`` ->
  ``predictor.{0,1,3}.*`` keys; its BatchNorm1d carries
  ``running_mean/running_var/num_batches_tracked`` state, exported from our
  model_state when provided.
* ``args.patch_size`` is written as ``str`` — the reference parser declares
  it ``type=str`` (``main_pretrain.py:78-86``) and the model coerces with
  ``int()`` (``MAE_ViT_Baseline.py:53``).
"""

from __future__ import annotations

import argparse
from typing import Any, Mapping, Optional

import numpy as np

from cross_scale_mae_tpu.configs import _VARIANTS, VIT_SIZES, MAEConfig
from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

Params = Mapping[str, Any]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear_out(sd: dict, prefix: str, p: Params) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T  # (in,out) -> torch (out,in)
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _norm_out(sd: dict, prefix: str, p: Params) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _blocks_out(sd: dict, prefix: str, stacked: Params, n_layers: int) -> None:
    """Unstack the scanned (L, ...) block pytree into per-layer timm keys."""
    for i in range(n_layers):
        b = {k: _index_tree(v, i) for k, v in stacked.items()}
        _norm_out(sd, f"{prefix}.{i}.norm1", b["norm1"])
        _linear_out(sd, f"{prefix}.{i}.attn.qkv", b["attn"]["qkv"])
        _linear_out(sd, f"{prefix}.{i}.attn.proj", b["attn"]["proj"])
        _norm_out(sd, f"{prefix}.{i}.norm2", b["norm2"])
        _linear_out(sd, f"{prefix}.{i}.mlp.fc1", b["mlp"]["fc1"])
        _linear_out(sd, f"{prefix}.{i}.mlp.fc2", b["mlp"]["fc2"])


def _index_tree(t, i):
    if isinstance(t, Mapping):
        return {k: _index_tree(v, i) for k, v in t.items()}
    return np.asarray(t)[i]


def reference_model_name(cfg: MAEConfig) -> Optional[str]:
    """The ``models_mae`` factory name this config corresponds to
    (``models_mae/__init__.py:71-124``), or None for off-registry shapes."""
    size_name = next(
        (
            name
            for name, s in VIT_SIZES.items()
            if (s.dim_model, s.encoder_num_layers, s.encoder_num_heads,
                s.decoder_embed_dim, s.decoder_num_layers,
                s.decoder_num_heads)
            == (cfg.dim_model, cfg.encoder_num_layers, cfg.encoder_num_heads,
                cfg.decoder_embed_dim, cfg.decoder_num_layers,
                cfg.decoder_num_heads)
        ),
        None,
    )
    if size_name is None:
        return None
    flags = dict(multi_scale=cfg.multi_scale, use_le=cfg.use_le,
                 use_ce_pred=cfg.use_ce_pred, use_cd_pred=cfg.use_cd_pred,
                 use_ce_ntxent=cfg.use_ce_ntxent)
    for variant, vflags in _VARIANTS.items():
        if {k: vflags.get(k, False) for k in flags} == flags:
            suffix = f"_{variant}" if variant else ""
            return f"mae_vit_{size_name}{suffix}"
    return None


def mae_state_dict(
    params: Params, cfg: MAEConfig, model_state: Optional[Params] = None
) -> dict[str, np.ndarray]:
    """Our MAE params pytree -> reference timm-layout state_dict (numpy)."""
    sd: dict[str, np.ndarray] = {}
    p, c, d = cfg.patch_size, cfg.input_channels, cfg.dim_model
    dd, g = cfg.decoder_embed_dim, cfg.grid_size

    # (p*p*c, d) matmul kernel -> conv OIHW; inverse of _patch_embed.
    k = _np(params["patch_embed"]["kernel"])
    sd["patch_embed.proj.weight"] = np.ascontiguousarray(
        k.reshape(p, p, c, d).transpose(3, 2, 0, 1)
    )
    sd["patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    sd["cls_token"] = _np(params["cls_token"])
    sd["mask_token"] = _np(params["mask_token"])
    # Fixed sin-cos tables are persistent Parameters in the reference
    # (MAE_ViT_Baseline.py:81-90) — required for a strict load.
    sd["encoder_pos_embed"] = _np(
        get_2d_sincos_pos_embed(d, g, cls_token=True))[None]
    sd["decoder_pos_embed"] = _np(
        get_2d_sincos_pos_embed(dd, g, cls_token=True))[None]

    _blocks_out(sd, "encoder", params["encoder_blocks"],
                cfg.encoder_num_layers)
    _norm_out(sd, "encoder_norm", params["encoder_norm"])
    _linear_out(sd, "decoder_embed", params["decoder_embed"])
    _blocks_out(sd, "decoder", params["decoder_blocks"],
                cfg.decoder_num_layers)
    _norm_out(sd, "decoder_norm", params["decoder_norm"])
    _linear_out(sd, "decoder_pred", params["decoder_pred"])

    # Predictor MLP -> nn.Sequential keys (models_mae/MLP.py). The reference
    # has at most ONE predictor per variant; ours mirrors that (importer
    # precedence: cd over ce, torch_import.py:144-153). NOTE the MsLdCe
    # variant's predictor is exported at our (correct) len_keep BN width —
    # the reference constructs BN at num_patches and crashes on forward
    # (its own latent bug, models/mae.py:39-42), so that shape cannot
    # strict-load there; MsLdCd/MsLdCeCd widths match exactly.
    key = ("predictor_cd" if cfg.use_cd_pred
           else "predictor_ce" if cfg.use_ce_pred else None)
    if key is not None and key in params:
        pred = params[key]
        _linear_out(sd, "predictor.0", pred["fc1"])
        sd["predictor.1.weight"] = _np(pred["bn"]["scale"])
        sd["predictor.1.bias"] = _np(pred["bn"]["bias"])
        bn_state = (model_state or {}).get(key, {}).get("bn")
        n_tok = pred["bn"]["scale"].shape[0]
        sd["predictor.1.running_mean"] = (
            _np(bn_state["mean"]) if bn_state else np.zeros(n_tok, np.float32))
        sd["predictor.1.running_var"] = (
            _np(bn_state["var"]) if bn_state else np.ones(n_tok, np.float32))
        sd["predictor.1.num_batches_tracked"] = np.asarray(0, np.int64)
        _linear_out(sd, "predictor.3", pred["fc2"])
    return sd


def classifier_state_dict(
    params: Params, cfg, model_state: Optional[Params] = None
) -> dict[str, np.ndarray]:
    """Our ViT-classifier params -> timm-layout state_dict (models_vit.py
    naming: ``blocks.N.*``, trainable ``pos_embed``, ``head``, and
    ``fc_norm`` (global-pool) or ``norm``). A linprobe head (frozen-affine
    BatchNorm + Linear, main_linprobe.py:517-520) exports as the reference's
    ``head.0`` (BN stats from model_state) / ``head.1`` Sequential keys."""
    sd: dict[str, np.ndarray] = {}
    p, c, d = cfg.patch_size, cfg.input_channels, cfg.embed_dim
    k = _np(params["patch_embed"]["kernel"])
    sd["patch_embed.proj.weight"] = np.ascontiguousarray(
        k.reshape(p, p, c, d).transpose(3, 2, 0, 1)
    )
    sd["patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    sd["cls_token"] = _np(params["cls_token"])
    sd["pos_embed"] = _np(params["pos_embed"])
    _blocks_out(sd, "blocks", params["blocks"], cfg.depth)
    for name in ("norm", "fc_norm"):
        if name in params:
            _norm_out(sd, name, params[name])
    if cfg.use_bn_head:
        bn = (model_state or {}).get("head_bn")
        if bn is None:
            # Exporting plain `head.*` keys here would strict-load-fail (or
            # worse, non-strict-load with init BN stats) in the reference —
            # refuse rather than silently degrade the layout.
            raise ValueError(
                "cfg.use_bn_head=True but model_state has no 'head_bn': the "
                "BN running stats are part of the reference's head.0 "
                "Sequential layout; pass the run's model_state"
            )
        sd["head.0.running_mean"] = _np(bn["mean"])
        sd["head.0.running_var"] = _np(bn["var"])
        sd["head.0.num_batches_tracked"] = np.asarray(0, np.int64)
        _linear_out(sd, "head.1", params["head"])
    else:
        _linear_out(sd, "head", params["head"])
    return sd


def reference_args(cfg: MAEConfig, model_name: Optional[str] = None) -> dict:
    """The ``args`` payload ``viz.prepare_model`` rebuilds from
    (``util/viz.py:74-79``: ``getattr(models_mae, args['model'])(**args)``).
    Size fields are NOT included — the factory supplies them and a duplicate
    keyword would raise (``models_mae/__init__.py:71-124``)."""
    name = model_name or reference_model_name(cfg)
    if name is None:
        raise ValueError(
            "config does not correspond to a reference registry model "
            "(custom size or loss-term combination); pass model_name= with "
            "a reference factory name to force one"
        )
    args = {
        "model": name,
        "input_size": cfg.input_size,
        "input_channels": cfg.input_channels,
        # Reference parser quirk: --patch_size is type=str
        # (main_pretrain.py:78-86), coerced at MAE_ViT_Baseline.py:53.
        "patch_size": str(cfg.patch_size),
        "mask_ratio": cfg.mask_ratio,
        "loss": cfg.loss,
        "norm_pix_loss": cfg.norm_pix_loss,
        "use_xformers": False,
    }
    if cfg.multi_scale:
        args["ms_range"] = tuple(cfg.ms_range)
        args["ms_decoder_loss_reduction"] = cfg.ms_decoder_loss_reduction
    if cfg.use_cd_pred or cfg.use_ce_pred:
        args["predictor_hidden_size"] = cfg.predictor_hidden_size
    return args


def classifier_reference_name(cfg) -> Optional[str]:
    """The ``models_vit`` factory name (models_vit.py:63-99) matching this
    classifier config's stack, or None for custom sizes."""
    from cross_scale_mae_tpu.configs import _VIT_SIZES

    for name, kw in _VIT_SIZES.items():
        if (kw["embed_dim"], kw["depth"], kw["num_heads"]) == (
                cfg.embed_dim, cfg.depth, cfg.num_heads):
            return name
    return None


def classifier_args(cfg, model_name: Optional[str] = None) -> dict:
    """``args`` payload for a classifier checkpoint (what main_finetune /
    main_linprobe would have stored for their own --resume path)."""
    name = model_name or classifier_reference_name(cfg)
    if name is None:
        raise ValueError(
            "classifier config does not match a models_vit factory "
            "(custom size); pass model_name= to force one"
        )
    return {
        "model": name,
        "input_size": cfg.input_size,
        "nb_classes": cfg.num_classes,
        "global_pool": cfg.global_pool,
        "drop_path": cfg.drop_path_rate,
    }


def save_torch_checkpoint(
    path: str,
    state_dict: Mapping[str, np.ndarray],
    args: Optional[dict] = None,
    epoch: int = 0,
) -> None:
    """Write the reference-schema ``.pth`` (util/misc.py:358-379 subset)."""
    import torch

    payload = {
        # copy=True: jax array views are read-only; torch.from_numpy on a
        # non-writable array is undefined behavior.
        "model": {k: torch.from_numpy(np.array(v, copy=True))
                  for k, v in state_dict.items()},
        "epoch": int(epoch),
    }
    if args is not None:
        payload["args"] = argparse.Namespace(**args)
    torch.save(payload, path)
