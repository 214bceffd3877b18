"""Cross-Scale MAE: one functional model, variants as composable loss terms.

The reference implements seven subclasses (``models_mae/MAE_ViT_Baseline.py``
+ the ``MAE_ViT_Ms*`` chain). Here a single ``mae_loss_fn`` computes the
whole training objective; :class:`~cross_scale_mae_tpu.configs.MAEConfig`
flags select the terms:

====================  =======================================================
reference class        config
====================  =======================================================
MAE_ViT_Baseline       (defaults)
MAE_ViT_MsLd           multi_scale=True
MAE_ViT_MsLdLe         + use_le
MAE_ViT_MsLdCe         + use_ce_pred
MAE_ViT_MsLdCd         + use_cd_pred
MAE_ViT_MsLdCeCd       + use_cd_pred + use_ce_ntxent
MAE_ViT_MsLdLeCd       + use_le + use_cd_pred
====================  =======================================================

TPU-first choices:

* **Both scale views run as one forward at batch 2N** (the reference runs the
  encoder/decoder twice sequentially, MAE_ViT_MsLd.py:55-61) — every matmul
  doubles in size, which is free MXU utilization at these model widths.
* The low-GSD view is produced **on device** by the matmul-based
  RandomResizedCrop (ops/image.py), fused into the same XLA program.
* Patch embedding is an explicit patchify + matmul (mathematically identical
  to the reference's strided conv, and exactly how it is initialized there:
  MAE_ViT_Baseline.py:224-227 "initialize like nn.Linear").
* Positional tables are trace-time constants, not parameters — the reference
  marks them requires_grad=False (MAE_ViT_Baseline.py:81-90), i.e. they are
  pure functions of the config.

Reference-quirk decisions (SURVEY.md §7 "behavioral quirks"):

* ``encoder_norm`` params exist but are NOT applied by default
  (``apply_encoder_norm=False``) — matching MAE_ViT_Baseline.py:264 where the
  norm result is discarded, so released checkpoints import bit-faithfully.
* The MsLdCe predictor in the reference builds BatchNorm over
  ``num_patches`` channels but receives ``len_keep`` encoder tokens
  (MAE_ViT_MsLdCe.py:21 — a latent crash). We size it to ``len_keep``
  (fix, documented, not replicated).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import MAEConfig
from cross_scale_mae_tpu.losses.ntxent import ntxent_loss
from cross_scale_mae_tpu.losses.recon import process_target, recon_loss
from cross_scale_mae_tpu.models import layers
from cross_scale_mae_tpu.ops.image import crop_resize, sample_crop_boxes
from cross_scale_mae_tpu.ops.masking import random_masking, restore_tokens
from cross_scale_mae_tpu.ops.numerics import at_least_f32
from cross_scale_mae_tpu.ops.patchify import patchify
from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

Params = dict[str, Any]


class MAEOutput(NamedTuple):
    loss: jnp.ndarray
    losses: dict[str, jnp.ndarray]   # per-term scalars (loss_d, loss_e, ...)
    pred: jnp.ndarray                # (N, L, p*p*C) original-view prediction
    mask: jnp.ndarray                # (N, L) 0=visible 1=reconstructed
    enc_emb: Optional[tuple] = None  # (orig, crop) encoder embeddings
    dec_emb: Optional[tuple] = None
    state: Optional[Params] = None   # updated mutable state (BN stats)


# ------------------------------------------------------------------ init


def mae_init(rng: jax.Array, cfg: MAEConfig) -> tuple[Params, Params]:
    """Returns (params, state). state carries predictor BatchNorm statistics."""
    keys = jax.random.split(rng, 8)
    d, dd = cfg.dim_model, cfg.decoder_embed_dim
    params: Params = {
        "patch_embed": layers.linear_init(keys[0], cfg.patch_dim, d),
        "cls_token": 0.02 * jax.random.normal(keys[1], (1, 1, d), jnp.float32),
        "mask_token": 0.02 * jax.random.normal(keys[2], (1, 1, dd), jnp.float32),
        # seq_len = num_patches+1 for BOTH stacks (the reference passes the
        # same seq_len to encoder and decoder, MAE_ViT_Baseline.py:110,143).
        "encoder_blocks": layers.stacked_blocks_init(
            keys[3], cfg.encoder_num_layers, d, cfg.ffn_ratio,
            cfg.attention_impl, cfg.num_patches + 1
        ),
        "encoder_norm": layers.layer_norm_init(d),
        "decoder_embed": layers.linear_init(keys[4], d, dd),
        "decoder_blocks": layers.stacked_blocks_init(
            keys[5], cfg.decoder_num_layers, dd, cfg.ffn_ratio,
            cfg.attention_impl, cfg.num_patches + 1
        ),
        "decoder_norm": layers.layer_norm_init(dd),
        "decoder_pred": layers.linear_init(keys[6], dd, cfg.patch_dim),
    }
    state: Params = {}
    if cfg.use_cd_pred:
        params["predictor_cd"] = layers.predictor_init(
            keys[7], dd, cfg.num_patches, cfg.predictor_hidden_size
        )
        state["predictor_cd"] = layers.predictor_state_init(cfg.num_patches)
    if cfg.use_ce_pred:
        params["predictor_ce"] = layers.predictor_init(
            jax.random.fold_in(keys[7], 1), d, cfg.len_keep, cfg.predictor_hidden_size
        )
        state["predictor_ce"] = layers.predictor_state_init(cfg.len_keep)
    if cfg.use_perceptual:
        from cross_scale_mae_tpu.losses.perceptual import init_vgg16_params

        # Frozen trunk: lives in state, not params, so it never receives
        # gradients or weight decay.
        state["vgg"] = init_vgg16_params(jax.random.fold_in(keys[7], 2),
                                         cfg.input_channels)
    return params, state


# ------------------------------------------------------------------ forward


def _pos_tables(cfg: MAEConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    enc = get_2d_sincos_pos_embed(cfg.dim_model, cfg.grid_size, cls_token=True)
    dec = get_2d_sincos_pos_embed(cfg.decoder_embed_dim, cfg.grid_size, cls_token=True)
    return enc, dec


def _run_stack(cfg: MAEConfig, stacked: Params, x: jnp.ndarray,
               num_heads: int) -> jnp.ndarray:
    """Block-stack dispatch shared by encoder/decoder (flat vs (N,L,D) carry)."""
    if cfg.flat_blocks:
        return layers.run_blocks_flat(
            stacked, x, num_heads, cfg.attention_impl,
            cfg.residual_norm_style, cfg.remat,
            gelu=cfg.gelu, sp=cfg.sequence_parallel,
        )
    return layers.run_blocks(
        stacked, x, num_heads, cfg.attention_impl,
        cfg.residual_norm_style, cfg.remat,
        scan=cfg.scan_blocks, gelu=cfg.gelu, sp=cfg.sequence_parallel,
    )


def _embed_patches(params: Params, cfg: MAEConfig, imgs: jnp.ndarray
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """imgs NHWC -> (patch tokens + pos (N, L, D), enc_pos table)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    enc_pos, _ = _pos_tables(cfg)
    x = patchify(imgs, cfg.patch_size).astype(dtype)
    x = layers.linear(params["patch_embed"], x)
    return x + enc_pos[None, 1:, :].astype(dtype), enc_pos


def _encoder_trunk(params: Params, cfg: MAEConfig, x: jnp.ndarray,
                   enc_pos: jnp.ndarray) -> jnp.ndarray:
    """cls-token cat -> encoder blocks -> (optional) encoder norm.

    One body for the masked training path (mae_forward_encoder) and the
    unmasked inference path (mae_encode) — a change to block running must
    land on both or they silently diverge (VERDICT r4 §weak-8)."""
    cls = (at_least_f32(params["cls_token"]) + enc_pos[None, :1, :]).astype(x.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[2])), x], axis=1
    )
    x = _run_stack(cfg, params["encoder_blocks"], x, cfg.encoder_num_heads)
    if cfg.apply_encoder_norm:
        # The reference computes-and-discards this norm (MAE_ViT_Baseline.py:264).
        x = layers.layer_norm(params["encoder_norm"], x)
    return x


def mae_forward_encoder(
    params: Params,
    cfg: MAEConfig,
    imgs: jnp.ndarray,
    *,
    rng: jax.Array | None = None,
    noise: jnp.ndarray | None = None,
    len_keep: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """imgs NHWC -> (enc_emb (N,1+len_keep,D), mask (N,L), ids_restore).

    Mirrors MAE_ViT_Baseline.forward_encoder (MAE_ViT_Baseline.py:243-266).
    """
    x, enc_pos = _embed_patches(params, cfg, imgs)
    lk = cfg.len_keep if len_keep is None else len_keep
    x, mask, ids_restore = random_masking(x, lk, rng=rng, noise=noise)
    x = _encoder_trunk(params, cfg, x, enc_pos)
    return x, mask, ids_restore


def mae_forward_decoder(
    params: Params, cfg: MAEConfig, x: jnp.ndarray, ids_restore: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pred (N,L,p*p*C), dec_emb (N,1+L,Dd)).
    Mirrors MAE_ViT_Baseline.forward_decoder (MAE_ViT_Baseline.py:268-297)."""
    y = layers.linear(params["decoder_embed"], x)
    y_grid = restore_tokens(y[:, 1:, :], params["mask_token"][0, 0], ids_restore)
    y = jnp.concatenate([y[:, :1, :], y_grid], axis=1)
    _, dec_pos = _pos_tables(cfg)
    y = y + dec_pos[None].astype(y.dtype)
    y = _run_stack(cfg, params["decoder_blocks"], y, cfg.decoder_num_heads)
    y = layers.layer_norm(params["decoder_norm"], y)
    pred = layers.linear(params["decoder_pred"], y)[:, 1:, :]
    return pred, y


def _recon_loss(cfg: MAEConfig, imgs, pred, mask):
    target = process_target(imgs, cfg.patch_size, cfg.input_channels, cfg.norm_pix_loss)
    return recon_loss(
        cfg.loss, target, at_least_f32(pred), mask,
        patch_size=cfg.patch_size, channels=cfg.input_channels,
    )


def mae_apply(
    params: Params,
    cfg: MAEConfig,
    imgs: jnp.ndarray,
    rng: jax.Array,
    *,
    noise: jnp.ndarray | None = None,
) -> MAEOutput:
    """Single-view forward: the MAE_ViT_Baseline.forward contract
    (loss, pred, mask, embeddings) (MAE_ViT_Baseline.py:299-320)."""
    enc, mask, ids_restore = mae_forward_encoder(
        params, cfg, imgs, rng=rng, noise=noise
    )
    pred, dec = mae_forward_decoder(params, cfg, enc, ids_restore)
    loss = _recon_loss(cfg, imgs, pred, mask)
    return MAEOutput(
        loss=loss, losses={"loss_d": loss}, pred=pred, mask=mask,
        enc_emb=(enc,), dec_emb=(dec,),
    )


def mae_encode(
    params: Params, cfg: MAEConfig, imgs: jnp.ndarray
) -> jnp.ndarray:
    """Unmasked encoder features for inference / transfer: (N, 1+L, D).

    The deterministic no-masking pass (mask_ratio=0, identity order) — the
    building block behind linear-probe feature extraction and embedding
    serving. Equivalent to forward_encoder at mask_ratio=0 without the
    shuffle."""
    x, enc_pos = _embed_patches(params, cfg, imgs)
    return _encoder_trunk(params, cfg, x, enc_pos)


def mae_loss_fn(
    params: Params,
    state: Params,
    cfg: MAEConfig,
    imgs: jnp.ndarray,
    rng: jax.Array,
    *,
    train: bool = True,
    consistent_mask: bool = False,
) -> MAEOutput:
    """Full training objective for any variant. imgs: (N, H, W, C) normalized
    — or a temporal pair (N, 2, H, W, C) (data/datasets.FmowTemporalDataset),
    in which case frame 1 stands in for the on-device crop as the second
    view and the Le/Ce/Cd/NT-Xent terms become cross-TEMPORAL consistency
    losses (same objective shape; the reference's temporal dataset,
    util/datasets.py:237-294, is dead code with no consuming model).

    Single-scale configs reduce to the baseline reconstruction loss. For
    multi-scale configs both views are batched into one forward at 2N.
    """
    view2 = None
    if imgs.ndim == 5:
        if not cfg.multi_scale:
            raise ValueError(
                "temporal (N, T, H, W, C) batches need a multi-scale "
                "variant (MsLd*): single-view MAE has no slot for the "
                "second frame"
            )
        view2 = imgs[:, 1]
        imgs = imgs[:, 0]
    if not cfg.multi_scale:
        out = mae_apply(params, cfg, imgs, rng)
        return out._replace(state=state)

    n = imgs.shape[0]
    k_crop, k_mask1, k_mask2 = jax.random.split(rng, 3)

    if view2 is not None:
        imgs_crop = view2
    elif cfg.ms_per_sample_crop:
        # Low-GSD view: on-device RandomResizedCrop (MAE_ViT_MsLd.py:29-35,52).
        boxes = sample_crop_boxes(
            k_crop, n, cfg.input_size, cfg.input_size, cfg.ms_range,
            cfg.ms_aspect_ratio,
        )
        imgs_crop = crop_resize(imgs, boxes, cfg.input_size, method="linear",
                                exact=False)
    else:
        boxes = jnp.broadcast_to(
            sample_crop_boxes(
                k_crop, 1, cfg.input_size, cfg.input_size, cfg.ms_range,
                cfg.ms_aspect_ratio,
            ),
            (n, 4),
        )
        imgs_crop = crop_resize(imgs, boxes, cfg.input_size, method="linear",
                                exact=False)

    both = jnp.concatenate([imgs, imgs_crop], axis=0)  # (2N, H, W, C)
    noise1 = jax.random.uniform(k_mask1, (n, cfg.num_patches))
    noise2 = noise1 if consistent_mask else jax.random.uniform(
        k_mask2, (n, cfg.num_patches)
    )
    noise = jnp.concatenate([noise1, noise2], axis=0)

    enc, mask, ids_restore = mae_forward_encoder(params, cfg, both, noise=noise)
    pred, dec = mae_forward_decoder(params, cfg, enc, ids_restore)

    losses: dict[str, jnp.ndarray] = {}
    # Reconstruction on each view separately, then sum/mean
    # (MAE_ViT_MsLd.py:64-66).
    loss_orig = _recon_loss(cfg, imgs, pred[:n], mask[:n])
    loss_crop = _recon_loss(cfg, imgs_crop, pred[n:], mask[n:])
    loss_d = loss_orig + loss_crop
    if cfg.ms_decoder_loss_reduction == "mean":
        loss_d = loss_d / 2
    losses["loss_d"] = loss_d
    total = loss_d

    enc_o, enc_c = enc[:n], enc[n:]
    dec_o, dec_c = dec[:n], dec[n:]
    new_state = dict(state)

    if cfg.use_le:
        # Latent distance between full encoder embeddings (MAE_ViT_MsLdLe.py:44).
        loss_e = recon_loss(
            cfg.loss_name("e"), at_least_f32(enc_o), at_least_f32(enc_c)
        )
        losses["loss_e"] = loss_e
        total = total + loss_e

    if cfg.use_ce_pred:
        # MLP predictor: crop encoder tokens -> orig encoder tokens
        # (MAE_ViT_MsLdCe.py:46-48).
        pred_ce, new_state["predictor_ce"] = layers.predictor_apply(
            params["predictor_ce"], state["predictor_ce"], enc_c[:, 1:, :], train
        )
        loss_ce_p = recon_loss(
            cfg.loss_name("ce"), at_least_f32(enc_o[:, 1:, :]),
            at_least_f32(pred_ce),
        )
        losses["loss_ce_pred"] = loss_ce_p
        total = total + loss_ce_p

    if cfg.use_cd_pred:
        # MLP predictor on decoder embeddings (MAE_ViT_MsLdCd.py:49-51).
        pred_cd, new_state["predictor_cd"] = layers.predictor_apply(
            params["predictor_cd"], state["predictor_cd"], dec_c[:, 1:, :], train
        )
        loss_cd = recon_loss(
            cfg.loss_name("cd"), at_least_f32(dec_o[:, 1:, :]),
            at_least_f32(pred_cd),
        )
        losses["loss_cd"] = loss_cd
        total = total + loss_cd

    if cfg.use_ce_ntxent:
        # NT-Xent between mean-pooled patch tokens (MAE_ViT_MsLdCeCd.py:62-69).
        # Under data-parallel jit this sees the GLOBAL batch (XLA gathers
        # across chips), i.e. more negatives than the reference's per-GPU
        # NT-Xent under DDP — a deliberate strengthening; match-local would
        # need a shard_map escape hatch.
        f1 = jnp.mean(at_least_f32(enc_o[:, 1:, :]), axis=1)
        f2 = jnp.mean(at_least_f32(enc_c[:, 1:, :]), axis=1)
        loss_ce = ntxent_loss(f1, f2, tau=cfg.ntxent_tau, cos_sim=cfg.ntxent_cos_sim)
        losses["loss_ce"] = loss_ce
        total = total + loss_ce

    if cfg.use_perceptual:
        from cross_scale_mae_tpu.losses.perceptual import perceptual_loss
        from cross_scale_mae_tpu.ops.patchify import unpatchify

        pred_img = unpatchify(
            at_least_f32(pred[:n]), cfg.patch_size, cfg.input_channels
        )
        loss_p = perceptual_loss(state["vgg"], pred_img, at_least_f32(imgs),
                                 resize_to=None)
        losses["loss_perceptual"] = loss_p
        total = total + cfg.perceptual_weight * loss_p

    return MAEOutput(
        loss=total, losses=losses, pred=pred[:n], mask=mask[:n],
        enc_emb=(enc_o, enc_c), dec_emb=(dec_o, dec_c), state=new_state,
    )
