"""Torch-checkpoint importer parity tests.

Builds a minimal torch model with the reference's structure/key names (conv
patch embed + pre-LN timm-style blocks, fused qkv) as a golden fixture,
saves a .pth, imports it, and checks numerical parity of the full encoder/
decoder forward at mask_ratio=0 (deterministic path).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from cross_scale_mae_tpu.configs import get_mae_config, get_vit_config  # noqa: E402
from cross_scale_mae_tpu.models import mae_init  # noqa: E402
from cross_scale_mae_tpu.models.mae import (  # noqa: E402
    mae_forward_decoder,
    mae_forward_encoder,
)
from cross_scale_mae_tpu.utils.torch_import import (  # noqa: E402
    import_mae_checkpoint,
    mae_encoder_to_classifier,
    merge_pretrained,
    normalize_torch_keys,
)

D, DD, P, S, LAYERS, DLAYERS, HEADS = 32, 16, 4, 8, 2, 2, 4


class TorchBlock(nn.Module):
    """Pre-LN transformer block with timm's structure and key names."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                b, l, d = x.shape
                hd = d // heads
                qkv = self.qkv(x).reshape(b, l, 3, heads, hd).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
                attn = attn.softmax(dim=-1)
                out = (attn @ v).transpose(1, 2).reshape(b, l, d)
                return self.proj(out)

        self.attn = Attn()
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(dim, dim * 4)
                self.fc2 = nn.Linear(dim * 4, dim)

            def forward(self, x):
                return self.fc2(nn.functional.gelu(self.fc1(x)))

        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TorchMAE(nn.Module):
    """Golden-model skeleton with reference checkpoint key names
    (MAE_ViT_Baseline.py param inventory)."""

    def __init__(self, d=D, dd=DD, p=P, layers=LAYERS, dlayers=DLAYERS,
                 heads=HEADS, dheads=None):
        super().__init__()
        dheads = heads if dheads is None else dheads

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, d, kernel_size=p, stride=p)

            def forward(self, x):
                return self.proj(x).flatten(2).transpose(1, 2)

        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.mask_token = nn.Parameter(torch.randn(1, 1, dd) * 0.02)
        self.encoder = nn.ModuleList([TorchBlock(d, heads) for _ in range(layers)])
        self.encoder_norm = nn.LayerNorm(d, eps=1e-6)
        self.decoder_embed = nn.Linear(d, dd)
        self.decoder = nn.ModuleList([TorchBlock(dd, dheads) for _ in range(dlayers)])
        self.decoder_norm = nn.LayerNorm(dd, eps=1e-6)
        self.decoder_pred = nn.Linear(dd, p * p * 3)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    torch.manual_seed(0)
    model = TorchMAE().eval()
    path = tmp_path_factory.mktemp("ckpt") / "checkpoint-0.pth"
    torch.save({"model": model.state_dict(), "epoch": 0}, path)
    return model, str(path)


@pytest.fixture(scope="module")
def cfg():
    return get_mae_config(
        "mae_vit_tiny", input_size=S, patch_size=P, mask_ratio=0.0,
        compute_dtype="float32",
        gelu="exact",  # torch nn.GELU parity (default is the tanh approx)
    ).replace(
        dim_model=D, encoder_num_layers=LAYERS, encoder_num_heads=HEADS,
        decoder_embed_dim=DD, decoder_num_layers=DLAYERS, decoder_num_heads=HEADS,
    )


def _torch_reference_forward(model, imgs_nchw, enc_pos, dec_pos):
    """The reference forward at mask_ratio=0 (MAE_ViT_Baseline.py:243-297),
    including the discarded-encoder-norm quirk (:264)."""
    with torch.no_grad():
        x = model.patch_embed(imgs_nchw)
        x = x + enc_pos[:, 1:, :]
        cls = model.cls_token + enc_pos[:, :1, :]
        x = torch.cat([cls.expand(x.shape[0], -1, -1), x], dim=1)
        for blk in model.encoder:
            x = blk(x)
        enc = x  # encoder_norm intentionally NOT applied
        y = model.decoder_embed(enc)
        y = y + dec_pos
        for blk in model.decoder:
            y = blk(y)
        y = model.decoder_norm(y)
        pred = model.decoder_pred(y)[:, 1:, :]
    return enc.numpy(), pred.numpy()


@pytest.mark.slow
def test_full_forward_parity(golden, cfg):
    from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    model, path = golden
    params = import_mae_checkpoint(path, cfg)

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, S, S, 3)).astype(np.float32)
    enc_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(D, S // P, cls_token=True))
    )[None].float()
    dec_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(DD, S // P, cls_token=True))
    )[None].float()
    ref_enc, ref_pred = _torch_reference_forward(
        model, torch.from_numpy(imgs.transpose(0, 3, 1, 2)), enc_pos, dec_pos
    )

    enc, mask, ids_restore = mae_forward_encoder(
        params, cfg, jnp.asarray(imgs), rng=jax.random.key(0)
    )
    pred, dec = mae_forward_decoder(params, cfg, enc, ids_restore)
    # mask_ratio=0: all tokens kept, but shuffled by ids; decoder's
    # restore_tokens unshuffles. Encoder tokens are in shuffled order, so
    # compare the decoder pred (restored to image order) and cls token.
    np.testing.assert_allclose(
        np.asarray(enc[:, 0]), ref_enc[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(pred), ref_pred, atol=2e-4)


def test_full_forward_parity_vitb(tmp_path):
    """Same parity at REAL ViT-B widths (768x12 enc, 512x8 dec, patch 16,
    base preset from models_mae/__init__.py:42-49): catches stride/reshape
    bugs invisible at the 32-dim toy sizes above."""
    from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    torch.manual_seed(1)
    model = TorchMAE(d=768, dd=512, p=16, layers=12, dlayers=8,
                     heads=12, dheads=16).eval()
    path = tmp_path / "checkpoint-vitb.pth"
    torch.save({"model": model.state_dict(), "epoch": 0}, path)

    s, p = 64, 16  # 4x4 grid keeps the torch CPU forward cheap
    vcfg = get_mae_config(
        "mae_vit_base", input_size=s, patch_size=p, mask_ratio=0.0,
        compute_dtype="float32", gelu="exact",
    )
    params = import_mae_checkpoint(str(path), vcfg)

    rng = np.random.default_rng(8)
    imgs = rng.normal(size=(2, s, s, 3)).astype(np.float32)
    enc_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(768, s // p, cls_token=True))
    )[None].float()
    dec_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(512, s // p, cls_token=True))
    )[None].float()
    ref_enc, ref_pred = _torch_reference_forward(
        model, torch.from_numpy(imgs.transpose(0, 3, 1, 2)), enc_pos, dec_pos
    )

    enc, mask, ids_restore = mae_forward_encoder(
        params, vcfg, jnp.asarray(imgs), rng=jax.random.key(0)
    )
    pred, dec = mae_forward_decoder(params, vcfg, enc, ids_restore)
    np.testing.assert_allclose(np.asarray(enc[:, 0]), ref_enc[:, 0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(pred), ref_pred, atol=2e-3)


@pytest.mark.slow
def test_gradient_parity_with_torch_autograd(golden, cfg):
    """Backward-pass parity: d(mse_loss)/d(params) matches torch autograd
    on the imported weights (mask_ratio=0 deterministic path)."""
    from cross_scale_mae_tpu.losses.recon import process_target
    from cross_scale_mae_tpu.losses import recon_loss
    from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    model, path = golden
    params = import_mae_checkpoint(path, cfg)
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, S, S, 3)).astype(np.float32)

    # --- torch side
    enc_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(D, S // P, cls_token=True))
    )[None].float()
    dec_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(DD, S // P, cls_token=True))
    )[None].float()
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    model.zero_grad()
    x = model.patch_embed(timgs) + enc_pos[:, 1:, :]
    cls = model.cls_token + enc_pos[:, :1, :]
    x = torch.cat([cls.expand(x.shape[0], -1, -1), x], dim=1)
    for blk in model.encoder:
        x = blk(x)
    y = model.decoder_embed(x) + dec_pos
    for blk in model.decoder:
        y = blk(y)
    y = model.decoder_norm(y)
    pred_t = model.decoder_pred(y)[:, 1:, :]
    # target: patchify + masked-mean with mask == all ones
    tgt = timgs.reshape(2, 3, S // P, P, S // P, P)
    tgt = torch.einsum("nchpwq->nhwpqc", tgt).reshape(2, -1, P * P * 3)
    loss_t = ((pred_t - tgt) ** 2).mean()
    loss_t.backward()
    g_qkv_t = model.encoder[0].attn.qkv.weight.grad.numpy()  # (3D, D)
    g_pe_t = model.patch_embed.proj.weight.grad.numpy()      # (D, 3, P, P)

    # --- jax side (mask of zeros == all patches 'visible'; use mask=None
    # to match the torch plain mean)
    def loss_fn(p):
        enc, mask, ids = mae_forward_encoder(
            p, cfg, jnp.asarray(imgs), rng=jax.random.key(0)
        )
        pred, _ = mae_forward_decoder(p, cfg, enc, ids)
        target = process_target(jnp.asarray(imgs), P, 3, False)
        return recon_loss("mse", target, pred, None)

    grads = jax.grad(loss_fn)(params)
    g_qkv_j = np.asarray(grads["encoder_blocks"]["attn"]["qkv"]["kernel"])[0].T
    np.testing.assert_allclose(g_qkv_j, g_qkv_t, atol=2e-5)
    g_pe_j = np.asarray(grads["patch_embed"]["kernel"])  # (P*P*3, D)
    g_pe_t_flat = g_pe_t.transpose(2, 3, 1, 0).reshape(P * P * 3, D)
    np.testing.assert_allclose(g_pe_j, g_pe_t_flat, atol=2e-5)
    np.testing.assert_allclose(float(loss_fn(params)), float(loss_t), rtol=1e-5)


def test_patch_embed_conv_equivalence(golden, cfg):
    from cross_scale_mae_tpu.models.layers import linear
    from cross_scale_mae_tpu.ops.patchify import patchify

    model, path = golden
    params = import_mae_checkpoint(path, cfg)
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, S, S, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.patch_embed(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = linear(params["patch_embed"], patchify(jnp.asarray(imgs), P))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_xformers_key_normalization():
    sd = {
        "encoder.encoders.0.wrap_att.norm.weight": np.ones(4, np.float32),
        "encoder.encoders.0.wrap_att.sublayer.layer.in_proj_container.q_proj.weight":
            np.full((4, 4), 1.0, np.float32),
        "encoder.encoders.0.wrap_att.sublayer.layer.in_proj_container.k_proj.weight":
            np.full((4, 4), 2.0, np.float32),
        "encoder.encoders.0.wrap_att.sublayer.layer.in_proj_container.v_proj.weight":
            np.full((4, 4), 3.0, np.float32),
        "encoder.encoders.0.wrap_ff.sublayer.layer.mlp.0.bias": np.zeros(4, np.float32),
    }
    out = normalize_torch_keys(sd)
    assert "encoder.0.norm1.weight" in out
    assert "encoder.0.mlp.fc1.bias" in out
    qkv = out["encoder.0.attn.qkv.weight"]
    assert qkv.shape == (12, 4)
    assert (qkv[:4] == 1).all() and (qkv[4:8] == 2).all() and (qkv[8:] == 3).all()


def test_encoder_to_classifier_transfer(golden, cfg):
    model, path = golden
    mae_params = import_mae_checkpoint(path, cfg)
    vcfg = get_vit_config(
        "vit_base_patch16", input_size=S, patch_size=P, num_classes=7,
        compute_dtype="float32",
    ).replace(embed_dim=D, depth=LAYERS, num_heads=HEADS)
    pre, missing = mae_encoder_to_classifier(mae_params, vcfg)
    assert "head" in missing and "pos_embed" in missing

    from cross_scale_mae_tpu.models import vit_apply, vit_init

    params, state = vit_init(jax.random.key(0), vcfg)
    merged = merge_pretrained(params, pre)
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(mae_params["encoder_blocks"]["attn"]["qkv"]["kernel"]),
    )
    # merged model runs
    logits, _ = vit_apply(
        params=merged, state=state, cfg=vcfg,
        imgs=jnp.zeros((1, S, S, 3), jnp.float32),
    )
    assert logits.shape == (1, 7)
