"""Multi-step TRAINING equivalence against a torch twin.

The forward/gradient parity tests (test_torch_import.py) cover one step;
this runs TEN full optimizer steps in lockstep — same weights (imported
from a torch checkpoint), same data, same per-step masking noise, AdamW
(betas 0.9/0.95, decoupled wd with the timm ndim>1 decay split) on both
sides, with the torch side's learning rate driven by the REFERENCE's own
util/lr_sched.adjust_learning_rate — and asserts the loss trajectories and
final parameters match. This is the strongest accuracy-direction evidence
available without real data: the whole training loop (model + masking +
loss + schedule + optimizer + wd masking) is numerically the reference's.
"""

from types import SimpleNamespace
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.test_torch_import import (  # noqa: E402
    D,
    DD,
    DLAYERS,
    HEADS,
    LAYERS,
    P,
    S,
    TorchMAE,
)


@pytest.fixture
def cfg():
    from cross_scale_mae_tpu.configs import get_mae_config

    return get_mae_config(
        "mae_vit_tiny", input_size=S, patch_size=P, mask_ratio=0.0,
        compute_dtype="float32", gelu="exact",
    ).replace(
        dim_model=D, encoder_num_layers=LAYERS, encoder_num_heads=HEADS,
        decoder_embed_dim=DD, decoder_num_layers=DLAYERS,
        decoder_num_heads=HEADS,
    )

STEPS = 10
BATCH = 2
MASK_RATIO = 0.75


def _torch_masked_forward(model, imgs_nchw, noise, enc_pos, dec_pos, len_keep,
                          return_embeds=False):
    """Reference forward WITH masking (MAE_ViT_Baseline.py:243-297 +
    MAE_ViT_Shared.random_masking on injected noise)."""
    n = imgs_nchw.shape[0]
    x = model.patch_embed(imgs_nchw) + enc_pos[:, 1:, :]
    ids_shuffle = torch.argsort(noise, dim=1)
    ids_restore = torch.argsort(ids_shuffle, dim=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x = torch.gather(
        x, 1, ids_keep.unsqueeze(-1).repeat(1, 1, x.shape[-1]))
    l_full = noise.shape[1]
    mask = torch.ones(n, l_full)
    mask[:, :len_keep] = 0
    mask = torch.gather(mask, 1, ids_restore)
    cls = (model.cls_token + enc_pos[:, :1, :]).expand(n, -1, -1)
    x = torch.cat([cls, x], dim=1)
    for blk in model.encoder:
        x = blk(x)
    # encoder_norm intentionally discarded (reference quirk)
    y = model.decoder_embed(x)
    mask_tokens = model.mask_token.repeat(n, l_full - len_keep, 1)
    y_grid = torch.cat([y[:, 1:, :], mask_tokens], dim=1)
    y_grid = torch.gather(
        y_grid, 1, ids_restore.unsqueeze(-1).repeat(1, 1, y.shape[-1]))
    y = torch.cat([y[:, :1, :], y_grid], dim=1) + dec_pos
    for blk in model.decoder:
        y = blk(y)
    y = model.decoder_norm(y)
    pred = model.decoder_pred(y)[:, 1:, :]
    # masked mse (MAE_ViT_Shared.forward_loss_mse)
    tgt = imgs_nchw.reshape(n, 3, S // P, P, S // P, P)
    tgt = torch.einsum("nchpwq->nhwpqc", tgt).reshape(n, -1, P * P * 3)
    per_patch = ((pred - tgt) ** 2).mean(dim=-1)
    loss = (per_patch * mask).sum() / mask.sum()
    if return_embeds:
        return loss, x, y  # enc tokens (unnormed, quirk), dec tokens (normed)
    return loss


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["MsLdCeCd", "MsLdLe", "MsLdCe"])
def test_ten_step_multiscale_training_equivalence(cfg, tmp_path, variant):
    """Multi-scale variants in ten-step lockstep — MsLdCeCd (the flagship:
    dual-view reconstruction + cross-decoder MLP-predictor with token-axis
    BatchNorm + NT-Xent), MsLdLe (latent distance) and MsLdCe (cross-encoder
    predictor, BN sized to len_keep). The crop is forced to the identity by
    degenerate ranges (ms_range=(1,1), aspect=(1,1) -> box = full image,
    identity resample) so both sides see the same two views with different
    injected masks; the torch side's NT-Xent is the reference's own
    util/contrast_loss.NTXentLoss and its lr util/lr_sched."""
    import optax

    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_loss_fn
    from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed
    from cross_scale_mae_tpu.train.optim import build_optimizer
    from cross_scale_mae_tpu.train.schedule import warmup_half_cosine
    from cross_scale_mae_tpu.utils.torch_import import import_mae_checkpoint
    from tests.test_reference_parity import REF, _load_ref

    if not REF.exists():
        pytest.skip("reference not mounted")
    ref_lr_sched = _load_ref("util/lr_sched.py", "_ref_lr_sched")
    ref_contrast = _load_ref("util/contrast_loss.py", "_ref_contrast_loss")

    torch.manual_seed(9)
    model = TorchMAE().train()
    path = tmp_path / "ckpt.pth"
    torch.save({"model": model.state_dict()}, path)

    flags = {
        "MsLdCeCd": dict(use_cd_pred=True, use_ce_ntxent=True),
        "MsLdLe": dict(use_le=True),
        "MsLdCe": dict(use_ce_pred=True),
    }[variant]
    vcfg = cfg.replace(
        mask_ratio=MASK_RATIO, multi_scale=True,
        ms_range=(1.0, 1.0), ms_aspect_ratio=(1.0, 1.0),
        predictor_hidden_size=64, **flags,
    )
    params = import_mae_checkpoint(str(path), vcfg)
    # Fresh predictor on the jax side; mirror its weights into torch.
    _, mstate = mae_init(jax.random.key(11), vcfg)
    from cross_scale_mae_tpu.models import layers as jlayers

    l_full = (S // P) ** 2
    len_keep = int(l_full * (1 - MASK_RATIO))
    pred_t = None
    pred_key = None
    if vcfg.use_cd_pred or vcfg.use_ce_pred:
        pred_key = "predictor_cd" if vcfg.use_cd_pred else "predictor_ce"
        pdim = DD if vcfg.use_cd_pred else D
        ptokens = l_full if vcfg.use_cd_pred else len_keep
        params[pred_key] = jlayers.predictor_init(
            jax.random.key(12), pdim, ptokens, 64)
        pred_t = torch.nn.Sequential(
            torch.nn.Linear(pdim, 64),
            torch.nn.BatchNorm1d(ptokens),
            torch.nn.ReLU(),
            torch.nn.Linear(64, pdim),
        )
        with torch.no_grad():
            pj = params[pred_key]
            pred_t[0].weight.copy_(torch.from_numpy(
                np.asarray(pj["fc1"]["kernel"]).copy()).T)
            pred_t[0].bias.copy_(torch.from_numpy(
                np.asarray(pj["fc1"]["bias"]).copy()))
            pred_t[3].weight.copy_(torch.from_numpy(
                np.asarray(pj["fc2"]["kernel"]).copy()).T)
            pred_t[3].bias.copy_(torch.from_numpy(
                np.asarray(pj["fc2"]["bias"]).copy()))

    ntxent_t = ref_contrast.NTXentLoss(BATCH, tau=0.5, cos_sim=True)

    steps_per_epoch = 5
    lr_args = SimpleNamespace(lr=1e-3, min_lr=0.0, warmup_epochs=1, epochs=2)
    schedule = warmup_half_cosine(
        lr_args.lr, lr_args.min_lr, lr_args.warmup_epochs, lr_args.epochs,
        steps_per_epoch,
    )
    all_t = list(model.parameters()) + (
        list(pred_t.parameters()) if pred_t is not None else [])
    topt = torch.optim.AdamW(
        [{"params": [p for p in all_t if p.ndim > 1], "weight_decay": 0.05},
         {"params": [p for p in all_t if p.ndim <= 1], "weight_decay": 0.0}],
        lr=0.0, betas=(0.9, 0.95), eps=1e-8,
    )
    enc_pos = torch.from_numpy(np.asarray(
        get_2d_sincos_pos_embed(D, S // P, cls_token=True)))[None].float()
    dec_pos = torch.from_numpy(np.asarray(
        get_2d_sincos_pos_embed(DD, S // P, cls_token=True)))[None].float()

    tx = build_optimizer(params, schedule, weight_decay=0.05)
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, mstate, opt_state, imgs, rng):
        def loss_fn(p, ms):
            out = mae_loss_fn(p, ms, vcfg, imgs, rng, train=True)
            return out.loss, out.state

        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mstate)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), new_ms, opt_state2

    rng_np = np.random.default_rng(37)
    jl, tl_all = [], []
    base = jax.random.key(41)
    for t in range(STEPS):
        imgs = rng_np.normal(size=(BATCH, S, S, 3)).astype(np.float32)
        step_key = jax.random.fold_in(base, t)
        # Reproduce mae_loss_fn's noise derivation outside the jit so the
        # torch side masks identically (models/mae.py mae_loss_fn).
        _, k_mask1, k_mask2 = jax.random.split(step_key, 3)
        noise1 = np.asarray(jax.random.uniform(k_mask1, (BATCH, l_full)))
        noise2 = np.asarray(jax.random.uniform(k_mask2, (BATCH, l_full)))

        timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ref_lr_sched.adjust_learning_rate(topt, t / steps_per_epoch, lr_args)
        topt.zero_grad()
        l1, enc1, dec1 = _torch_masked_forward(
            model, timgs, torch.from_numpy(noise1), enc_pos, dec_pos,
            len_keep, return_embeds=True)
        l2, enc2, dec2 = _torch_masked_forward(
            model, timgs, torch.from_numpy(noise2), enc_pos, dec_pos,
            len_keep, return_embeds=True)
        loss_t = l1 + l2
        if vcfg.use_le:
            # full embeddings INCL cls (MAE_ViT_MsLdLe.py:44)
            loss_t = loss_t + ((enc1 - enc2) ** 2).mean(dim=-1).mean()
        if vcfg.use_ce_pred:
            p_ce = pred_t(enc2[:, 1:, :])
            loss_t = loss_t + ((p_ce - enc1[:, 1:, :]) ** 2).mean(-1).mean()
        if vcfg.use_cd_pred:
            pred_cd = pred_t(dec2[:, 1:, :])
            loss_t = loss_t + ((pred_cd - dec1[:, 1:, :]) ** 2).mean(-1).mean()
        if vcfg.use_ce_ntxent:
            f1 = enc1[:, 1:, :].mean(dim=1)
            f2 = enc2[:, 1:, :].mean(dim=1)
            loss_t = loss_t + ntxent_t(f1, f2)
        loss_t.backward()
        topt.step()
        tl_all.append(float(loss_t.detach()))

        loss_j, params, mstate, opt_state = jstep(
            params, mstate, opt_state, jnp.asarray(imgs), step_key)
        jl.append(float(loss_j))

    np.testing.assert_allclose(jl, tl_all, rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(params["decoder_pred"]["kernel"]),
        model.decoder_pred.weight.detach().numpy().T, atol=5e-4)
    if pred_key is not None:
        np.testing.assert_allclose(
            np.asarray(params[pred_key]["fc1"]["kernel"]),
            pred_t[0].weight.detach().numpy().T, atol=5e-4)
        # Predictor BN running stats in lockstep too.
        np.testing.assert_allclose(
            np.asarray(mstate[pred_key]["bn"]["mean"]),
            pred_t[1].running_mean.detach().numpy(), atol=1e-5)
    assert jl[-1] < jl[0]


class TorchViT(torch.nn.Module):
    """Classifier twin with timm-convention parameter NAMES so the
    reference's util/lr_decay.param_groups_lrd assigns the same layer ids
    our layer_decay_scales does (get_layer_id_for_vit, lr_decay.py:63-75)."""

    def __init__(self, d, depth, heads, num_classes, num_tokens, patch_dim):
        super().__init__()
        import torch.nn as nn

        self.patch_embed = nn.Linear(patch_dim, d)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, num_tokens, d))
        self.blocks = torch.nn.ModuleList(
            [TorchMAE(d=d, heads=heads, layers=1).encoder[0]
             for _ in range(depth)]
        )
        self.fc_norm = nn.LayerNorm(d, eps=1e-6)
        self.head = nn.Linear(d, num_classes)

    def no_weight_decay(self):
        return {"pos_embed", "cls_token"}

    def forward(self, patches):
        x = self.patch_embed(patches)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        feat = self.fc_norm(x[:, 1:, :].mean(dim=1))
        return self.head(feat)


def _copy_jax_to_torch_vit(params, model, depth):
    import numpy as _np

    def t(x):
        return torch.from_numpy(_np.asarray(x).copy())

    with torch.no_grad():
        model.patch_embed.weight.copy_(t(params["patch_embed"]["kernel"]).T)
        model.patch_embed.bias.copy_(t(params["patch_embed"]["bias"]))
        model.cls_token.copy_(t(params["cls_token"]))
        model.pos_embed.copy_(t(params["pos_embed"]))
        model.fc_norm.weight.copy_(t(params["fc_norm"]["scale"]))
        model.fc_norm.bias.copy_(t(params["fc_norm"]["bias"]))
        model.head.weight.copy_(t(params["head"]["kernel"]).T)
        model.head.bias.copy_(t(params["head"]["bias"]))
        b = params["blocks"]
        for i in range(depth):
            blk = model.blocks[i]
            blk.norm1.weight.copy_(t(b["norm1"]["scale"][i]))
            blk.norm1.bias.copy_(t(b["norm1"]["bias"][i]))
            blk.attn.qkv.weight.copy_(t(b["attn"]["qkv"]["kernel"][i]).T)
            blk.attn.qkv.bias.copy_(t(b["attn"]["qkv"]["bias"][i]))
            blk.attn.proj.weight.copy_(t(b["attn"]["proj"]["kernel"][i]).T)
            blk.attn.proj.bias.copy_(t(b["attn"]["proj"]["bias"][i]))
            blk.norm2.weight.copy_(t(b["norm2"]["scale"][i]))
            blk.norm2.bias.copy_(t(b["norm2"]["bias"][i]))
            blk.mlp.fc1.weight.copy_(t(b["mlp"]["fc1"]["kernel"][i]).T)
            blk.mlp.fc1.bias.copy_(t(b["mlp"]["fc1"]["bias"][i]))
            blk.mlp.fc2.weight.copy_(t(b["mlp"]["fc2"]["kernel"][i]).T)
            blk.mlp.fc2.bias.copy_(t(b["mlp"]["fc2"]["bias"][i]))


@pytest.mark.slow
def test_ten_step_classifier_training_equivalence(tmp_path):
    """The finetune recipe in lockstep: label-smoothed soft CE +
    layer-wise-lr-decay AdamW(0.9, 0.999) with timm wd exclusions. The
    torch side's param groups come from the REFERENCE's own
    util/lr_decay.param_groups_lrd and its lr from util/lr_sched."""
    import optax

    from cross_scale_mae_tpu.configs import get_vit_config
    from cross_scale_mae_tpu.models import vit_init
    from cross_scale_mae_tpu.models.vit import vit_apply
    from cross_scale_mae_tpu.ops.patchify import patchify
    from cross_scale_mae_tpu.train.mixup import (
        smooth_one_hot,
        soft_cross_entropy,
    )
    from cross_scale_mae_tpu.train.optim import build_optimizer
    from cross_scale_mae_tpu.train.schedule import warmup_half_cosine
    from tests.test_reference_parity import REF, _load_ref

    if not REF.exists():
        pytest.skip("reference not mounted")
    ref_lrd = _load_ref("util/lr_decay.py", "_ref_lr_decay")
    ref_lr_sched = _load_ref("util/lr_sched.py", "_ref_lr_sched")

    depth, d, heads, ncls = 3, 32, 4, 5
    vcfg = get_vit_config(
        "vit_base_patch16", input_size=S, patch_size=P, num_classes=ncls,
        embed_dim=d, depth=depth, num_heads=heads, drop_path_rate=0.0,
        global_pool=True, compute_dtype="float32", gelu="exact",
    )
    params, _ = vit_init(jax.random.key(4), vcfg)
    num_tokens = (S // P) ** 2 + 1
    model = TorchViT(d, depth, heads, ncls, num_tokens, P * P * 3)
    _copy_jax_to_torch_vit(params, model, depth)

    steps_per_epoch = 5
    lr_args = SimpleNamespace(lr=1e-3, min_lr=0.0, warmup_epochs=1, epochs=2)
    schedule = warmup_half_cosine(
        lr_args.lr, lr_args.min_lr, lr_args.warmup_epochs, lr_args.epochs,
        steps_per_epoch,
    )
    layer_decay = 0.75
    groups = ref_lrd.param_groups_lrd(
        model, weight_decay=0.05,
        no_weight_decay_list=model.no_weight_decay(),
        layer_decay=layer_decay,
    )
    topt = torch.optim.AdamW(groups, lr=0.0, betas=(0.9, 0.999), eps=1e-8)

    tx = build_optimizer(
        params, schedule, weight_decay=0.05, b1=0.9, b2=0.999,
        layer_decay=layer_decay, depth=depth,
        no_decay_names=("pos_embed", "cls_token"),
    )
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, opt_state, imgs, labels):
        def loss_fn(p):
            logits, _ = vit_apply(p, {}, vcfg, imgs, train=False)
            targets = smooth_one_hot(labels, ncls, 0.1)
            return soft_cross_entropy(logits, targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state2

    rng = np.random.default_rng(29)
    jl, tl_all = [], []
    for t in range(STEPS):
        imgs = rng.normal(size=(4, S, S, 3)).astype(np.float32)
        labels = rng.integers(0, ncls, size=(4,))

        ref_lr_sched.adjust_learning_rate(topt, t / steps_per_epoch, lr_args)
        topt.zero_grad()
        patches = patchify(jnp.asarray(imgs), P)
        logits_t = model(torch.from_numpy(np.asarray(patches)))
        targets = torch.nn.functional.one_hot(
            torch.from_numpy(labels).long(), ncls
        ).float() * 0.9 + 0.1 / ncls
        loss_t = -(targets * torch.log_softmax(logits_t, dim=-1)).sum(1).mean()
        loss_t.backward()
        topt.step()
        tl_all.append(float(loss_t.detach()))

        loss_j, params, opt_state = jstep(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels))
        jl.append(float(loss_j))

    np.testing.assert_allclose(jl, tl_all, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]),
        model.head.weight.detach().numpy().T, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["mlp"]["fc1"]["kernel"][0]),
        model.blocks[0].mlp.fc1.weight.detach().numpy().T, atol=5e-4)
    # (No loss-decrease assert: labels are freshly random per step, so the
    # task is unlearnable by construction — lockstep is the claim.)


@pytest.mark.slow
def test_ten_step_linprobe_training_equivalence():
    """The linear-probe recipe in lockstep: frozen backbone, frozen-affine
    BatchNorm1d head (eps 1e-6), plain CE, and the REFERENCE's own LARS
    (util/lars.py) driving the torch side — vs our optax lars + masked
    freeze + BN-as-state."""
    import optax

    from cross_scale_mae_tpu.configs import get_vit_config
    from cross_scale_mae_tpu.models import vit_init
    from cross_scale_mae_tpu.models.vit import vit_apply
    from cross_scale_mae_tpu.ops.patchify import patchify
    from cross_scale_mae_tpu.train.optim import build_optimizer
    from tests.test_reference_parity import REF, _load_ref

    if not REF.exists():
        pytest.skip("reference not mounted")
    ref_lars = _load_ref("util/lars.py", "_ref_lars")

    depth, d, heads, ncls = 2, 32, 4, 5
    vcfg = get_vit_config(
        "vit_base_patch16", input_size=S, patch_size=P, num_classes=ncls,
        embed_dim=d, depth=depth, num_heads=heads, drop_path_rate=0.0,
        global_pool=True, use_bn_head=True,
        compute_dtype="float32", gelu="exact",
    )
    params, mstate = vit_init(jax.random.key(6), vcfg)
    num_tokens = (S // P) ** 2 + 1
    model = TorchViT(d, depth, heads, ncls, num_tokens, P * P * 3)
    _copy_jax_to_torch_vit(params, model, depth)
    bn = torch.nn.BatchNorm1d(d, affine=False, eps=1e-6)

    for name, p in model.named_parameters():
        p.requires_grad = name.startswith("head")
    lr = 0.1
    topt = ref_lars.LARS(model.head.parameters(), lr=lr, weight_decay=0.0)

    trainable = jax.tree_util.tree_map_with_path(
        lambda path, leaf: str(getattr(path[0], "key", "")) == "head", params
    )
    tx = build_optimizer(params, lambda _: lr, optimizer="lars",
                         weight_decay=0.0, frozen_mask=trainable)
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, mstate, opt_state, imgs, labels):
        def loss_fn(p, ms):
            logits, new_ms = vit_apply(p, ms, vcfg, imgs, train=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=1))
            return loss, new_ms

        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mstate)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), new_ms, opt_state2

    rng = np.random.default_rng(31)
    jl, tl_all = [], []
    for t in range(STEPS):
        imgs = rng.normal(size=(8, S, S, 3)).astype(np.float32)
        labels = rng.integers(0, ncls, size=(8,))

        topt.zero_grad()
        patches = patchify(jnp.asarray(imgs), P)
        x = model.patch_embed(torch.from_numpy(np.asarray(patches)))
        cls = model.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + model.pos_embed
        for blk in model.blocks:
            x = blk(x)
        feat = model.fc_norm(x[:, 1:, :].mean(dim=1))
        logits_t = model.head(bn(feat))  # BN before head (main_linprobe:517)
        loss_t = torch.nn.functional.cross_entropy(
            logits_t, torch.from_numpy(labels).long())
        loss_t.backward()
        topt.step()
        tl_all.append(float(loss_t.detach()))

        loss_j, params, mstate, opt_state = jstep(
            params, mstate, opt_state, jnp.asarray(imgs), jnp.asarray(labels))
        jl.append(float(loss_j))

    np.testing.assert_allclose(jl, tl_all, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]),
        model.head.weight.detach().numpy().T, atol=5e-4)
    # BN running stats track torch's (momentum 0.1, unbiased running var).
    np.testing.assert_allclose(
        np.asarray(mstate["head_bn"]["mean"]),
        bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mstate["head_bn"]["var"]),
        bn.running_var.numpy(), rtol=1e-4)
    # Backbone untouched on both sides (frozen).
    np.testing.assert_allclose(
        np.asarray(params["patch_embed"]["kernel"]),
        model.patch_embed.weight.detach().numpy().T, atol=1e-7)


@pytest.mark.slow
def test_ten_step_training_equivalence(cfg, tmp_path):
    from cross_scale_mae_tpu.models.mae import mae_apply
    from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed
    from cross_scale_mae_tpu.train.optim import build_optimizer
    from cross_scale_mae_tpu.train.schedule import warmup_half_cosine
    from cross_scale_mae_tpu.utils.torch_import import import_mae_checkpoint
    from tests.test_reference_parity import REF, _load_ref

    if not REF.exists():
        pytest.skip("reference not mounted")
    ref_lr_sched = _load_ref("util/lr_sched.py", "_ref_lr_sched")

    torch.manual_seed(7)
    model = TorchMAE().train()
    path = tmp_path / "ckpt.pth"
    torch.save({"model": model.state_dict()}, path)

    vcfg = cfg.replace(mask_ratio=MASK_RATIO)
    params = import_mae_checkpoint(str(path), vcfg)

    l_full = (S // P) ** 2
    len_keep = int(l_full * (1 - MASK_RATIO))
    rng = np.random.default_rng(23)
    batches = [rng.normal(size=(BATCH, S, S, 3)).astype(np.float32)
               for _ in range(STEPS)]
    noises = [rng.uniform(size=(BATCH, l_full)).astype(np.float32)
              for _ in range(STEPS)]

    # ---- schedules: ours for jax, the reference's own code for torch.
    steps_per_epoch = 5
    lr_args = SimpleNamespace(lr=1e-3, min_lr=0.0, warmup_epochs=1, epochs=2)
    schedule = warmup_half_cosine(
        lr_args.lr, lr_args.min_lr, lr_args.warmup_epochs, lr_args.epochs,
        steps_per_epoch,
    )

    # ---- torch side: AdamW with the timm decay split (ndim > 1 decays).
    decay = [p for p in model.parameters() if p.ndim > 1]
    no_decay = [p for p in model.parameters() if p.ndim <= 1]
    topt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": 0.05},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=0.0, betas=(0.9, 0.95), eps=1e-8,
    )
    enc_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(D, S // P, cls_token=True))
    )[None].float()
    dec_pos = torch.from_numpy(
        np.asarray(get_2d_sincos_pos_embed(DD, S // P, cls_token=True))
    )[None].float()

    # ---- jax side.
    tx = build_optimizer(params, schedule, weight_decay=0.05)
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, opt_state, imgs, noise):
        def loss_fn(p):
            return mae_apply(p, vcfg, imgs, rng=jax.random.key(0),
                             noise=noise).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        import optax

        return loss, optax.apply_updates(params, updates), opt_state2

    jax_losses, torch_losses = [], []
    for t in range(STEPS):
        imgs = batches[t]
        noise = noises[t]
        # torch step (reference lr schedule mutates group lrs in place,
        # honoring per-group scales — none here).
        ref_lr_sched.adjust_learning_rate(topt, t / steps_per_epoch, lr_args)
        topt.zero_grad()
        tl = _torch_masked_forward(
            model, torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(noise), enc_pos, dec_pos, len_keep,
        )
        tl.backward()
        topt.step()
        torch_losses.append(float(tl.detach()))

        loss, params, opt_state = jstep(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(noise))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)
    # Final weights still in lockstep after 10 coupled optimizer steps.
    got = np.asarray(params["decoder_pred"]["kernel"])
    want = model.decoder_pred.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=5e-4)
    got_q = np.asarray(params["encoder_blocks"]["attn"]["qkv"]["kernel"])[0]
    want_q = model.encoder[0].attn.qkv.weight.detach().numpy().T
    np.testing.assert_allclose(got_q, want_q, atol=5e-4)
    # And training actually moved: loss decreased over the run.
    assert jax_losses[-1] < jax_losses[0]
