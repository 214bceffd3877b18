"""Direct parity tests against the reference's OWN torch modules.

Unlike tests/test_torch_import.py (builder-written torch twins), these load
the actual reference sources from /root/reference with importlib —
util/contrast_loss.py, util/lars.py, util/lr_sched.py, util/pos_embed.py,
util/crop.py, and models_mae/MAE_ViT_Shared.py — and assert our JAX
implementations match them on random tensors. Missing optional deps
(pytorch_msssim, timm.loss, torchvision) are stubbed: none of the code paths
under test touch them.

Reference anchors: util/lars.py:27-57, util/contrast_loss.py:81-99,
util/lr_sched.py:9-27, util/pos_embed.py:16-125, util/crop.py:21-41,
models_mae/MAE_ViT_Shared.py:24-177.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys
import types
from types import SimpleNamespace
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


# ---------------------------------------------------------------- loading


def _install_stubs():
    """Stub the reference's unavailable deps. Only installed when absent, and
    only attributes the loaded modules import at module scope."""
    if "pytorch_msssim" not in sys.modules:
        m = types.ModuleType("pytorch_msssim")
        m.ssim = None  # MAE_ViT_Shared only calls these in ssim losses
        m.ms_ssim = None
        sys.modules["pytorch_msssim"] = m
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_loss = types.ModuleType("timm.loss")

        class SoftTargetCrossEntropy:  # imported, never used by Shared
            pass

        timm_loss.SoftTargetCrossEntropy = SoftTargetCrossEntropy
        timm.loss = timm_loss
        sys.modules["timm"] = timm
        sys.modules["timm.loss"] = timm_loss
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        functional = types.ModuleType("torchvision.transforms.functional")

        class RandomResizedCrop:  # base class for util/crop.py:13; only the
            pass  # overridden staticmethod get_params is exercised

        transforms.RandomResizedCrop = RandomResizedCrop
        # util/crop.py:23 calls F._get_image_size(img) -> (width, height)
        functional._get_image_size = lambda img: (img.shape[-1], img.shape[-2])
        transforms.functional = functional
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional


def _load_ref(relpath: str, name: str):
    _install_stubs()
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_contrast():
    return _load_ref("util/contrast_loss.py", "_ref_contrast_loss")


@pytest.fixture(scope="module")
def ref_lars():
    return _load_ref("util/lars.py", "_ref_lars")


@pytest.fixture(scope="module")
def ref_lr_sched():
    return _load_ref("util/lr_sched.py", "_ref_lr_sched")


@pytest.fixture(scope="module")
def ref_pos_embed():
    return _load_ref("util/pos_embed.py", "_ref_pos_embed")


@pytest.fixture(scope="module")
def ref_crop():
    return _load_ref("util/crop.py", "_ref_crop")


@pytest.fixture(scope="module")
def ref_shared():
    return _load_ref("models_mae/MAE_ViT_Shared.py", "_ref_mae_shared")


# ---------------------------------------------------------------- NT-Xent


@pytest.mark.parametrize("cos_sim", [True, False])
@pytest.mark.parametrize("tau", [0.5, 0.1])
def test_ntxent_matches_reference(ref_contrast, tau, cos_sim):
    from cross_scale_mae_tpu.losses.ntxent import ntxent_loss

    rng = np.random.default_rng(7)
    b, d = 8, 16
    zi = rng.normal(size=(b, d)).astype(np.float32)
    zj = rng.normal(size=(b, d)).astype(np.float32)

    ref = ref_contrast.NTXentLoss(b, tau=tau, cos_sim=cos_sim)
    expected = ref(torch.from_numpy(zi), torch.from_numpy(zj)).item()
    got = float(ntxent_loss(jnp.asarray(zi), jnp.asarray(zj), tau=tau, cos_sim=cos_sim))
    assert got == pytest.approx(expected, rel=1e-5, abs=1e-6)


def test_ntxent_mask_structure_matches_reference(ref_contrast):
    """Our trace-time pos/neg index construction vs the reference's
    get_pos_and_neg_mask (contrast_loss.py:17-41)."""
    b = 6
    pos_mask, neg_mask = ref_contrast.get_pos_and_neg_mask(b)
    idx = np.arange(2 * b)
    pos_idx = np.where(idx < b, idx + b, idx - b)
    eye = np.eye(2 * b, dtype=bool)
    ours_pos = eye[pos_idx]
    ours_neg = ~(eye | ours_pos)
    np.testing.assert_array_equal(ours_pos, pos_mask.numpy())
    np.testing.assert_array_equal(ours_neg, neg_mask.numpy())


# ---------------------------------------------------------------- LARS


def test_lars_matches_reference_step_for_step(ref_lars):
    from cross_scale_mae_tpu.train.optim import lars

    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(8, 4)).astype(np.float32)
    b0 = rng.normal(size=(4,)).astype(np.float32)
    grads = [
        (rng.normal(size=(8, 4)).astype(np.float32),
         rng.normal(size=(4,)).astype(np.float32))
        for _ in range(5)
    ]
    lr, wd = 0.1, 1e-4

    # Reference: in-place torch steps (util/lars.py:27-57).
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = ref_lars.LARS([tw, tb], lr=lr, weight_decay=wd)
    for gw, gb in grads:
        tw.grad = torch.from_numpy(gw)
        tb.grad = torch.from_numpy(gb)
        opt.step()

    # Ours: functional optax transformation.
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    ours = lars(lr, weight_decay=wd)
    state = ours.init(params)
    for gw, gb in grads:
        updates, state = ours.update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params
        )
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- LR schedule


def test_lr_schedule_matches_reference(ref_lr_sched):
    from cross_scale_mae_tpu.train.schedule import warmup_half_cosine

    args = SimpleNamespace(lr=1.5e-3, min_lr=1e-6, warmup_epochs=5, epochs=100)
    steps_per_epoch = 10
    sched = warmup_half_cosine(args.lr, args.min_lr, args.warmup_epochs,
                               args.epochs, steps_per_epoch)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD(
        [{"params": [p], "lr": 0.0},
         {"params": [torch.nn.Parameter(torch.zeros(1))], "lr": 0.0,
          "lr_scale": 0.5}],
        lr=0.0,
    )
    for epoch in [0.0, 0.5, 3.7, 5.0, 42.3, 99.9]:
        expected = ref_lr_sched.adjust_learning_rate(opt, epoch, args)
        got = float(sched(jnp.asarray(epoch * steps_per_epoch)))
        # fp32 cos in the jitted schedule vs the reference's float64 math:
        # agrees to ~1e-5 relative at the decayed tail.
        assert got == pytest.approx(expected, rel=1e-4, abs=1e-10)
        # lr_scale semantics: reference multiplies group lr by lr_scale
        # (lr_sched.py:22-26); ours applies scale_by_tree the same way.
        assert opt.param_groups[1]["lr"] == pytest.approx(expected * 0.5)


# ---------------------------------------------------------------- pos embed


@pytest.mark.parametrize("cls_token", [False, True])
def test_sincos_pos_embed_matches_reference(ref_pos_embed, cls_token):
    from cross_scale_mae_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    expected = ref_pos_embed.get_2d_sincos_pos_embed(64, 8, cls_token=cls_token)
    got = np.asarray(get_2d_sincos_pos_embed(64, 8, cls_token=cls_token))
    np.testing.assert_allclose(got, expected.astype(np.float32),
                               rtol=1e-6, atol=1e-6)


def test_interpolate_pos_embed_matches_reference(ref_pos_embed):
    """Resolution transfer must be bit-faithful to the torch bicubic resample
    (A=-0.75 cubic convolution, align_corners=False) or released-checkpoint
    transfer silently drifts (util/pos_embed.py:92-125)."""
    from cross_scale_mae_tpu.ops.pos_embed import interpolate_pos_embed

    rng = np.random.default_rng(11)
    d, old_grid, new_grid = 32, 8, 14
    ckpt_pe = rng.normal(size=(1, 1 + old_grid * old_grid, d)).astype(np.float32)

    model = SimpleNamespace(
        patch_embed=SimpleNamespace(num_patches=new_grid * new_grid),
        pos_embed=torch.zeros(1, 1 + new_grid * new_grid, d),
    )
    ckpt = {"pos_embed": torch.from_numpy(ckpt_pe.copy())}
    ref_pos_embed.interpolate_pos_embed(model, ckpt)
    expected = ckpt["pos_embed"].numpy()

    got = np.asarray(interpolate_pos_embed(jnp.asarray(ckpt_pe), new_grid))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- crop boxes


def test_crop_box_distribution_matches_reference(ref_crop):
    """The reference samples (i, j, h, w) per image with torch RNG
    (util/crop.py:21-41); ours vectorizes the same math with jax PRNG.
    RNG streams differ, so compare the distributions."""
    from cross_scale_mae_tpu.ops.image import sample_crop_boxes

    n, size = 20000, 128
    scale, ratio = (0.25, 0.75), (3.0 / 4.0, 4.0 / 3.0)

    torch.manual_seed(0)
    img = torch.zeros(3, size, size)
    ref_samples = np.array(
        [ref_crop.RandomResizedCrop.get_params(img, scale, ratio)
         for _ in range(n)],
        dtype=np.float64,
    )  # columns: i, j, h, w

    boxes = np.asarray(sample_crop_boxes(
        jax.random.PRNGKey(0), n, size, size, scale, ratio))

    for col, name in enumerate(["i", "j", "h", "w"]):
        r, o = ref_samples[:, col], boxes[:, col]
        # Reference h/w are rounded ints and i~randint(0, H-h+1); ours are
        # continuous. Means/stds agree to sampling noise (~1%).
        assert np.mean(o) == pytest.approx(np.mean(r), rel=0.02, abs=0.5), name
        assert np.std(o) == pytest.approx(np.std(r), rel=0.03, abs=0.5), name
    # Area fraction must land inside the configured scale range.
    frac = boxes[:, 2] * boxes[:, 3] / (size * size)
    assert frac.min() >= scale[0] * ratio[0] * 0.99
    assert np.mean(frac) == pytest.approx(
        np.mean(ref_samples[:, 2] * ref_samples[:, 3] / (size * size)), rel=0.02)


# ---------------------------------------------------------------- MAE shared


def _shared(ref_shared, loss="mse", norm_pix_loss=False):
    return ref_shared.MAE_ViT_Shared(norm_pix_loss=norm_pix_loss, loss=loss)


def test_patchify_unpatchify_match_reference(ref_shared):
    from cross_scale_mae_tpu.ops.patchify import patchify, unpatchify

    rng = np.random.default_rng(5)
    imgs = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)  # NHWC
    m = _shared(ref_shared)
    ref_patches = m.patchify(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), p=4, c=3).numpy()
    got = np.asarray(patchify(jnp.asarray(imgs), 4))
    np.testing.assert_allclose(got, ref_patches, rtol=1e-6, atol=1e-6)

    back = m.unpatchify(torch.from_numpy(ref_patches), p=4, c=3)
    ours_back = np.asarray(unpatchify(jnp.asarray(got), 4, 3))
    np.testing.assert_allclose(
        ours_back, back.permute(0, 2, 3, 1).numpy(), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("norm_pix", [False, True])
def test_process_target_matches_reference(ref_shared, norm_pix):
    from cross_scale_mae_tpu.losses.recon import process_target

    rng = np.random.default_rng(9)
    imgs = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    m = _shared(ref_shared, norm_pix_loss=norm_pix)
    expected = m.process_target(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), 4, 3).numpy()
    got = np.asarray(process_target(jnp.asarray(imgs), 4, 3, norm_pix))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["mse", "l2", "mae", "l1", "bce"])
@pytest.mark.parametrize("with_mask", [True, False])
def test_recon_losses_match_reference(ref_shared, name, with_mask):
    from cross_scale_mae_tpu.losses.recon import recon_loss

    rng = np.random.default_rng(13)
    n, l, d = 4, 16, 48
    target = rng.normal(size=(n, l, d)).astype(np.float32)
    pred = rng.normal(size=(n, l, d)).astype(np.float32)
    mask = (rng.uniform(size=(n, l)) < 0.75).astype(np.float32)
    mask[0, 0] = 1.0  # ensure nonzero

    m = _shared(ref_shared, loss=name)
    ref_fn = getattr(m, f"forward_loss_{name}")
    expected = ref_fn(
        torch.from_numpy(target), torch.from_numpy(pred),
        mask=torch.from_numpy(mask) if with_mask else None).item()
    got = float(recon_loss(
        name, jnp.asarray(target), jnp.asarray(pred),
        mask=jnp.asarray(mask) if with_mask else None))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-6)


def test_random_masking_matches_reference_on_same_noise(ref_shared):
    """Inject identical noise into both implementations (the reference draws
    torch.rand internally, MAE_ViT_Shared.py:66) and require identical
    gather/mask/restore outputs."""
    from cross_scale_mae_tpu.ops.masking import random_masking

    rng = np.random.default_rng(17)
    n, l, d = 3, 16, 8
    x = rng.normal(size=(n, l, d)).astype(np.float32)
    noise = rng.uniform(size=(n, l)).astype(np.float32)
    mask_ratio = 0.75
    len_keep = int(l * (1 - mask_ratio))

    m = _shared(ref_shared)
    with mock.patch.object(torch, "rand",
                           lambda *a, **k: torch.from_numpy(noise.copy())):
        ref_xm, ref_mask, ref_restore = m.random_masking(
            torch.from_numpy(x), mask_ratio)

    xm, mask, restore = random_masking(
        jnp.asarray(x), len_keep, noise=jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(xm), ref_xm.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    np.testing.assert_array_equal(np.asarray(restore), ref_restore.numpy())
