"""Golden parity for ops/ssim.py against a torch transcription of
pytorch_msssim (tests/torch_msssim_ref.py), plus end-to-end parity of the
reference's forward_loss_ssim/ms_ssim (MAE_ViT_Shared.py:165-267) with the
transcription patched in for its pytorch_msssim import.

Covers: plain + anticorrelated (negative-SSIM) inputs, nonnegative_ssim both
ways, size_average=False, data_range 255, and the odd-size avg-pool path in
the MS-SSIM pyramid (170 -> 85 -> 43 -> 22 -> 11 hits odd dims twice).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import torch_msssim_ref as tref  # noqa: E402

from cross_scale_mae_tpu.ops.ssim import ms_ssim, ssim  # noqa: E402


def _pair(rng, n=2, c=3, h=32, w=32, anticorrelated=False):
    x = rng.uniform(size=(n, c, h, w)).astype(np.float32)
    if anticorrelated:
        y = (1.0 - x + 0.05 * rng.uniform(size=x.shape)).clip(0, 1)
        y = y.astype(np.float32)
    else:
        y = (x + 0.1 * rng.normal(size=x.shape)).clip(0, 1).astype(np.float32)
    return x, y


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


@pytest.mark.parametrize("anticorrelated", [False, True])
@pytest.mark.parametrize("nonneg", [False, True])
def test_ssim_matches_torch_golden(anticorrelated, nonneg):
    rng = np.random.default_rng(21)
    x, y = _pair(rng, anticorrelated=anticorrelated)
    expected = tref.ssim(torch.from_numpy(x), torch.from_numpy(y),
                         nonnegative_ssim=nonneg).item()
    got = float(ssim(_nhwc(x), _nhwc(y), nonnegative_ssim=nonneg))
    assert got == pytest.approx(expected, abs=2e-5)
    if anticorrelated and not nonneg:
        assert expected < 0  # the case nonnegative_ssim exists to clamp


def test_ssim_per_image_and_data_range():
    rng = np.random.default_rng(22)
    x, y = _pair(rng, n=3)
    expected = tref.ssim(torch.from_numpy(x) * 255, torch.from_numpy(y) * 255,
                         data_range=255, size_average=False).numpy()
    got = np.asarray(ssim(_nhwc(x) * 255, _nhwc(y) * 255, data_range=255,
                          size_average=False))
    assert got.shape == (3,)
    np.testing.assert_allclose(got, expected, atol=2e-5)


@pytest.mark.parametrize("hw", [(192, 192), (170, 170), (170, 182)])
def test_ms_ssim_matches_torch_golden(hw):
    rng = np.random.default_rng(23)
    x, y = _pair(rng, h=hw[0], w=hw[1])
    expected = tref.ms_ssim(torch.from_numpy(x), torch.from_numpy(y)).item()
    got = float(ms_ssim(_nhwc(x), _nhwc(y)))
    assert got == pytest.approx(expected, abs=5e-5)


def test_ms_ssim_size_average_false():
    rng = np.random.default_rng(24)
    x, y = _pair(rng, n=2, h=176, w=176)
    expected = tref.ms_ssim(torch.from_numpy(x), torch.from_numpy(y),
                            size_average=False).numpy()
    got = np.asarray(ms_ssim(_nhwc(x), _nhwc(y), size_average=False))
    np.testing.assert_allclose(got, expected, atol=5e-5)


# ------------------------------------------------- reference loss parity


@pytest.mark.parametrize("name", ["ssim", "ms_ssim", "mse_ssim", "mse_ms_ssim"])
@pytest.mark.parametrize("with_mask", [True, False])
def test_reference_ssim_losses_match(name, with_mask):
    """forward_loss_{ssim,ms_ssim,mse_ssim,mse_ms_ssim} from the actual
    reference MAE_ViT_Shared, with the pytorch_msssim import satisfied by the
    transcription, vs our recon_loss."""
    from tests.test_reference_parity import REF, _load_ref

    if not REF.exists():
        pytest.skip("reference not mounted")
    ref_shared = _load_ref("models_mae/MAE_ViT_Shared.py", "_ref_mae_shared")
    ref_shared.ssim = tref.ssim
    ref_shared.ms_ssim = tref.ms_ssim

    from cross_scale_mae_tpu.losses.recon import recon_loss

    rng = np.random.default_rng(25)
    # ms_ssim needs unpatchified side > 160: grid 44 * patch 4 = 176.
    grid, p, c = (44, 4, 3) if "ms" in name else (8, 4, 3)
    n, l, d = 2, grid * grid, p * p * c
    target = rng.normal(size=(n, l, d)).astype(np.float32)
    pred = rng.normal(size=(n, l, d)).astype(np.float32)
    mask = (rng.uniform(size=(n, l)) < 0.75).astype(np.float32)
    mask[0, 0] = 1.0

    m = ref_shared.MAE_ViT_Shared(loss=name)
    expected = getattr(m, f"forward_loss_{name}")(
        torch.from_numpy(target), torch.from_numpy(pred),
        mask=torch.from_numpy(mask) if with_mask else None,
        patch_embed_psize=p, input_channels=c).item()
    got = float(recon_loss(
        name, jnp.asarray(target), jnp.asarray(pred),
        mask=jnp.asarray(mask) if with_mask else None,
        patch_size=p, channels=c))
    assert got == pytest.approx(expected, rel=1e-4, abs=5e-5)
