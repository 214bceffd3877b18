"""VGG16 weight-importer golden tests (previously dead-untested).

Builds a torchvision-shaped VGG16 ``features`` state dict in-test (conv
layers at indices 0,2,5,7,10,12,14,17,19,21 — the `features[:23]` slice the
reference's util/vggloss.py:11-14 taps), imports it with
load_torch_vgg16_features, and checks activation-level and loss-level parity
against a torch forward that replicates the reference's block slicing
(features[:4], [4:9], [9:16], [16:23]). A wrong conv index map or a wrong
OIHW->HWIO transpose fails these loudly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from cross_scale_mae_tpu.losses.perceptual import (  # noqa: E402
    load_torch_vgg16_features,
    perceptual_loss,
    vgg16_features,
)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _build_torch_features() -> nn.Sequential:
    """torchvision.models.vgg16().features[:23] layout, random weights."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512]
    layers: list[nn.Module] = []
    c_in = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(c_in, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = v
    return nn.Sequential(*layers)


@pytest.fixture(scope="module")
def vgg_fixture(tmp_path_factory):
    torch.manual_seed(5)
    features = _build_torch_features().eval()
    # Scale weights down so 4 stacked convs don't blow up activations.
    with torch.no_grad():
        for m in features:
            if isinstance(m, nn.Conv2d):
                m.weight.mul_(0.3)

    class Wrapper(nn.Module):  # state_dict keys become "features.N.weight"
        def __init__(self):
            super().__init__()
            self.features = features

    path = tmp_path_factory.mktemp("vgg") / "vgg16.pth"
    torch.save(Wrapper().state_dict(), path)
    return features, str(path)


def _torch_taps(features: nn.Sequential, x_nchw: torch.Tensor):
    """The reference's four blocks (vggloss.py:11-14) applied in sequence."""
    taps = []
    with torch.no_grad():
        x = x_nchw
        for lo, hi in ((0, 4), (4, 9), (9, 16), (16, 23)):
            x = features[lo:hi](x)
            taps.append(x)
    return taps


def test_vgg_importer_activation_parity(vgg_fixture):
    features, path = vgg_fixture
    params = load_torch_vgg16_features(path)

    rng = np.random.default_rng(31)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    ref_taps = _torch_taps(features, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_taps = vgg16_features(params, jnp.asarray(x))

    assert len(got_taps) == len(ref_taps) == 4
    for i, (got, ref) in enumerate(zip(got_taps, ref_taps)):
        ref_nhwc = ref.permute(0, 2, 3, 1).numpy()
        assert got.shape == ref_nhwc.shape, f"tap {i}"
        np.testing.assert_allclose(
            np.asarray(got), ref_nhwc, atol=1e-4, err_msg=f"tap {i}")


def test_vgg_importer_accepts_bare_features_dump(vgg_fixture, tmp_path):
    features, path = vgg_fixture
    bare = {k: v for k, v in features.state_dict().items()}  # "N.weight" keys
    bare_path = tmp_path / "bare.pth"
    torch.save(bare, bare_path)
    a = load_torch_vgg16_features(path)
    b = load_torch_vgg16_features(str(bare_path))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]["kernel"]),
                                      np.asarray(b[k]["kernel"]))


@pytest.mark.parametrize("style", [(), (0, 1, 2, 3)])
def test_perceptual_loss_matches_reference_forward(vgg_fixture, style):
    """Loss-level parity vs the reference VGGPerceptualLoss.forward math
    (util/vggloss.py:28-55) with resize disabled (the resize kernels differ
    between torch bilinear and jax linear only at the 1e-6 level, but
    disabling isolates the importer + trunk under test)."""
    features, path = vgg_fixture
    params = load_torch_vgg16_features(path)

    rng = np.random.default_rng(37)
    pred = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    target = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    mean = torch.tensor(_IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(_IMAGENET_STD).view(1, 3, 1, 1)
    tp = (torch.from_numpy(pred.transpose(0, 3, 1, 2)) - mean) / std
    tt = (torch.from_numpy(target.transpose(0, 3, 1, 2)) - mean) / std
    loss_t = 0.0
    x, y = tp, tt
    with torch.no_grad():
        for i, (lo, hi) in enumerate(((0, 4), (4, 9), (9, 16), (16, 23))):
            x, y = features[lo:hi](x), features[lo:hi](y)
            loss_t = loss_t + torch.nn.functional.l1_loss(x, y)
            if i in style:
                ax = x.reshape(x.shape[0], x.shape[1], -1)
                ay = y.reshape(y.shape[0], y.shape[1], -1)
                loss_t = loss_t + torch.nn.functional.l1_loss(
                    ax @ ax.permute(0, 2, 1), ay @ ay.permute(0, 2, 1))

    got = float(perceptual_loss(
        params, jnp.asarray(pred), jnp.asarray(target),
        style_layers=style, resize_to=None))
    assert got == pytest.approx(float(loss_t), rel=1e-4, abs=1e-5)
