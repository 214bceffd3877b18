"""Faithful torch transcription of pytorch_msssim's ssim/ms_ssim formula.

pytorch_msssim is not installed in this image; the reference depends on it for
its ssim-family losses (models_mae/MAE_ViT_Shared.py:4,165-267) and eval
metrics (util/metrics.py:36-46). This module transcribes the published
algorithm (github.com/VainF/pytorch-msssim, v0.2.x `ssim.py`) so golden
parity tests can compare cross_scale_mae_tpu.ops.ssim against torch-computed
values: 1-D separable Gaussian window (size 11, sigma 1.5), K=(0.01, 0.03),
valid-padding depthwise convs, per-channel spatial means, and the MS-SSIM
pyramid with `avg_pool2d(kernel_size=2, padding=[s % 2])` between levels.

Test helper only — not product code.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss_1d(size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(size, dtype=torch.float64)
    coords -= size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g.reshape(1, 1, -1)


def _gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    """Separable depthwise blur over the two spatial dims, valid padding."""
    c = x.shape[1]
    out = F.conv2d(x, win.expand(c, 1, 1, -1).to(x.dtype), groups=c)
    out = F.conv2d(out, win.expand(c, 1, 1, -1).transpose(2, 3).to(x.dtype),
                   groups=c)
    return out


def _ssim_per_channel(x, y, data_range, win, k=(0.01, 0.03)):
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return torch.flatten(ssim_map, 2).mean(-1), torch.flatten(cs_map, 2).mean(-1)


def ssim(x, y, data_range=1.0, size_average=True, win_size=11, win_sigma=1.5,
         nonnegative_ssim=False):
    """x, y: (N, C, H, W) torch tensors."""
    win = _fspecial_gauss_1d(win_size, win_sigma)
    per_channel, _ = _ssim_per_channel(x, y, data_range, win)
    if nonnegative_ssim:
        per_channel = torch.relu(per_channel)
    return per_channel.mean() if size_average else per_channel.mean(1)


def ms_ssim(x, y, data_range=1.0, size_average=True, win_size=11,
            win_sigma=1.5, weights=MS_SSIM_WEIGHTS):
    smaller = min(x.shape[-2:])
    assert smaller > (win_size - 1) * (2 ** (len(weights) - 1))
    win = _fspecial_gauss_1d(win_size, win_sigma)
    w = torch.tensor(weights, dtype=x.dtype)
    mcs = []
    per_channel = None
    for level in range(len(weights)):
        per_channel, cs = _ssim_per_channel(x, y, data_range, win)
        if level < len(weights) - 1:
            mcs.append(torch.relu(cs))
            padding = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=padding)
            y = F.avg_pool2d(y, kernel_size=2, padding=padding)
    per_channel = torch.relu(per_channel)
    stacked = torch.stack(mcs + [per_channel], dim=0)  # (levels, N, C)
    out = torch.prod(stacked ** w.view(-1, 1, 1), dim=0)
    return out.mean() if size_average else out.mean(1)
