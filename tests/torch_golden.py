"""Independent PyTorch golden implementations for parity testing.

These are written fresh from the documented semantics in SURVEY.md §2.3/§3
(binomial blur-pool, align-corners upsample, ResNet-UNet generator, PatchGAN,
Gaussian SSIM) as a numerical oracle for the JAX implementations — the
reference module itself cannot be imported here (its torchvision dependency
is absent from this environment). Test-only code; torch runs on CPU.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BINOMIAL = {
    1: [1.0],
    2: [1.0, 1.0],
    3: [1.0, 2.0, 1.0],
    4: [1.0, 3.0, 3.0, 1.0],
    5: [1.0, 4.0, 6.0, 4.0, 1.0],
    6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
    7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0],
}


def binomial_filter(filt_size: int) -> torch.Tensor:
    a = torch.tensor(BINOMIAL[filt_size], dtype=torch.float32)
    f = a[:, None] * a[None, :]
    return f / f.sum()


class GoldDownsample(nn.Module):
    def __init__(self, channels: int, filt_size: int = 3, stride: int = 2, pad_type: str = "reflect"):
        super().__init__()
        self.stride = stride
        self.channels = channels
        pad = (filt_size - 1) / 2
        p = [int(pad), int(np.ceil(pad))] * 2
        self.pad = {"reflect": nn.ReflectionPad2d, "replicate": nn.ReplicationPad2d,
                    "zero": nn.ZeroPad2d}[pad_type](p)
        self.register_buffer("filt", binomial_filter(filt_size)[None, None].repeat(channels, 1, 1, 1))

    def forward(self, x):
        return F.conv2d(self.pad(x), self.filt, stride=self.stride, groups=self.channels)


class GoldUpsampleAA(nn.Module):
    def __init__(self, channels: int, filt_size: int = 3, stride: int = 2, pad_type: str = "reflect"):
        super().__init__()
        self.stride = stride
        self.channels = channels
        pad = (filt_size - 1) / 2
        p = [int(pad), int(np.ceil(pad))] * 2
        self.pad = {"reflect": nn.ReflectionPad2d, "replicate": nn.ReplicationPad2d,
                    "zero": nn.ZeroPad2d}[pad_type](p)
        self.register_buffer("filt", binomial_filter(filt_size)[None, None].repeat(channels, 1, 1, 1))

    def forward(self, x):
        y = F.interpolate(x, scale_factor=self.stride, mode="bilinear", align_corners=True)
        return F.conv2d(self.pad(y), self.filt, stride=1, groups=self.channels)


class GoldResnetBlock(nn.Module):
    def __init__(self, dim: int, use_bias: bool = True):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1),
            nn.Conv2d(dim, dim, 3, bias=use_bias),
            nn.InstanceNorm2d(dim),
            nn.ReLU(True),
            nn.ReflectionPad2d(1),
            nn.Conv2d(dim, dim, 3, bias=use_bias),
            nn.InstanceNorm2d(dim),
        )

    def forward(self, x):
        return x + self.conv_block(x)


class GoldGenerator(nn.Module):
    """ngf=64, n_blocks configurable, with anti-aliasing flags."""

    def __init__(self, input_nc=1, output_nc=3, ngf=64, n_blocks=9,
                 no_antialias=False, no_antialias_up=False):
        super().__init__()
        ub = True  # instance norm ⇒ conv bias on
        sd = 2 if no_antialias else 1
        self.inc = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7, bias=ub),
            nn.InstanceNorm2d(ngf), nn.ReLU(True),
        )
        self.down1 = nn.Sequential(
            nn.Conv2d(ngf, ngf * 2, 3, sd, 1, bias=ub), nn.InstanceNorm2d(ngf * 2), nn.ReLU(True)
        )
        self.down1_down = None if no_antialias else GoldDownsample(ngf * 2)
        self.down2 = nn.Sequential(
            nn.Conv2d(ngf * 2, ngf * 4, 3, sd, 1, bias=ub), nn.InstanceNorm2d(ngf * 4), nn.ReLU(True)
        )
        self.down2_down = None if no_antialias else GoldDownsample(ngf * 4)
        self.resblocks = nn.Sequential(*[GoldResnetBlock(ngf * 4, ub) for _ in range(n_blocks)])
        if no_antialias_up:
            self.up1_up = nn.ConvTranspose2d(ngf * 4, ngf * 4, 3, 2, 1, output_padding=1, bias=ub)
            self.up2_up = nn.ConvTranspose2d(ngf * 2, ngf * 2, 3, 2, 1, output_padding=1, bias=ub)
        else:
            self.up1_up = GoldUpsampleAA(ngf * 4)
            self.up2_up = GoldUpsampleAA(ngf * 2)
        self.up1_conv = nn.Sequential(
            nn.Conv2d(ngf * 6, ngf * 2, 3, 1, 1, bias=ub), nn.InstanceNorm2d(ngf * 2), nn.ReLU(True)
        )
        self.up2_conv = nn.Sequential(
            nn.Conv2d(ngf * 3, ngf, 3, 1, 1, bias=ub), nn.InstanceNorm2d(ngf), nn.ReLU(True)
        )
        self.outc = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()
        )

    def forward(self, x):
        x0 = self.inc(x)
        x1 = self.down1(x0)
        if self.down1_down is not None:
            x1 = self.down1_down(x1)
        x2 = self.down2(x1)
        if self.down2_down is not None:
            x2 = self.down2_down(x2)
        x3 = self.resblocks(x2)
        y = self.up1_up(x3)
        if y.shape[-2:] != x1.shape[-2:]:
            y = F.interpolate(y, size=x1.shape[-2:], mode="bilinear", align_corners=True)
        y = self.up1_conv(torch.cat([y, x1], dim=1))
        y = self.up2_up(y)
        if y.shape[-2:] != x0.shape[-2:]:
            y = F.interpolate(y, size=x0.shape[-2:], mode="bilinear", align_corners=True)
        y = self.up2_conv(torch.cat([y, x0], dim=1))
        return self.outc(y)


class GoldDiscriminator(nn.Module):
    def __init__(self, input_nc=4, ndf=64, n_layers=3):
        super().__init__()
        ub = True
        seq = [nn.Conv2d(input_nc, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
        nf = 1
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(2**n, 8)
            seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 2, 1, bias=ub),
                    nn.InstanceNorm2d(ndf * nf), nn.LeakyReLU(0.2, True)]
        nf_prev, nf = nf, min(2**n_layers, 8)
        seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 1, 1, bias=ub),
                nn.InstanceNorm2d(ndf * nf), nn.LeakyReLU(0.2, True)]
        seq += [nn.Conv2d(ndf * nf, 1, 4, 1, 1)]
        self.model = nn.Sequential(*seq)

    def forward(self, x):
        return self.model(x)


def gold_ssim(img1: torch.Tensor, img2: torch.Tensor, window_size: int = 11) -> torch.Tensor:
    """Differentiable Gaussian-window SSIM, zero-padded 'same' (ref style)."""
    c = img1.shape[1]
    coords = torch.arange(window_size, dtype=torch.float64) - (window_size - 1) / 2.0
    g = torch.exp(-(coords**2) / (2 * 1.5**2))
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :])[None, None].expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, win, padding=pad, groups=c)
    mu2 = F.conv2d(img2, win, padding=pad, groups=c)
    s11 = F.conv2d(img1 * img1, win, padding=pad, groups=c) - mu1 * mu1
    s22 = F.conv2d(img2 * img2, win, padding=pad, groups=c) - mu2 * mu2
    s12 = F.conv2d(img1 * img2, win, padding=pad, groups=c) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s11 + s22 + c2))
    return smap.mean()


def _uniform_valid(x: np.ndarray, win: int) -> np.ndarray:
    """Valid-mode uniform filter via cumulative sums (H,W)."""
    k = np.ones((win, win), dtype=np.float64) / (win * win)
    from numpy.lib.stride_tricks import sliding_window_view

    v = sliding_window_view(x, (win, win))
    return (v * k).sum(axis=(-1, -2))


def skimage_ssim_numpy(pred: np.ndarray, gt: np.ndarray, win: int = 7, data_range: float = 1.0) -> float:
    """Per-channel skimage-default SSIM (float64), averaged over channels."""
    assert pred.ndim == 3
    npix = win * win
    cov_norm = npix / (npix - 1.0)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(pred.shape[2]):
        x = pred[:, :, ch].astype(np.float64)
        y = gt[:, :, ch].astype(np.float64)
        ux, uy = _uniform_valid(x, win), _uniform_valid(y, win)
        uxx, uyy, uxy = _uniform_valid(x * x, win), _uniform_valid(y * y, win), _uniform_valid(x * y, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))
