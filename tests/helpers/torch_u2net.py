"""Torch U^2-Net oracle for ONNX-import parity tests.

A CPU torch implementation of the published U^2-Net architecture (Qin et
al., Pattern Recognition 2020) with the module naming rembg's distributed
checkpoints use in their state dicts / ONNX initializer names
(stage1.rebnconvin.conv_s1.weight, ...). The reference app consumes those
checkpoints through onnxruntime (reference app/processing/rembg_infer.py:
52-54); since neither network access nor onnxruntime exists here, this
model plays the oracle role: its randomly-initialized state dict is written
through image_segmenter_tpu.models.onnx_writer into a real-layout .onnx,
imported into Flax, and the two forwards are compared.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class REBNCONV(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, dirate: int = 1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(in_ch, out_ch, 3, padding=dirate, dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(out_ch)
        self.relu_s1 = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu_s1(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear",
                         align_corners=False)


class RSU(nn.Module):
    """Residual U-block of the given height (RSU-7 .. RSU-4)."""

    def __init__(self, height: int, in_ch: int, mid_ch: int, out_ch: int):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(in_ch, out_ch, 1)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, 1)
        for i in range(2, height):
            setattr(self, f"rebnconv{i}", REBNCONV(mid_ch, mid_ch, 1))
        setattr(self, f"rebnconv{height}", REBNCONV(mid_ch, mid_ch, 2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(mid_ch * 2, mid_ch, 1))
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, 1)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc = []
        hx = hxin
        for i in range(1, self.height):
            hx = getattr(self, f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < self.height - 1:
                hx = self.pool(hx)
        hx = getattr(self, f"rebnconv{self.height}")(hx)
        for i in range(self.height - 1, 0, -1):
            skip = enc[i - 1]
            if hx.shape[2:] != skip.shape[2:]:
                hx = _up_like(hx, skip)
            hx = getattr(self, f"rebnconv{i}d")(torch.cat([hx, skip], 1))
        return hx + hxin


class RSU4F(nn.Module):
    def __init__(self, in_ch: int, mid_ch: int, out_ch: int):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch, 1)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, 1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, 2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, 4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, 8)
        self.rebnconv3d = REBNCONV(mid_ch * 2, mid_ch, 4)
        self.rebnconv2d = REBNCONV(mid_ch * 2, mid_ch, 2)
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat([hx4, hx3], 1))
        hx2d = self.rebnconv2d(torch.cat([hx3d, hx2], 1))
        hx1d = self.rebnconv1d(torch.cat([hx2d, hx1], 1))
        return hx1d + hxin


class U2NET(nn.Module):
    """Full U^2-Net, or U2NETP with small=True. Returns sigmoid(d0..d6)."""

    def __init__(self, in_ch: int = 3, out_ch: int = 1, small: bool = False):
        super().__init__()
        if small:
            enc = [(7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64)]
            f_mid, f_out = 16, 64
            dec = [(4, 16, 64), (5, 16, 64), (6, 16, 64), (7, 16, 64)]
            dec_in = [128, 128, 128, 128]
            f_dec_in = 128
        else:
            enc = [(7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512)]
            f_mid, f_out = 256, 512
            dec = [(4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)]
            dec_in = [1024, 512, 256, 128]
            f_dec_in = 1024
        chans = [in_ch] + [c for (_h, _m, c) in enc]
        for i, (h, m, c) in enumerate(enc, start=1):
            setattr(self, f"stage{i}", RSU(h, chans[i - 1], m, c))
        self.stage5 = RSU4F(chans[4], f_mid, f_out)
        self.stage6 = RSU4F(f_out, f_mid, f_out)
        self.stage5d = RSU4F(f_dec_in, f_mid, f_out)
        for (h, m, c), ic, i in zip(dec, dec_in, (4, 3, 2, 1)):
            setattr(self, f"stage{i}d", RSU(h, ic, m, c))
        side_in = [dec[3][2], dec[2][2], dec[1][2], dec[0][2], f_out, f_out]
        for i, c in enumerate(side_in, start=1):
            setattr(self, f"side{i}", nn.Conv2d(c, out_ch, 3, padding=1))
        self.outconv = nn.Conv2d(6 * out_ch, out_ch, 1)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        skips = []
        hx = x
        for i in range(1, 5):
            hx = getattr(self, f"stage{i}")(hx)
            skips.append(hx)
            hx = self.pool(hx)
        hx5 = self.stage5(hx)
        hx6 = self.stage6(self.pool(hx5))
        hx5d = self.stage5d(torch.cat([_up_like(hx6, hx5), hx5], 1))
        decs = [hx5d]
        hx = hx5d
        for i in (4, 3, 2, 1):
            skip = skips[i - 1]
            hx = getattr(self, f"stage{i}d")(torch.cat([_up_like(hx, skip), skip], 1))
            decs.append(hx)
        in_sz = x
        ds = []
        for i, feat in zip(range(1, 7), (decs[4], decs[3], decs[2], decs[1], decs[0], hx6)):
            d = getattr(self, f"side{i}")(feat)
            ds.append(_up_like(d, in_sz) if d.shape[2:] != in_sz.shape[2:] else d)
        d0 = self.outconv(torch.cat(ds, 1))
        return [torch.sigmoid(d) for d in (d0, *ds)]
