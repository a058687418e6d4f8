"""U^2-Net family in Flax: U2NET, U2NETP, ISNet — TPU-native CNN inference.

Replaces the onnxruntime C++ engine behind rembg (reference
rembg_infer.py:9,52-54). Architectures follow the public U^2-Net (Qin et al.,
PR 2020) and DIS/ISNet (Qin et al., ECCV 2022) definitions so the
rembg-distributed ONNX checkpoints map onto these modules parameter-for-
parameter (see onnx_import.py).

TPU-first notes:
- NHWC layout throughout (TPU-preferred); convs run in bfloat16 on the MXU
  with float32 accumulation when `half=True` (default for inference), BN is
  folded at load time into conv scale/bias where weights are imported.
- Bilinear up/downsampling uses align_corners=False half-pixel sampling,
  matching torch F.interpolate / ONNX Resize as exported by rembg models.
- Everything is shape-static per (H, W) so one compile serves a session.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn


def upsample_like(x: jnp.ndarray, ref_hw) -> jnp.ndarray:
    """Bilinear resize to ref spatial size (torch align_corners=False)."""
    b, h, w, c = x.shape
    th, tw = ref_hw
    if (h, w) == (th, tw):
        return x
    return jax.image.resize(x, (b, th, tw, c), method="bilinear")


class REBNCONV(nn.Module):
    """conv3x3(dilation d) + BN + ReLU — the U^2-Net building block."""

    out_ch: int
    dirate: int = 1
    half: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.bfloat16 if self.half else jnp.float32
        y = nn.Conv(self.out_ch, (3, 3), kernel_dilation=self.dirate,
                    padding=self.dirate, dtype=dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(y)
        return nn.relu(y).astype(dtype)


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding=((0, 1), (0, 1))
                       if (x.shape[1] % 2 or x.shape[2] % 2) else ((0, 0), (0, 0)))


class RSU(nn.Module):
    """Residual U-block of a given height (RSU-7 ... RSU-4)."""

    height: int
    mid_ch: int
    out_ch: int
    half: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_ch, 1, self.half, name="rebnconvin")(x, train)

        # encoder
        enc = []
        hx = hxin
        for i in range(1, self.height):
            ch = self.mid_ch
            hx = REBNCONV(ch, 1, self.half, name=f"rebnconv{i}")(hx, train)
            enc.append(hx)
            if i < self.height - 1:
                hx = _maxpool2(hx)
        # bottom (dilated)
        hx = REBNCONV(self.mid_ch, 2, self.half,
                      name=f"rebnconv{self.height}")(hx, train)

        # decoder
        for i in range(self.height - 1, 0, -1):
            skip = enc[i - 1]
            hx = upsample_like(hx, skip.shape[1:3]) if hx.shape[1:3] != skip.shape[1:3] else hx
            ch = self.out_ch if i == 1 else self.mid_ch
            hx = REBNCONV(ch, 1, self.half,
                          name=f"rebnconv{i}d")(jnp.concatenate([hx, skip], -1), train)
        return hx + hxin


class RSU4F(nn.Module):
    """Dilated (pool-free) residual U-block."""

    mid_ch: int
    out_ch: int
    half: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_ch, 1, self.half, name="rebnconvin")(x, train)
        hx1 = REBNCONV(self.mid_ch, 1, self.half, name="rebnconv1")(hxin, train)
        hx2 = REBNCONV(self.mid_ch, 2, self.half, name="rebnconv2")(hx1, train)
        hx3 = REBNCONV(self.mid_ch, 4, self.half, name="rebnconv3")(hx2, train)
        hx4 = REBNCONV(self.mid_ch, 8, self.half, name="rebnconv4")(hx3, train)
        hx3d = REBNCONV(self.mid_ch, 4, self.half,
                        name="rebnconv3d")(jnp.concatenate([hx4, hx3], -1), train)
        hx2d = REBNCONV(self.mid_ch, 2, self.half,
                        name="rebnconv2d")(jnp.concatenate([hx3d, hx2], -1), train)
        hx1d = REBNCONV(self.out_ch, 1, self.half,
                        name="rebnconv1d")(jnp.concatenate([hx2d, hx1], -1), train)
        return hx1d + hxin


class U2NET(nn.Module):
    """Full U^2-Net (or U2NETP with small=True). out_ch=1 for saliency."""

    out_ch: int = 1
    small: bool = False
    half: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.small:  # U2NETP: every stage mid=16, out=64
            cfg_enc = [(7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64)]
            f_mid, f_out = 16, 64
            cfg_dec = [(4, 16, 64), (5, 16, 64), (6, 16, 64), (7, 16, 64)]
        else:
            cfg_enc = [(7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512)]
            f_mid, f_out = 256, 512
            cfg_dec = [(4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)]

        sides = []
        skips = []
        hx = x
        for i, (height, mid, out) in enumerate(cfg_enc, start=1):
            hx = RSU(height, mid, out, self.half, name=f"stage{i}")(hx, train)
            skips.append(hx)
            hx = _maxpool2(hx)
        hx5 = RSU4F(f_mid, f_out, self.half, name="stage5")(hx, train)
        hx = _maxpool2(hx5)
        hx6 = RSU4F(f_mid, f_out, self.half, name="stage6")(hx, train)

        # decoder
        hx6up = upsample_like(hx6, hx5.shape[1:3])
        hx5d = RSU4F(f_mid, f_out, self.half,
                     name="stage5d")(jnp.concatenate([hx6up, hx5], -1), train)
        dec = [hx5d]
        hx = hx5d
        for i, (height, mid, out) in zip((4, 3, 2, 1), cfg_dec):
            skip = skips[i - 1]
            hxup = upsample_like(hx, skip.shape[1:3])
            hx = RSU(height, mid, out, self.half,
                     name=f"stage{i}d")(jnp.concatenate([hxup, skip], -1), train)
            dec.append(hx)

        # side outputs (d1..d6) + fused d0
        in_hw = x.shape[1:3]
        d1 = nn.Conv(self.out_ch, (3, 3), padding=1, name="side1")(dec[4])
        d2 = nn.Conv(self.out_ch, (3, 3), padding=1, name="side2")(dec[3])
        d3 = nn.Conv(self.out_ch, (3, 3), padding=1, name="side3")(dec[2])
        d4 = nn.Conv(self.out_ch, (3, 3), padding=1, name="side4")(dec[1])
        d5 = nn.Conv(self.out_ch, (3, 3), padding=1, name="side5")(dec[0])
        d6 = nn.Conv(self.out_ch, (3, 3), padding=1, name="side6")(hx6)
        ds = [upsample_like(d.astype(jnp.float32), in_hw) for d in (d1, d2, d3, d4, d5, d6)]
        d0 = nn.Conv(self.out_ch, (1, 1), name="outconv")(jnp.concatenate(ds, -1))
        return [jax.nn.sigmoid(d) for d in (d0, *ds)]


class ISNet(nn.Module):
    """ISNet / DIS (isnet-general-use, isnet-anime)."""

    out_ch: int = 1
    half: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.bfloat16 if self.half else jnp.float32
        hxin = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, dtype=dtype,
                       name="conv_in")(x)
        # (DIS conv_in has no BN/ReLU in the public release)
        hx = hxin
        cfg_enc = [(7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512)]
        skips = []
        for i, (height, mid, out) in enumerate(cfg_enc, start=1):
            hx = RSU(height, mid, out, self.half, name=f"stage{i}")(hx, train)
            skips.append(hx)
            hx = _maxpool2(hx)
        hx5 = RSU4F(256, 512, self.half, name="stage5")(hx, train)
        hx = _maxpool2(hx5)
        hx6 = RSU4F(256, 512, self.half, name="stage6")(hx, train)

        hx6up = upsample_like(hx6, hx5.shape[1:3])
        hx5d = RSU4F(256, 512, self.half,
                     name="stage5d")(jnp.concatenate([hx6up, hx5], -1), train)
        dec = [hx5d]
        hx = hx5d
        cfg_dec = [(4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)]
        for i, (height, mid, out) in zip((4, 3, 2, 1), cfg_dec):
            skip = skips[i - 1]
            hxup = upsample_like(hx, skip.shape[1:3])
            hx = RSU(height, mid, out, self.half,
                     name=f"stage{i}d")(jnp.concatenate([hxup, skip], -1), train)
            dec.append(hx)

        in_hw = x.shape[1:3]
        outs = []
        for name, feat in zip(("side1", "side2", "side3", "side4", "side5", "side6"),
                              (dec[4], dec[3], dec[2], dec[1], dec[0], hx6)):
            d = nn.Conv(self.out_ch, (3, 3), padding=1, name=name)(feat)
            outs.append(upsample_like(d.astype(jnp.float32), in_hw))
        return [jax.nn.sigmoid(d) for d in outs]
