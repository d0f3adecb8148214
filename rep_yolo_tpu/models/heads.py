"""Detection heads (Detect / IDetect / IAuxDetect) and the anchor-grid decode.

The heads emit raw per-level maps of shape (B, H, W, na, no); the sigmoid
decode to pixel-space (xc, yc, w, h, obj, cls...) is a separate pure
function so that training (raw maps -> loss) and inference (decode -> NMS)
share one forward. Mirrors reference models/yolo.py:23-199 (Detect/IDetect)
and :303-419 (IAuxDetect).

Decode math (reference models/yolo.py:129-130):
    xy = (sigmoid(t_xy) * 2 - 0.5 + grid) * stride
    wh = (sigmoid(t_wh) * 2) ** 2 * anchor_pixels
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rep_yolo_tpu.nn.initializers import (
    conv_kernel_init,
    conv_bias_init_for,
    implicit_init,
)


def _head_conv(no_na: int, c1: int, name: str) -> nn.Conv:
    return nn.Conv(no_na, (1, 1), use_bias=True,
                   kernel_init=conv_kernel_init,
                   bias_init=conv_bias_init_for(c1),
                   precision=jax.lax.Precision.HIGHEST,
                   name=name)


class Detect(nn.Module):
    """Plain YOLO detect head: per-level 1x1 conv (reference models/yolo.py:23-49)."""

    nc: int
    anchors: tuple  # (nl, na*2) pixel anchors
    ch: tuple       # input channels per level

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            y = _head_conv(self.no * self.na, self.ch[i], f"m_{i}")(x)
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h, w, self.na, self.no))
        return outs


class IDetect(nn.Module):
    """YOLOR implicit-knowledge detect head: im(conv(ia(x))) per level
    (reference models/yolo.py:93-133). ``deploy=True`` drops ia/im (they are
    folded into the conv weight/bias by ``fuse.fuse_idetect``, mirroring
    IDetect.fuse at reference models/yolo.py:170-182).
    """

    nc: int
    anchors: tuple
    ch: tuple
    deploy: bool = False

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            if not self.deploy:
                ia = self.param(f"ia_{i}", implicit_init(0.0), (1, 1, 1, self.ch[i]))
                x = x + ia
            y = _head_conv(self.no * self.na, self.ch[i], f"m_{i}")(x)
            if not self.deploy:
                im = self.param(f"im_{i}", implicit_init(1.0),
                                (1, 1, 1, self.no * self.na))
                y = y * im
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h, w, self.na, self.no))
        return outs


class IAuxDetect(nn.Module):
    """Lead + auxiliary detect head for P6/aux training (reference
    models/yolo.py:303-419): first nl inputs go through implicit-wrapped
    lead convs, the last nl through plain aux convs. Returns
    [lead_0..lead_{nl-1}, aux_0..aux_{nl-1}] raw maps.
    """

    nc: int
    anchors: tuple
    ch: tuple  # 2*nl channels: lead levels then aux levels
    deploy: bool = False

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        nl = self.nl
        lead, aux = [], []
        for i in range(nl):
            x = xs[i]
            if not self.deploy:
                ia = self.param(f"ia_{i}", implicit_init(0.0), (1, 1, 1, self.ch[i]))
                x = x + ia
            y = _head_conv(self.no * self.na, self.ch[i], f"m_{i}")(x)
            if not self.deploy:
                im = self.param(f"im_{i}", implicit_init(1.0),
                                (1, 1, 1, self.no * self.na))
                y = y * im
            b, h, w, _ = y.shape
            lead.append(y.reshape(b, h, w, self.na, self.no))
        if not self.deploy:
            for i in range(nl):
                y = _head_conv(self.no * self.na, self.ch[nl + i], f"m2_{i}")(xs[nl + i])
                b, h, w, _ = y.shape
                aux.append(y.reshape(b, h, w, self.na, self.no))
        return lead + aux


def make_grid(ny: int, nx: int, dtype=jnp.float32) -> jax.Array:
    """(ny, nx, 2) grid of (x, y) cell indices (reference models/yolo.py:184-187)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    return jnp.stack([xs, ys], axis=-1).astype(dtype)


def decode_level(p: jax.Array, anchors_px: jax.Array, stride: float) -> jax.Array:
    """Decode one raw map (B,H,W,na,no) to (B, H*W*na, no) pixel predictions.

    anchors_px: (na, 2) anchors in pixels for this level.
    """
    b, h, w, na, no = p.shape
    y = jax.nn.sigmoid(p)
    grid = make_grid(h, w, y.dtype)[None, :, :, None, :]  # (1,H,W,1,2)
    xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (y[..., 2:4] * 2.0) ** 2 * anchors_px.astype(y.dtype)[None, None, None]
    out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    # Flatten in torch's (na, H, W) order so outputs match the reference's
    # row ordering (reference models/yolo.py:122,131 permutes to
    # (bs,na,ny,nx,no) then views (bs,-1,no)).
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, na * h * w, no)
    return out


def decode_predictions(ps: Sequence[jax.Array], anchors_px: jax.Array,
                       strides: Sequence[float]) -> jax.Array:
    """Decode all levels and concat: list[(B,H,W,na,no)] -> (B, N, no).

    anchors_px: (nl, na, 2) pixel anchors.
    """
    outs = [decode_level(p, anchors_px[i], strides[i]) for i, p in enumerate(ps)]
    return jnp.concatenate(outs, axis=1)
