"""Extended block zoo (flax.linen, NHWC) — the reference's reachable-but-
unused modules (SURVEY §2.2), re-designed TPU-first.

The reference's YAML DSL can dispatch every block in models/common.py /
models/experimental.py (reference models/yolo.py:746-818), so full parity
needs the whole zoo even though the flagship Rep-YOLO graph only uses the
blocks in rep_yolo_tpu/nn/blocks.py. Per-block reference citations inline.

Conventions match blocks.py: NHWC, static shapes, `deploy` flag selects a
fused single-conv path where the block is reparameterizable, `train` gates
BatchNorm batch-stats updates.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rep_yolo_tpu.nn import blocks as B
from rep_yolo_tpu.nn.blocks import (
    BN, Bottleneck, ConvBnAct, ConvUnit, GhostConv, SPPCSPC, Stem, _act,
    autopad, dw_groups, max_pool,
)

# ---------------------------------------------------------------------------
# functional routing ops (parameter-free)
# ---------------------------------------------------------------------------


def chuncat(xs: Sequence[jax.Array]) -> jax.Array:
    """Halve each input on channels, concat all first halves then all second
    halves (reference models/common.py:67-79)."""
    firsts, seconds = [], []
    for x in xs:
        c = x.shape[-1] // 2
        firsts.append(x[..., :c])
        seconds.append(x[..., c:])
    return jnp.concatenate(firsts + seconds, axis=-1)


def foldcut(x: jax.Array) -> jax.Array:
    """Halve on channels and add the halves (reference models/common.py:91-98)."""
    c = x.shape[-1] // 2
    return x[..., :c] + x[..., c:]


def contract(x: jax.Array, gain: int = 2) -> jax.Array:
    """Space-to-depth, channel order matching the reference's
    (N,C,H,W)->(N,s*s*C,H/s,W/s) permute (reference models/common.py:840-851):
    output channel index = (sh * s + sw) * C + c."""
    n, h, w, c = x.shape
    s = gain
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))        # n, h/s, w/s, sh, sw, c
    return x.reshape(n, h // s, w // s, s * s * c)


def expand(x: jax.Array, gain: int = 2) -> jax.Array:
    """Depth-to-space, inverse channel order of `contract`
    (reference models/common.py:854-865)."""
    n, h, w, c = x.shape
    s = gain
    x = x.reshape(n, h, w, s, s, c // (s * s))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))        # n, h, sh, w, sw, c'
    return x.reshape(n, h * s, w * s, c // (s * s))


# ---------------------------------------------------------------------------
# conv variants
# ---------------------------------------------------------------------------


class DWConvBlock(nn.Module):
    """Depthwise conv = Conv with g=gcd(c1,c2) (reference models/common.py:154)."""

    c2: int
    k: int = 1
    s: int = 1
    act: str | None = "silu"
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return ConvBnAct(self.c2, self.k, self.s, g=dw_groups(x.shape[-1], self.c2),
                         act=self.act, deploy=self.deploy, name="conv")(x, train)


class RobustConv(nn.Module):
    """Large-kernel depthwise Conv + biased 1x1 conv + layer scale
    (reference models/common.py:119-133)."""

    c2: int
    k: int = 7
    s: int = 1
    p: int | None = None
    layer_scale: float = 1e-6
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        y = ConvBnAct(c1, self.k, self.s, self.p, g=c1, deploy=self.deploy,
                      name="conv_dw")(x, train)
        y = ConvUnit(self.c2, 1, 1, use_bias=True, name="conv1x1")(y)
        if self.layer_scale > 0:
            gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                               (self.c2,))
            y = y * gamma
        return y


class RobustConv2(nn.Module):
    """Strided depthwise Conv + transposed-conv upsample back + layer scale
    (reference models/common.py:136-153)."""

    c2: int
    k: int = 7
    s: int = 4
    p: int | None = None
    layer_scale: float = 1e-6
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        y = ConvBnAct(c1, self.k, self.s, self.p, g=c1, deploy=self.deploy,
                      name="conv_strided")(x, train)
        y = nn.ConvTranspose(self.c2, (self.s, self.s),
                             strides=(self.s, self.s), padding="VALID",
                             use_bias=True, name="conv_deconv")(y)
        if self.layer_scale > 0:
            gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                               (self.c2,))
            y = y * gamma
        return y


class CrossConv(nn.Module):
    """1xk then kx1 cross convolution (reference models/experimental.py:10-21)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = _rect_conv(c_, (1, self.k), (1, self.s), deploy=self.deploy,
                       name="cv1")(x, train)
        y = _rect_conv(self.c2, (self.k, 1), (self.s, 1), g=self.g,
                       deploy=self.deploy, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class _rect_conv(nn.Module):
    """Conv+BN+SiLU with a rectangular kernel (only CrossConv needs it)."""

    c2: int
    k: tuple[int, int]
    s: tuple[int, int]
    g: int = 1
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ph, pw = self.k[0] // 2, self.k[1] // 2
        y = nn.Conv(self.c2, self.k, strides=self.s,
                    padding=((ph, ph), (pw, pw)), feature_group_count=self.g,
                    use_bias=self.deploy,
                    precision=B.CONV_PRECISION, name="conv")(x)
        if not self.deploy:
            y = BN(name="bn")(y, train)
        return jax.nn.silu(y)


class MixConv2d(nn.Module):
    """Mixed-kernel conv groups + BN + leaky, residual add
    (reference models/experimental.py:45-66)."""

    c2: int
    k: tuple[int, ...] = (1, 3)
    s: int = 1
    equal_ch: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        groups = len(self.k)
        if self.equal_ch:
            idx = np.floor(np.linspace(0, groups - 1e-6, self.c2))
            c_ = [int((idx == g).sum()) for g in range(groups)]
        else:
            b = [self.c2] + [0] * groups
            a = np.eye(groups + 1, groups, k=-1)
            a -= np.roll(a, 1, axis=1)
            a *= np.array(self.k) ** 2
            a[0] = 1
            c_ = np.linalg.lstsq(a, b, rcond=None)[0].round().astype(int)
        ys = [ConvUnit(int(c_[g]), self.k[g], self.s, name=f"m_{g}")(x)
              for g in range(groups)]
        y = BN(name="bn")(jnp.concatenate(ys, axis=-1), train)
        return x + jax.nn.leaky_relu(y, 0.1)


class Sum(nn.Module):
    """(Optionally weighted) sum of n inputs (reference
    models/experimental.py:24-42; BiFPN-style sigmoid weights)."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False) -> jax.Array:
        y = xs[0]
        if self.weight:
            w = self.param("w", lambda key: -jnp.arange(1.0, self.n) / 2)
            w = jax.nn.sigmoid(w) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class SpConv2d(nn.Module):
    """Shifted-quadrant padding conv (reference models/common.py:3291-3310):
    channel quarters padded toward the 4 corners, then one biased conv."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        q = c // 4
        parts = [
            jnp.pad(x[..., :q], ((0, 0), (1, 0), (1, 0), (0, 0))),
            jnp.pad(x[..., q:2 * q], ((0, 0), (1, 0), (0, 1), (0, 0))),
            jnp.pad(x[..., 2 * q:3 * q], ((0, 0), (0, 1), (1, 0), (0, 0))),
            jnp.pad(x[..., 3 * q:], ((0, 0), (0, 1), (0, 1), (0, 0))),
        ]
        y = jnp.concatenate(parts, axis=-1)
        return nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                       padding=((self.p, self.p), (self.p, self.p)),
                       use_bias=True, precision=B.CONV_PRECISION,
                       name="conv")(y)


class EffStem(nn.Module):
    """EfficientNetV2-style stem conv (reference models/common.py:3253-3268,
    lowercase `stem`): conv + BN(eps 1e-3) + SiLU."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = (self.k - 1) // 2
        y = ConvUnit(self.c2, self.k, self.s, p, name="conv")(x)
        y = BN(name="bn")(y, train)
        return jax.nn.silu(y)


def drop_path(x: jax.Array, rate: float, train: bool, rng) -> jax.Array:
    """Stochastic depth (reference models/common.py:3270-3279)."""
    if rate == 0.0 or not train:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


class DropPath(nn.Module):
    """Module wrapper over `drop_path` using the 'dropout' RNG stream."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.rate == 0.0 or not train:
            return x
        return drop_path(x, self.rate, train, self.make_rng("dropout"))


# ---------------------------------------------------------------------------
# residual family
# ---------------------------------------------------------------------------


class Res(nn.Module):
    """ResNet bottleneck 1x1 -> 3x3(g) -> 1x1 (+id). The reference defines
    Res twice; the later definition wins (models/common.py:3352-3371) and is
    identical to the earlier one (models/common.py:229-240)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y = ConvBnAct(c_, 3, 1, g=self.g, deploy=self.deploy, name="cv2")(y, train)
        y = ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv3")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class ResX(Res):
    """Res with 32 groups (reference models/common.py:243-247)."""

    g: int = 32


class Ghost(nn.Module):
    """Ghost bottleneck (reference models/common.py:250-262)."""

    c2: int
    k: int = 3
    s: int = 1
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, deploy=self.deploy, name="g1")(x, train)
        if self.s == 2:
            y = DWConvBlock(c_, self.k, self.s, act=None, deploy=self.deploy,
                            name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=None, deploy=self.deploy,
                      name="g2")(y, train)
        if self.s == 2:
            sc = DWConvBlock(x.shape[-1], self.k, self.s, act=None,
                             deploy=self.deploy, name="sc_dw")(x, train)
            sc = ConvBnAct(self.c2, 1, 1, act=None, deploy=self.deploy,
                           name="sc_pw")(sc, train)
        else:
            sc = x
        return y + sc


class RepBottleneck(nn.Module):
    """Bottleneck whose 3x3 is a RepConv (reference models/common.py:660-665)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.nn.blocks import RepConv

        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y = RepConv(c_, self.c2, 3, 1, g=self.g, deploy=self.deploy,
                    name="cv2")(y, train)
        # NB reference quirk: RepBottleneck.__init__ forces shortcut=True in
        # the super() call; the add is gated only by c1==c2 like Bottleneck.
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepRes(nn.Module):
    """Res whose middle 3x3 is a RepConv (reference models/common.py:692-698)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.nn.blocks import RepConv

        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y = RepConv(c_, c_, 3, 1, g=self.g, deploy=self.deploy,
                    name="cv2")(y, train)
        y = ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv3")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepResX(RepRes):
    """RepRes with 32 groups (reference models/common.py:724-730)."""

    g: int = 32


# ---------------------------------------------------------------------------
# CSP wrappers (A/B/C) over a pluggable inner block
# ---------------------------------------------------------------------------

# registry: inner-name -> (module class, kwargs-from-(shortcut, g))
def _inner_stack(kind: str, c_: int, n: int, shortcut: bool, g: int,
                 deploy: bool):
    """Build the CSP inner sequential stack per reference conventions:
    Bottleneck(e=1.0) / Res(e=0.5) / ResX(e=1.0,g=32) / Ghost /
    RepBottleneck(e=1.0) / RepRes(e=0.5) / RepResX(e=0.5,g=32)
    (reference models/common.py:318-438, 660-756)."""
    def stack(x, train):
        for i in range(n):
            name = f"m_{i}"
            if kind == "Bottleneck":
                x = Bottleneck(c_, shortcut=shortcut, g=g, e=1.0,
                               deploy=deploy, name=name)(x, train)
            elif kind == "Res":
                x = Res(c_, shortcut=shortcut, g=g, e=0.5, deploy=deploy,
                        name=name)(x, train)
            elif kind == "ResX":
                x = Res(c_, shortcut=shortcut, g=32, e=1.0, deploy=deploy,
                        name=name)(x, train)
            elif kind == "Ghost":
                x = Ghost(c_, deploy=deploy, name=name)(x, train)
            elif kind == "RepBottleneck":
                x = RepBottleneck(c_, shortcut=shortcut, g=g, e=1.0,
                                  deploy=deploy, name=name)(x, train)
            elif kind == "RepRes":
                x = RepRes(c_, shortcut=shortcut, g=g, e=0.5, deploy=deploy,
                           name=name)(x, train)
            elif kind == "RepResX":
                x = RepRes(c_, shortcut=shortcut, g=32, e=0.5, deploy=deploy,
                           name=name)(x, train)
            else:
                raise ValueError(f"unknown CSP inner {kind!r}")
        return x
    return stack


class CSPA(nn.Module):
    """CSP variant A: cv3(cat(m(cv1(x)), cv2(x)))
    (reference models/common.py:318-331 BottleneckCSPA and subclasses)."""

    c2: int
    n: int = 1
    inner: str = "Bottleneck"
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y1 = _inner_stack(self.inner, c_, self.n, self.shortcut, self.g,
                          self.deploy)(y1, train)
        y2 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class CSPB(nn.Module):
    """CSP variant B: both branches fed from cv1; hidden = c2
    (reference models/common.py:334-348)."""

    c2: int
    n: int = 1
    inner: str = "Bottleneck"
    shortcut: bool = False
    g: int = 1
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2)
        x1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y1 = _inner_stack(self.inner, c_, self.n, self.shortcut, self.g,
                          self.deploy)(x1, train)
        y2 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x1, train)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class CSPC(nn.Module):
    """CSP variant C: extra 1x1 after the inner stack
    (reference models/common.py:351-365)."""

    c2: int
    n: int = 1
    inner: str = "Bottleneck"
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y1 = _inner_stack(self.inner, c_, self.n, self.shortcut, self.g,
                          self.deploy)(y1, train)
        y1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv3")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv4")(
            jnp.concatenate([y1, y2], axis=-1), train)


# ---------------------------------------------------------------------------
# ghost / SPP extensions
# ---------------------------------------------------------------------------


class GhostSPPCSPC(nn.Module):
    """SPPCSPC with every Conv replaced by GhostConv
    (reference models/common.py:293-304)."""

    c2: int
    n: int = 1
    e: float = 0.5
    k: tuple[int, ...] = (5, 9, 13)
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(2 * self.c2 * self.e)
        g = lambda c2, k, name: GhostConv(c2, k, 1, deploy=self.deploy, name=name)
        x1 = g(c_, 1, "cv1")(x, train)
        x1 = g(c_, 3, "cv3")(x1, train)
        x1 = g(c_, 1, "cv4")(x1, train)
        pools = [max_pool(x1, k, 1, k // 2) for k in self.k]
        y1 = g(c_, 1, "cv5")(jnp.concatenate([x1, *pools], axis=-1), train)
        y1 = g(c_, 3, "cv6")(y1, train)
        y2 = g(c_, 1, "cv2")(x, train)
        return g(self.c2, 1, "cv7")(jnp.concatenate([y1, y2], axis=-1), train)


class GhostStem(nn.Module):
    """Stem with GhostConvs (reference models/common.py:307-315)."""

    c2: int
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 / 2)
        y = GhostConv(c_, 3, 2, deploy=self.deploy, name="cv1")(x, train)
        a = GhostConv(c_, 1, 1, deploy=self.deploy, name="cv2")(y, train)
        a = GhostConv(c_, 3, 2, deploy=self.deploy, name="cv3")(a, train)
        b = max_pool(y, 2, 2)
        return GhostConv(self.c2, 1, 1, deploy=self.deploy, name="cv4")(
            jnp.concatenate([a, b], axis=-1), train)


class SPPFCSPC(nn.Module):
    """CSP-wrapped SPPF: 4 cascaded k-pools (reference models/common.py:3317-3338)."""

    c2: int
    e: float = 0.5
    k: int = 5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(2 * self.c2 * self.e)
        cv = lambda c2, k, name: ConvBnAct(c2, k, 1, deploy=self.deploy, name=name)
        x1 = cv(c_, 1, "cv1")(x, train)
        x1 = cv(c_, 3, "cv3")(x1, train)
        x1 = cv(c_, 1, "cv4")(x1, train)
        x2 = max_pool(x1, self.k, 1, self.k // 2)
        x3 = max_pool(x2, self.k, 1, self.k // 2)
        x4 = max_pool(x3, self.k, 1, self.k // 2)
        x5 = max_pool(x4, self.k, 1, self.k // 2)
        y1 = cv(c_, 1, "cv5")(jnp.concatenate([x1, x2, x3, x4, x5], -1), train)
        y1 = cv(c_, 3, "cv6")(y1, train)
        y2 = cv(c_, 1, "cv2")(x, train)
        return cv(self.c2, 1, "cv7")(jnp.concatenate([y1, y2], -1), train)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference models/spp_sppf.py:14-48):
    1x1 + three dilated 3x3 + image-level pooled branch, concat, project."""

    c2: int
    rates: tuple[int, ...] = (6, 12, 18)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        branches = [ConvBnAct(self.c2, 1, 1, act="relu", name="b0")(x, train)]
        for i, r in enumerate(self.rates):
            y = nn.Conv(self.c2, (3, 3), padding=((r, r), (r, r)),
                        kernel_dilation=(r, r), use_bias=False,
                        precision=B.CONV_PRECISION,
                        name=f"b{i + 1}_conv")(x)
            y = BN(name=f"b{i + 1}_bn")(y, train)
            branches.append(jax.nn.relu(y))
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = ConvBnAct(self.c2, 1, 1, act="relu", name="gap_conv")(gap, train)
        gap = jnp.broadcast_to(gap, branches[0].shape)
        branches.append(gap)
        y = jnp.concatenate(branches, axis=-1)
        return ConvBnAct(self.c2, 1, 1, act="relu", name="proj")(y, train)


# ---------------------------------------------------------------------------
# attention: CBAM, coordinate attention, MobileNet inverted residual
# ---------------------------------------------------------------------------


class ChannelAttention(nn.Module):
    """CBAM channel attention (reference models/common.py:3109-3129):
    shared MLP over GAP and GMP, sigmoid gate."""

    ratio: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        f1 = ConvUnit(max(c // self.ratio, 1), 1, name="f1")
        f2 = ConvUnit(c, 1, name="f2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        gate = jax.nn.sigmoid(f2(jax.nn.relu(f1(avg)))
                              + f2(jax.nn.relu(f1(mx))))
        return x * gate


class SpatialAttention(nn.Module):
    """CBAM spatial attention (reference models/common.py:3132-3147)."""

    k: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        p = 3 if self.k == 7 else 1
        gate = nn.Conv(1, (self.k, self.k), padding=((p, p), (p, p)),
                       use_bias=False, precision=B.CONV_PRECISION,
                       name="conv")(jnp.concatenate([avg, mx], -1))
        return x * jax.nn.sigmoid(gate)


class CBAMC3(nn.Module):
    """C3 whose output passes channel+spatial attention
    (reference models/common.py:3150-3168)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, shortcut=self.shortcut, e=1.0,
                            deploy=self.deploy, name=f"m_{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train)
        y = ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)
        y = ChannelAttention(16, name="ca")(y, train)
        return SpatialAttention(7, name="sa")(y, train)


class CoordAtt(nn.Module):
    """Coordinate attention (Hou et al. 2021) — the block InvertedResidual
    references (models/common.py:3240; undefined there — dead code in the
    reference, implemented properly here): pool along H and W separately,
    joint 1x1 bottleneck, split, per-axis sigmoid gates."""

    reduction: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        xh = jnp.mean(x, axis=2, keepdims=True)           # (n,h,1,c)
        xw = jnp.mean(x, axis=1, keepdims=True)           # (n,1,w,c)
        y = jnp.concatenate([xh, jnp.transpose(xw, (0, 2, 1, 3))], axis=1)
        y = ConvUnit(mip, 1, name="conv1")(y)
        y = BN(name="bn1")(y, train)
        y = jax.nn.hard_swish(y)
        yh, yw = y[:, :h], y[:, h:]
        gh = jax.nn.sigmoid(ConvUnit(c, 1, name="conv_h")(yh))       # (n,h,1,c)
        gw = jax.nn.sigmoid(ConvUnit(c, 1, name="conv_w")(
            jnp.transpose(yw, (0, 2, 1, 3))))                        # (n,1,w,c)
        return x * gh * gw


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual with CoordAtt in the expand path
    (reference models/common.py:3207-3250)."""

    c2: int
    s: int = 1
    expand_ratio: int = 6

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        hidden = round(c1 * self.expand_ratio)
        y = x
        if self.expand_ratio != 1:
            y = ConvUnit(hidden, 1, name="pw")(y)
            y = BN(name="pw_bn")(y, train)
            y = jax.nn.relu6(y)
        y = ConvUnit(hidden, 3, self.s, 1, g=hidden, name="dw")(y)
        y = BN(name="dw_bn")(y, train)
        y = jax.nn.relu6(y)
        if self.expand_ratio != 1:
            y = CoordAtt(name="coord")(y, train)
        y = ConvUnit(self.c2, 1, name="pw_linear")(y)
        y = BN(name="pw_linear_bn")(y, train)
        return x + y if self.s == 1 and c1 == self.c2 else y


# ---------------------------------------------------------------------------
# heads / misc
# ---------------------------------------------------------------------------


class FReLU(nn.Module):
    """Funnel activation: max(x, DWConv3x3+BN(x))
    (reference utils/activations.py:49-60)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        y = ConvUnit(c, 3, 1, 1, g=c, name="conv")(x)
        y = BN(name="bn")(y, train)
        return jnp.maximum(x, y)


class Classify(nn.Module):
    """GAP -> conv -> flatten classification head
    (reference models/common.py:1031-1042)."""

    c2: int
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        xs = x if isinstance(x, (list, tuple)) else [x]
        z = jnp.concatenate([jnp.mean(v, axis=(1, 2), keepdims=True)
                             for v in xs], axis=-1)
        y = ConvUnit(self.c2, self.k, use_bias=True, name="conv")(z)
        return y.reshape(y.shape[0], -1)
