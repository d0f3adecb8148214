"""Transformer & Swin block family (flax.linen, NHWC) — TPU-first.

Covers the reference's transformer zoo (SURVEY §2.2): `TransformerLayer`/
`TransformerBlock` (reference models/common.py:761-806), the Swin v1
window-attention stack (`SwinTransformerLayer`/`SwinTransformerBlock`,
reference models/common.py:2521-2630, whose `WindowAttention` only exists
in commented-out form in the reference — implemented properly here with
the canonical Swin semantics), the Swin v2 cosine-attention stack
(`WindowAttention_v2`/`SwinTransformerLayer_v2`/`SwinTransformer2Block`,
reference models/common.py:2729-3049), the window-axial "vertical"
variant (reference models/common.py:2045-2395), and the CSP wrappers
`C3STR`/`STCSPA/B/C`/`ST2CSPA/B/C` (reference models/common.py:2659-2728,
3051-3107).

TPU notes: window partition is pure reshape/transpose on NHWC (no data
movement beyond a relayout); attention inside a window is a batched MXU
matmul over (num_windows*B, heads, win*win, head_dim); all shapes static,
shift masks precomputed with numpy at trace time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from rep_yolo_tpu.nn.blocks import ConvBnAct


# ---------------------------------------------------------------------------
# plain ViT-style layer (no LayerNorm, as the reference strips them)
# ---------------------------------------------------------------------------


class TransformerLayer(nn.Module):
    """q/k/v linear (no bias) -> MHA -> residual; 2-linear MLP -> residual
    (reference models/common.py:761-775; LayerNorms removed there too)."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, N, C) tokens
        d = nn.Dense
        q = d(self.c, use_bias=False, name="q")(x)
        k = d(self.c, use_bias=False, name="k")(x)
        v = d(self.c, use_bias=False, name="v")(x)
        # torch nn.MultiheadAttention has its own in/out projections (biased)
        q = d(self.c, name="in_q")(q)
        k = d(self.c, name="in_k")(k)
        v = d(self.c, name="in_v")(v)
        h = self.num_heads
        hd = self.c // h
        B, N, _ = x.shape
        qh = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / jnp.sqrt(hd), axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, self.c)
        x = d(self.c, name="out_proj")(o) + x
        return d(self.c, use_bias=False, name="fc2")(
            d(self.c, use_bias=False, name="fc1")(x)) + x


class TransformerBlock(nn.Module):
    """Optional channel conv + learned position embedding + n layers
    (reference models/common.py:778-806)."""

    c2: int
    num_heads: int
    num_layers: int
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="conv")(x, train)
        B, H, W, C = x.shape
        p = x.reshape(B, H * W, C)
        p = p + nn.Dense(self.c2, name="linear")(p)   # learnable pos embed
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, name=f"tr_{i}")(p, train)
        return p.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# window helpers (NHWC-native)
# ---------------------------------------------------------------------------


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B,H,W,C) -> (B*nW, ws, ws, C) (reference models/common.py:2417-2422)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws, ws, C)


def window_reverse(windows: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    """(B*nW, ws, ws, C) -> (B,H,W,C) (reference models/common.py:2424-2429)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table
    (reference models/common.py:2060-2071)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]          # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask (nW, N, N) with 0 / -100 entries
    (reference models/common.py:2273-2295)."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    # numpy window partition
    img = img.reshape(1, H // ws, ws, W // ws, ws, 1)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = img[:, None, :] - img[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Swin v1
# ---------------------------------------------------------------------------


class WindowAttention(nn.Module):
    """Standard Swin W-MSA with relative position bias. The reference's
    SwinTransformerLayer (models/common.py:2539) dispatches to a
    `WindowAttention` that is only present commented-out
    (models/common.py:1407,1675,2431) — canonical semantics implemented."""

    dim: int
    ws: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None = None) -> jax.Array:
        # x: (B_, N, C) with N = ws*ws
        B_, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k)

        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.ws - 1) ** 2, h))
        idx = _relative_position_index(self.ws).reshape(-1)
        bias = table[idx].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) \
                + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, name="proj")(o)


class _SwinMlp(nn.Module):
    """2-layer MLP with SiLU (reference Mlp, models/common.py:2501-2518;
    act_layer=nn.SiLU per SwinTransformerLayer defaults)."""

    dim: int
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Dense(int(self.dim * self.ratio), name="fc1")(x)
        return nn.Dense(self.dim, name="fc2")(jax.nn.silu(y))


class SwinTransformerLayer(nn.Module):
    """LN -> (S)W-MSA -> residual; LN -> MLP -> residual, with pad-to-window
    (reference models/common.py:2521-2630)."""

    dim: int
    num_heads: int
    ws: int = 8
    shift: int = 0
    v2: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H0, W0, C = x.shape
        pad_b = (self.ws - H0 % self.ws) % self.ws
        pad_r = (self.ws - W0 % self.ws) % self.ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        H, W = x.shape[1], x.shape[2]

        mask = (_shift_attn_mask(H, W, self.ws, self.shift)
                if self.shift > 0 else None)

        def attn_block(y):
            if self.shift > 0:
                y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            wins = window_partition(y, self.ws)
            wins = wins.reshape(-1, self.ws * self.ws, C)
            if self.v2:
                wins = WindowAttentionV2(C, self.ws, self.num_heads,
                                         name="attn")(wins, mask)
            else:
                wins = WindowAttention(C, self.ws, self.num_heads,
                                       name="attn")(wins, mask)
            y = window_reverse(wins.reshape(-1, self.ws, self.ws, C),
                               self.ws, H, W)
            if self.shift > 0:
                y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
            return y

        if self.v2:
            # v2: post-norm ordering (reference models/common.py:2988-2994)
            x = x + nn.LayerNorm(name="norm1")(attn_block(x))
            x = x + nn.LayerNorm(name="norm2")(_SwinMlp(C, name="mlp")(x))
        else:
            x = x + attn_block(nn.LayerNorm(name="norm1")(x))
            x = x + _SwinMlp(C, name="mlp")(nn.LayerNorm(name="norm2")(x))

        if pad_b or pad_r:
            x = x[:, :H0, :W0]
        return x


class SwinTransformerBlock(nn.Module):
    """Optional channel conv + alternating W-MSA / SW-MSA layers
    (reference models/common.py:2398-2414)."""

    c2: int
    num_heads: int
    num_layers: int
    ws: int = 8
    v2: bool = False
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="conv")(x, train)
        for i in range(self.num_layers):
            x = SwinTransformerLayer(
                self.c2, self.num_heads, self.ws,
                shift=0 if i % 2 == 0 else self.ws // 2, v2=self.v2,
                name=f"blk_{i}")(x, train)
        return x


# ---------------------------------------------------------------------------
# Swin v2 (cosine attention + continuous position bias)
# ---------------------------------------------------------------------------


def _cpb_coords_table(ws: int) -> np.ndarray:
    """Log-spaced continuous relative coordinates (1, 2ws-1, 2ws-1, 2)
    (reference models/common.py:2748-2761)."""
    rng = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(rng, rng, indexing="ij"),
                     axis=-1)[None]                      # 1, 2ws-1, 2ws-1, 2
    table /= max(ws - 1, 1)
    table *= 8.0
    return np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)


class WindowAttentionV2(nn.Module):
    """Swin-v2 scaled-cosine window attention with CPB-MLP bias
    (reference models/common.py:2729-2846)."""

    dim: int
    ws: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None = None) -> jax.Array:
        B_, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv_w = nn.Dense(3 * C, use_bias=False, name="qkv")
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
        qkv = qkv_w(x) + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = qkv.reshape(B_, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn)
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(float(np.log(10.0))),
            (h, 1, 1))
        attn = attn * jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))

        # continuous position bias
        table = jnp.asarray(_cpb_coords_table(self.ws))     # 1,2w-1,2w-1,2
        cpb = nn.Dense(512, name="cpb_fc1")(table)
        cpb = nn.Dense(h, use_bias=False, name="cpb_fc2")(jax.nn.relu(cpb))
        cpb = cpb.reshape(-1, h)                             # (2w-1)^2, h
        idx = _relative_position_index(self.ws).reshape(-1)
        bias = cpb[idx].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + (16.0 * jax.nn.sigmoid(bias))[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) \
                + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, name="proj")(o)


# ---------------------------------------------------------------------------
# "vertical" (window-axial) variant
# ---------------------------------------------------------------------------


class WindowAttentionVertical(nn.Module):
    """Column-axial attention inside each window: conv q/k/v projections,
    criss-cross-style -inf diagonal on the H-energy, per-column softmax
    (reference models/common.py:2045-2243, H-branch only)."""

    dim: int
    ws: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array, mask=None) -> jax.Array:
        # x: (B_, ws, ws, C) windows in NHWC
        B_, hh, ww, C = x.shape
        nh = self.num_heads
        hd = C // nh
        q = ConvBnAct(C, 1, 1, name="conv_q")(x)
        k = ConvBnAct(C, 1, 1, name="conv_k")(x)
        v = ConvBnAct(C, 1, 1, name="conv_v")(x)
        scale = hd ** -0.5

        def heads(t):  # (B_, h, w, C) -> (B_*w, nh, h, hd)
            t = t.reshape(B_, hh, ww, nh, hd)
            return t.transpose(0, 2, 3, 1, 4).reshape(B_ * ww, nh, hh, hd)

        qh, kh, vh = heads(q * scale), heads(k), heads(v)
        energy = jnp.einsum("wnij,wnkj->wnik", qh, kh)       # (B_*w, nh, h, h)
        diag = jnp.where(jnp.eye(hh, dtype=bool), -jnp.inf, 0.0)
        attn = jax.nn.softmax(energy + diag, axis=-1)
        o = jnp.einsum("wnik,wnkj->wnij", attn, vh)          # (B_*w, nh, h, hd)
        o = o.reshape(B_, ww, nh, hh, hd).transpose(0, 3, 1, 2, 4)
        o = o.reshape(B_, hh, ww, C)
        return x + nn.Dense(C, name="proj")(o)


class SwinTransformerLayerVertical(nn.Module):
    """Swin layer whose attention is the window-axial vertical attention
    (reference models/common.py:2246-2372)."""

    dim: int
    num_heads: int
    ws: int = 7
    shift: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H0, W0, C = x.shape
        pad_b = (self.ws - H0 % self.ws) % self.ws
        pad_r = (self.ws - W0 % self.ws) % self.ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        H, W = x.shape[1], x.shape[2]

        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        wins = window_partition(y, self.ws)
        wins = WindowAttentionVertical(C, self.ws, self.num_heads,
                                       name="attn")(wins)
        y = window_reverse(wins, self.ws, H, W)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        x = x + _SwinMlp(C, name="mlp")(nn.LayerNorm(name="norm2")(x))
        if pad_b or pad_r:
            x = x[:, :H0, :W0]
        return x


class SwinTransformerBlockVertical(nn.Module):
    """(reference models/common.py:2375-2393)."""

    c2: int
    num_heads: int
    num_layers: int
    ws: int = 7
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="conv")(x, train)
        for i in range(self.num_layers):
            x = SwinTransformerLayerVertical(
                self.c2, self.num_heads, self.ws,
                shift=0 if i % 2 == 0 else self.ws // 2,
                name=f"blk_{i}")(x, train)
        return x


# ---------------------------------------------------------------------------
# CSP wrappers over Swin stacks
# ---------------------------------------------------------------------------


class C3STR(nn.Module):
    """C3 with a SwinTransformerBlock inner (reference models/common.py:2659-2665)."""

    c2: int
    n: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y1 = SwinTransformerBlock(c_, max(c_ // 32, 1), self.n,
                                  deploy=self.deploy, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class _STCSP(nn.Module):
    """Shared body for STCSPA/B/C and ST2CSPA/B/C
    (reference models/common.py:2668-2728, 3051-3107)."""

    c2: int
    n: int = 1
    variant: str = "A"
    v2: bool = False
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cba = lambda c, name: ConvBnAct(c, 1, 1, deploy=self.deploy, name=name)
        if self.variant == "B":
            c_ = int(self.c2)
            x1 = cba(c_, "cv1")(x, train)
            src1, src2 = x1, x1
        else:
            c_ = int(self.c2 * self.e)
            src1 = cba(c_, "cv1")(x, train)
            src2 = x
        y1 = SwinTransformerBlock(c_, max(c_ // 32, 1), self.n, v2=self.v2,
                                  deploy=self.deploy, name="m")(src1, train)
        if self.variant == "C":
            y1 = cba(c_, "cv3")(y1, train)
        y2 = cba(c_, "cv2")(src2, train)
        out_name = "cv4" if self.variant == "C" else "cv3"
        return cba(self.c2, out_name)(
            jnp.concatenate([y1, y2], axis=-1), train)


def STCSPA(c2, n=1, deploy=False, name=None):
    return _STCSP(c2, n, "A", False, deploy=deploy, name=name)


def STCSPB(c2, n=1, deploy=False, name=None):
    return _STCSP(c2, n, "B", False, deploy=deploy, name=name)


def STCSPC(c2, n=1, deploy=False, name=None):
    return _STCSP(c2, n, "C", False, deploy=deploy, name=name)


def ST2CSPA(c2, n=1, deploy=False, name=None):
    return _STCSP(c2, n, "A", True, deploy=deploy, name=name)


def ST2CSPB(c2, n=1, deploy=False, name=None):
    return _STCSP(c2, n, "B", True, deploy=deploy, name=name)


def ST2CSPC(c2, n=1, deploy=False, name=None):
    return _STCSP(c2, n, "C", True, deploy=deploy, name=name)
