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

from rep_yolo_tpu.nn import blocks
from rep_yolo_tpu.nn.initializers import (
    conv_kernel_init,
    conv_bias_init_for,
    implicit_init,
)


def _head_conv(no_na: int, c1: int, name: str) -> nn.Conv:
    return nn.Conv(no_na, (1, 1), use_bias=True,
                   kernel_init=conv_kernel_init,
                   bias_init=conv_bias_init_for(c1),
                   precision=blocks.CONV_PRECISION,
                   name=name)


# Serving-mode head-conv lane padding (set_head_pad): the 1x1 head convs
# have O = na*no = 18 outputs; in the full deploy graph XLA assigns them
# a batch-minor layout and the b128 trace bills them 5.5 + 2.7 + 2.5 ms
# for ~6 GFLOP (~0.35 TF/s). Padding the (constant) kernel to a full
# 128-lane tile and slicing the result is exact — but MEASURED A WASH
# end-to-end at b128 (154.0 vs 154.0 ms predict+NMS, round 4): XLA's
# algebraic simplifier or the surrounding relayouts absorb the change.
# Kept off by default as an option for future layer-layout experiments.
HEAD_PAD = False


def set_head_pad(enabled: bool) -> None:
    """Trace-time global (same contract as blocks.set_conv_precision:
    set BEFORE the first trace; jit caches are not keyed on it)."""
    global HEAD_PAD
    HEAD_PAD = enabled


class _PaddedHeadConv(nn.Module):
    """Drop-in for _head_conv with the output-channel pad+slice. Declares
    nn.Conv's exact param names/shapes ('kernel' (1,1,c1,no_na), 'bias'
    (no_na,)) so checkpoints are interchangeable with the plain head."""

    no_na: int
    c1: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param("kernel", conv_kernel_init,
                       (1, 1, self.c1, self.no_na))
        b = self.param("bias", conv_bias_init_for(self.c1), (self.no_na,))
        P = -(-self.no_na // 128) * 128
        dt = jnp.result_type(x, k)
        kp = jnp.pad(k.astype(dt), ((0, 0),) * 3 + ((0, P - self.no_na),))
        y = jax.lax.conv_general_dilated(
            x, kp, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=blocks.CONV_PRECISION)
        return y[..., :self.no_na] + b.astype(dt)


def _make_head_conv(no_na: int, c1: int, name: str):
    if HEAD_PAD:
        return _PaddedHeadConv(no_na, c1, name=name)
    return _head_conv(no_na, c1, name)


class _HeadConvParams(nn.Module):
    """Param mirror of the plain head nn.Conv ({kernel, bias}, same
    names/shapes) for the flat int8 region path — checkpoints stay
    interchangeable (same pattern as _PaddedHeadConv)."""

    no_na: int
    c1: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", conv_kernel_init,
                       (1, 1, self.c1, self.no_na))
        b = self.param("bias", conv_bias_init_for(self.c1), (self.no_na,))
        return k, b


def _flat_head_level(parent: nn.Module, x, no_na: int, c1: int, i: int):
    """Run one head level's 1x1 conv on a flat int8 input (FlatT): the
    conv consumes the region tensor directly (per-channel scales folded
    into the weight rows) and the raw map exits to NHWC bf16 — the only
    relayout is of the tiny (B, na*no, H*W) output."""
    from rep_yolo_tpu.ops.pallas import neck_flat as nf

    kern, bias = _HeadConvParams(no_na, c1, name=f"m_{i}")()
    y = nf.flat_conv(x, kern, bias, 1, 1, 1, None, None)  # (B,no_na,HW)
    b = y.shape[0]
    return jnp.transpose(y, (0, 2, 1)).reshape(b, x.h, x.w, no_na)


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
            y = _make_head_conv(self.no * self.na, self.ch[i], f"m_{i}")(x)
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
        from rep_yolo_tpu.ops.pallas import neck_flat as nf

        outs = []
        for i, x in enumerate(xs):
            if isinstance(x, nf.FlatT):
                assert self.deploy and not train
                y = _flat_head_level(self, x, self.no * self.na,
                                     self.ch[i], i)
            else:
                if not self.deploy:
                    ia = self.param(f"ia_{i}", implicit_init(0.0),
                                    (1, 1, 1, self.ch[i]))
                    x = x + ia
                y = _make_head_conv(self.no * self.na, self.ch[i],
                                    f"m_{i}")(x)
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
            y = _make_head_conv(self.no * self.na, self.ch[i], f"m_{i}")(x)
            if not self.deploy:
                im = self.param(f"im_{i}", implicit_init(1.0),
                                (1, 1, 1, self.no * self.na))
                y = y * im
            b, h, w, _ = y.shape
            lead.append(y.reshape(b, h, w, self.na, self.no))
        if not self.deploy:
            for i in range(nl):
                y = _make_head_conv(self.no * self.na, self.ch[nl + i], f"m2_{i}")(xs[nl + i])
                b, h, w, _ = y.shape
                aux.append(y.reshape(b, h, w, self.na, self.no))
        return lead + aux


class IBin(nn.Module):
    """Binned-regression detect head (reference models/yolo.py:421-494):
    width/height are predicted as SigmoidBin(bin_count, 0..4) encodings
    instead of direct regression; xy/obj/cls as in IDetect.
    Raw output layout per anchor: [x, y, w_bin(22), h_bin(22), obj, cls...].
    """

    nc: int
    anchors: tuple
    ch: tuple
    bin_count: int = 21
    deploy: bool = False

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def bin_length(self) -> int:
        return self.bin_count + 1

    @property
    def no(self) -> int:
        # nc + x,y,obj + two bin encodings (reference models/yolo.py:432-435)
        return self.nc + 3 + 2 * self.bin_length

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            if not self.deploy:
                ia = self.param(f"ia_{i}", implicit_init(0.0), (1, 1, 1, self.ch[i]))
                x = x + ia
            y = _make_head_conv(self.no * self.na, self.ch[i], f"m_{i}")(x)
            if not self.deploy:
                im = self.param(f"im_{i}", implicit_init(1.0),
                                (1, 1, 1, self.no * self.na))
                y = y * im
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h, w, self.na, self.no))
        return outs


class IKeypoint(nn.Module):
    """Keypoint head (reference models/yolo.py:202-300): implicit-wrapped
    detect conv for [box+obj+cls] plus a keypoint conv emitting
    3*nkpt channels (x, y, conf per keypoint), channel-concatenated.
    """

    nc: int
    anchors: tuple
    ch: tuple
    nkpt: int = 17
    dw_conv_kpt: bool = False
    deploy: bool = False

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no_det(self) -> int:
        return self.nc + 5

    @property
    def no_kpt(self) -> int:
        return 3 * self.nkpt

    @property
    def no(self) -> int:
        return self.no_det + self.no_kpt

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        from rep_yolo_tpu.nn.blocks import ConvBnAct, dw_groups

        outs = []
        for i, x in enumerate(xs):
            det_in = x
            if not self.deploy:
                ia = self.param(f"ia_{i}", implicit_init(0.0), (1, 1, 1, self.ch[i]))
                det_in = det_in + ia
            det = _head_conv(self.no_det * self.na, self.ch[i], f"m_{i}")(det_in)
            if not self.deploy:
                im = self.param(f"im_{i}", implicit_init(1.0),
                                (1, 1, 1, self.no_det * self.na))
                det = det * im
            if self.dw_conv_kpt:
                # 6x (DWConv3x3 + Conv1x1) refinement stack then 1x1
                # (reference models/yolo.py:228-234)
                k = x
                c = self.ch[i]
                for j in range(6):
                    k = ConvBnAct(c, 3, 1, g=dw_groups(c, c),
                                  name=f"m_kpt_{i}_dw{j}")(k, train)
                    if j < 5:
                        k = ConvBnAct(c, 1, 1, name=f"m_kpt_{i}_pw{j}")(k, train)
                kpt = _head_conv(self.no_kpt * self.na, c, f"m_kpt_{i}")(k)
            else:
                kpt = _head_conv(self.no_kpt * self.na, self.ch[i],
                                 f"m_kpt_{i}")(x)
            b, h, w, _ = det.shape
            det = det.reshape(b, h, w, self.na, self.no_det)
            kpt = kpt.reshape(b, h, w, self.na, self.no_kpt)
            outs.append(jnp.concatenate([det, kpt], axis=-1))
        return outs


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


def decode_topk(ps: Sequence[jax.Array], anchors_px: jax.Array,
                strides: Sequence[float], k: int = 1024,
                conf_thres: float | None = None,
                approx: bool = False) -> jax.Array:
    """Serving-path decode: select the top-`k` candidates on the RAW
    objectness logits, then decode only those k rows in f32.

    The exact path (decode_predictions) sigmoids + transposes the full
    (B, N, no) map stack (N=25200 at 640px) before NMS discards all but
    ~1k rows; at b32 that is ~3 ms of elementwise + relayout traffic.
    Sigmoid is monotonic, so for nc==1 models (score == obj, reference
    utils/general.py:994-996) ranking raw obj logits selects EXACTLY the
    same candidate set — this path is exact for the flagship. For nc>1
    it is an obj-only prefilter (score = obj*cls may reorder the tail);
    callers needing exact multi-class semantics use the full decode.

    Grid/anchor/stride constants are folded into one (N, 5) table that
    XLA constant-folds; only a (B, k, 5) gather + tiny f32 math runs per
    step. Rows come out score-descending (not the reference's torch row
    order — NMS is order-insensitive past score sorting).
    Decode semantics match reference models/yolo.py:129-130.

    conf_thres: apply the reference's objectness gate (utils/general.py:962)
    at the LOGIT level before selection (sigmoid(t) > c <=> t > logit(c),
    exact); gated rows decode with obj forced to a large negative logit so
    downstream score masks reject them. With the gate applied here and
    rows score-descending, `non_max_suppression(..., presorted=True)` can
    skip its own full-set top_k.

    approx=True ranks with jax.lax.approx_max_k (TPU PartialReduce,
    recall_target 0.99 per bucket, then an exact sorted top-k over the
    retained set) instead of the full-sort lax.top_k — a serving-only
    trade: a tail candidate (beyond the top ~1% per bucket) can be
    dropped before NMS. Eval paths keep the exact selection.
    """
    import numpy as np

    no = ps[0].shape[-1]
    flats, tables = [], []
    for i, p in enumerate(ps):
        b, h, w, na, _ = p.shape
        flats.append(p.reshape(b, h * w * na, no))
        # constant per-slot [grid_x, grid_y, anchor_w, anchor_h, stride]
        # in the same natural (h, w, a) flatten order as the reshape
        gy, gx = np.mgrid[0:h, 0:w]
        g = np.stack([gx, gy], -1)[:, :, None, :]
        g = np.broadcast_to(g, (h, w, na, 2)).reshape(-1, 2)
        a = np.broadcast_to(np.asarray(anchors_px)[i][None, None],
                            (h, w, na, 2)).reshape(-1, 2)
        s = np.full((h * w * na, 1), strides[i], np.float32)
        tables.append(np.concatenate([g, a, s], 1).astype(np.float32))
    raw = jnp.concatenate(flats, axis=1)                 # (B, N, no)
    table = jnp.asarray(np.concatenate(tables, 0))       # (N, 5)
    k = min(k, raw.shape[1])
    obj = raw[..., 4].astype(jnp.float32)                # logits
    if conf_thres is not None:
        import math

        gate = math.log(conf_thres / (1.0 - conf_thres))
        obj = jnp.where(obj > gate, obj, -1e4)
    if approx:
        _, idx = jax.lax.approx_max_k(obj, k, recall_target=0.99)
    else:
        _, idx = jax.lax.top_k(obj, k)                   # (B, k)
    sel = jnp.take_along_axis(raw, idx[..., None], axis=1).astype(
        jnp.float32)
    if conf_thres is not None:
        # re-apply the gate on the gathered rows so rejected slots decode
        # to score 0 regardless of their original logit
        g = jnp.take_along_axis(obj, idx, axis=1)
        sel = sel.at[..., 4].set(jnp.where(g > -1e4, sel[..., 4], -1e4))
    t = table[idx]                                       # (B, k, 5)
    y = jax.nn.sigmoid(sel)
    xy = (y[..., 0:2] * 2.0 - 0.5 + t[..., 0:2]) * t[..., 4:5]
    wh = (y[..., 2:4] * 2.0) ** 2 * t[..., 2:4]
    return jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)


def decode_level_bin(p: jax.Array, anchors_px: jax.Array, stride: float,
                     bin_count: int = 21, nc: int = 1) -> jax.Array:
    """Decode one IBin raw map to (B, H*W*na, nc+5) pixel predictions
    (reference models/yolo.py:460-489): xy as usual; w/h via SigmoidBin
    over the post-sigmoid map, scaled by the anchor."""
    from rep_yolo_tpu.ops.sigmoid_bin import SigmoidBinSpec

    spec = SigmoidBinSpec(bin_count=bin_count, vmin=0.0, vmax=4.0)
    L = spec.length
    b, h, w, na, no = p.shape
    y = jax.nn.sigmoid(p)
    grid = make_grid(h, w, y.dtype)[None, :, :, None, :]
    xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    pw = spec.forward(y[..., 2:2 + L]) * anchors_px[None, None, None, :, 0]
    ph = spec.forward(y[..., 2 + L:2 + 2 * L]) \
        * anchors_px[None, None, None, :, 1]
    rest = y[..., 2 + 2 * L:]                      # obj, cls...
    out = jnp.concatenate([xy, pw[..., None], ph[..., None], rest], axis=-1)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, na * h * w, nc + 5)


def decode_level_kpt(p: jax.Array, anchors_px: jax.Array, stride: float,
                     nc: int, nkpt: int) -> jax.Array:
    """Decode one IKeypoint raw map to (B, H*W*na, nc+5+3*nkpt)
    (reference models/yolo.py:255-284): det part as IDetect; keypoint
    x/y decoded WITHOUT sigmoid (raw * 2 - 0.5 + grid) * stride, keypoint
    conf sigmoided."""
    b, h, w, na, no = p.shape
    no_det = nc + 5
    det = jax.nn.sigmoid(p[..., :no_det])
    kpt = p[..., no_det:]
    grid = make_grid(h, w, det.dtype)[None, :, :, None, :]
    xy = (det[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (det[..., 2:4] * 2.0) ** 2 * anchors_px.astype(det.dtype)[None, None, None]
    kx = (kpt[..., 0::3] * 2.0 - 0.5 + grid[..., 0:1]) * stride
    ky = (kpt[..., 1::3] * 2.0 - 0.5 + grid[..., 1:2]) * stride
    kc = jax.nn.sigmoid(kpt[..., 2::3])
    kpts = jnp.stack([kx, ky, kc], axis=-1).reshape(*kpt.shape[:-1], 3 * nkpt)
    out = jnp.concatenate([xy, wh, det[..., 4:], kpts], axis=-1)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, na * h * w, no)
