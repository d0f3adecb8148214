"""Pallas TPU kernels for the flat int8 NECK region (round 5).

The round-3/4 channel-major q8 region stopped at the backbone: every
neck op (SPPCSPC, GSConv's 5x5 depthwise, the channel shuffle, the FPN
up/downsample glue) ran NHWC bf16, and the b32 trace bills the neck
~13 ms against a ~2.5 ms conv roofline — densified depthwise convs
(64x the real MACs on the MXU), strided-slice channel shuffles lowered
to gathers, and a layout flip on every block edge (BASELINE.md round-5
trace rollup).

These kernels keep the neck on the same flat (B, C, H*W) row-major int8
activations as the backbone region (ops/pallas/conv_flat.py):

- ``dwconv5x5_flat_q8`` — depthwise 5x5 (GSConv cv2, reference
  models/common.py:3807-3818) as 25 lane-shifted VPU FMAs on the flat
  slab: the MXU never sees the g-fold densified matrix, and the
  activation never leaves the region layout.
- ``spp_pools_flat`` — the SPPCSPC k=(5,9,13) stride-1 max pyramid
  (reference models/common.py:270-290) as three chained separable
  5-window max passes (5∘5=9, 9∘5=13 for max composition) in one
  kernel, emitting the 4-section concat [x, p5, p9, p13] directly.
  max commutes with the positive dequant scale, so the pyramid is pure
  int8 in/out at the producer's scale.
- ``conv3x3s2_flat_q8`` — stride-2 3x3 (GSConv downsample rows of the
  PAN, cfg l33/l49) via the stem's exact space-to-depth embedding:
  s2d to 4C channels, then the stride-1 flat kernel with the 3x3
  taps relaid on the {-1, 0} offset lattice (nn/blocks.py
  RepSBlock._stem_fast_q8 generalized to any C).
- ``upsample2x_flat`` / ``gs_shuffle_flat`` — nearest-2x and the GSConv
  even/odd channel shuffle as pure XLA data movement on int8 (the
  shuffle is a sublane-dim permutation here, not the minor-dim gather
  the NHWC graph paid 0.26 ms/layer for).

Layout/scale contract matches conv_flat.py: activations (B, C, H*W)
row-major int8 quantized at the consumer's calibrated input scale;
weights HWIO floats, packed at trace time.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rep_yolo_tpu.ops.pallas.conv_flat import (conv1x1_flat_q8,
                                               conv3x3_flat_q8,
                                               conv5x5_flat_q8)

# Route GSConv's depthwise 5x5 through the block-diagonal dense MXU
# kernel (conv5x5_flat_q8) instead of the VPU sliding window
# (dwconv5x5_flat_q8). Trace-time flag (set before the first traced
# forward); default decided by the interleaved hardware A/B
# (tools/ab_flag.py dw5_dense, BASELINE.md round-5).
DW5_DENSE = True


def set_dw5_dense(on: bool) -> None:
    global DW5_DENSE
    DW5_DENSE = bool(on)

_NEG = -1e9  # max-identity for f32 compute over int8 values


@dataclasses.dataclass
class FlatT:
    """A flat-region activation: ``data`` is (B, C, H*W) int8 row-major;
    ``scale`` is the dequant scale — a python float, or a per-channel
    numpy vector of length C aligned with ``data``'s channel order
    (produced by concats of sections quantized at different scales;
    consumers fold it into their weight rows at trace time, which is
    how the region stays exact across concat boundaries without a
    rescale op).

    ``perm`` (optional) is a logical->physical channel map: the tensor's
    LOGICAL channel c lives at ``data[:, perm[c]]``. The GSConv channel
    shuffle (reference models/common.py:3819-3825) sets it instead of
    moving bytes — consumers fold the permutation into their weight
    rows (a conv is invariant to a matched input-channel reorder), so
    the shuffle costs literally nothing in the int8 region (the eager
    sublane-gather version billed ~0.3 ms/GSConv of copies). Scale and
    perm are static metadata only — never traced."""

    data: jax.Array
    scale: float | np.ndarray
    h: int
    w: int
    perm: np.ndarray | None = None

    @property
    def c(self) -> int:
        return self.data.shape[1]

    def scale_vec(self) -> np.ndarray:
        if isinstance(self.scale, np.ndarray):
            return self.scale
        return np.full((self.c,), float(self.scale), np.float32)


def is_flat(x) -> bool:
    """True for a FlatT or a non-empty all-FlatT list (an unmaterialized
    concat — consumed by the 1x1 conv kernels as accumulating sections)."""
    if isinstance(x, FlatT):
        return True
    return (isinstance(x, (list, tuple)) and len(x) > 0
            and all(isinstance(t, FlatT) for t in x))


def flat_hw(x) -> tuple[int, int]:
    t = x if isinstance(x, FlatT) else x[0]
    return t.h, t.w


def quantize_to_flat(x_nhwc: jax.Array, s: float, h: int, w: int) -> FlatT:
    """NHWC float -> flat int8 region entry. Quantize BEFORE the
    transpose, behind a barrier (the DER-entry pattern: otherwise XLA
    hoists the relayout above the quantize and moves 2x the bytes)."""
    b, _, _, c = x_nhwc.shape
    xq = jnp.clip(jnp.round(x_nhwc.astype(jnp.float32) * (1.0 / s)),
                  -127, 127).astype(jnp.int8)
    xq = jax.lax.optimization_barrier(xq)
    return FlatT(jnp.transpose(xq, (0, 3, 1, 2)).reshape(b, c, h * w),
                 float(s), h, w)


def flat_to_nhwc(x) -> jax.Array:
    """Dequantize + relayout a FlatT (or unmaterialized concat) for an
    NHWC bf16 consumer (region exit). A pending channel permutation is
    applied here (the only place the shuffle ever moves bytes)."""
    if isinstance(x, (list, tuple)):
        return jnp.concatenate([flat_to_nhwc(t) for t in x], axis=-1)
    sv = x.scale_vec()
    if np.all(sv == sv[0]):
        out = x.data.astype(jnp.bfloat16) * jnp.bfloat16(float(sv[0]))
    else:
        out = x.data.astype(jnp.bfloat16) * jnp.asarray(
            sv, jnp.bfloat16)[None, :, None]
    if x.perm is not None:
        out = jnp.take(out, jnp.asarray(x.perm), axis=1)
    b, c = x.data.shape[:2]
    return jnp.transpose(out.reshape(b, c, x.h, x.w), (0, 2, 3, 1))


def materialize_perm(t: FlatT) -> FlatT:
    """Apply a pending channel permutation to the bytes (needed only by
    per-channel ops that cannot fold it — the depthwise kernel)."""
    if t.perm is None:
        return t
    p = jnp.asarray(t.perm)
    return FlatT(jnp.take(t.data, p, axis=1), t.scale_vec()[t.perm],
                 t.h, t.w)


def bf16_flat_to_nhwc(y: jax.Array, h: int, w: int) -> jax.Array:
    """(B, C, H*W) bf16 -> NHWC (exit of a block whose last conv emitted
    float)."""
    b, c = y.shape[:2]
    return jnp.transpose(y.reshape(b, c, h, w), (0, 2, 3, 1))


def quantize_flat_bf16(y: jax.Array, s: float, h: int, w: int) -> FlatT:
    """(B, C, H*W) float -> FlatT at scale s (re-entry after a float
    elementwise island, e.g. the GSBottleneck residual add)."""
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / s)),
                 -127, 127).astype(jnp.int8)
    return FlatT(q, float(s), h, w)


def _fold(kern: jax.Array, t: FlatT) -> jax.Array:
    """Fold a FlatT's per-input-channel dequant scales AND pending
    channel permutation into an HWIO kernel so the int8 dot runs with
    s_in = 1 on the raw physical data (the DER cv1 concat trick,
    generalized per-channel + per-permutation):

        y = sum_c w[c] * x_logical[c]
          = sum_j (w[inv_perm[j]] * scale[j]) * data[j]
    """
    kf = kern.astype(jnp.float32)
    if t.perm is not None:
        inv = np.empty_like(t.perm)
        inv[t.perm] = np.arange(len(t.perm))
        kf = jnp.take(kf, jnp.asarray(inv), axis=2)
    return kf * jnp.asarray(t.scale_vec(), jnp.float32)[None, None, :,
                                                        None]


def flat_conv(x, kern: jax.Array, bias: jax.Array, k: int, s: int, g: int,
              act: str | None, out_scale: float | None):
    """Dispatch a conv on flat int8 input(s) to the right kernel.

    x: FlatT or list[FlatT] (k==1 only — the unmaterialized concat).
    kern: (k, k, Cin/g, Cout) HWIO float; bias: (Cout,) or None.
    Returns FlatT at ``out_scale``, or raw (B, Cout, H'*W') bf16 when
    ``out_scale`` is None (caller decides flat-bf16 vs NHWC exit).
    """
    h, w = flat_hw(x)
    O = kern.shape[-1]
    if bias is None:
        bias = jnp.zeros((O,), jnp.float32)
    if isinstance(x, (list, tuple)):
        assert k == 1 and s == 1 and g == 1, (k, s, g)
        off, folded = 0, []
        for t in x:
            folded.append(_fold(kern[:, :, off:off + t.c], t))
            off += t.c
        y = conv1x1_flat_q8([t.data for t in x],
                            jnp.concatenate(folded, axis=2), bias,
                            1.0, act=act, out_scale=out_scale)
    elif k == 1:
        assert s == 1 and g == 1, (k, s, g)
        y = conv1x1_flat_q8(x.data, _fold(kern, x), bias,
                            1.0, act=act, out_scale=out_scale)
    elif k == 5 and g == x.c and O == x.c:
        if DW5_DENSE:
            # block-diagonal dense embedding -> MXU (conv5x5_flat_q8):
            # the C-fold MAC inflation runs ~20x faster than the VPU
            # sliding window (round-5 trace: 0.81 ms at 64ch@80x80 vs a
            # ~0.08 ms compute roofline), and the pending permutation
            # folds into the dense kernel like any other conv (no
            # materialize_perm)
            # eye-mask multiply, NOT .at[].set(): the scatter defeats
            # XLA's loop-invariant hoisting and re-ran every serving
            # iteration (~1.2 ms/iter of f32[C,5,5,C] weight prep in
            # the round-5 trace); the broadcast-multiply folds
            kd = (kern[:, :, 0, :].astype(jnp.float32)[:, :, None, :]
                  * jnp.eye(x.c, O, dtype=jnp.float32)[None, None])
            y = conv5x5_flat_q8(x.data, _fold(kd, x), bias, 1.0, h, w,
                                act=act, out_scale=out_scale)
        else:
            # depthwise VPU path: per-channel scale folds into the
            # (5,5,1,C) kernel (a pending permutation cannot fold
            # channel-wise: materialize)
            x = materialize_perm(x)
            kf = kern.astype(jnp.float32) * jnp.asarray(
                x.scale_vec(), jnp.float32)[None, None, None, :]
            y = dwconv5x5_flat_q8(x.data, kf, bias, 1.0, h, w, act=act,
                                  out_scale=out_scale)
    elif k == 3 and g == 1 and s == 1:
        y = conv3x3_flat_q8(x.data, _fold(kern, x), bias,
                            1.0, h, w, act=act, out_scale=out_scale)
    elif k == 3 and g == 1 and s == 2:
        y = conv3x3s2_flat_q8(x.data, _fold(kern, x), bias,
                              1.0, h, w, act=act, out_scale=out_scale)
        h, w = h // 2, w // 2
    else:
        raise ValueError(f"no flat kernel for k={k} s={s} g={g}")
    if out_scale is None:
        return y
    return FlatT(y, float(out_scale), h, w)


def _pick_tc(C: int, slab_lanes: int, bytes_per_lane: int = 12,
             budget: int = 2 << 20) -> int:
    """Channel tile: largest divisor of C (8-multiple, or C itself)
    whose f32 slab + accumulator + temporaries (~bytes_per_lane bytes
    per slab lane) fit the budget. The budget is deliberately small:
    Mosaic stack-allocates the unrolled tap temporaries on top of the
    declared scratch, and the scoped-vmem limit is a hard 16 MB (a
    TC=128 tile at 40x40 compiled to a 17 MB stack and was rejected)."""
    for tc in sorted((d for d in range(1, C + 1) if C % d == 0
                      and (d % 8 == 0 or d == C)), reverse=True):
        if tc * slab_lanes * bytes_per_lane <= budget:
            return tc
    return 1


def _dw5_kernel(x_ref, w_ref, b_ref, y_ref, slab, acc, *, TC, H, W,
                act, s_in, out_scale, out_dtype):
    """Whole-image depthwise 5x5 program for one (batch, channel-tile).

    slab: (TC, 2W + H*W + 2W + pad) f32 — the image contiguous in the
    flat layout with 2 zero halo rows each side; taps are whole-extent
    lane-shifted slices with an iota mask killing the columns that wrap
    across row seams (conv_flat's im2col idiom). A strided-row variant
    (zero gutters between rows, per-row writes, no masks) MEASURED
    SLOWER on hardware (l17 dw 0.86 -> 1.41 ms): the H small unaligned
    (TC, W) vector writes are latency-bound and cost more than the 20
    masked selects they remove — keep everything whole-extent.

    Accumulation: functional within each kernel row (4 live
    temporaries), one ``acc`` scratch RMW per row — 5 RMW passes
    instead of 25 (the per-tap-RMW version tripled VPU traffic; the
    fully functional version blew Mosaic's 16 MB scoped stack at
    (128, 40x40))."""
    HW = H * W
    db = 2 * W + 2
    if x_ref.dtype == jnp.int8:
        vals = x_ref[0].astype(jnp.float32)
    else:
        vals = jnp.clip(jnp.round(x_ref[0].astype(jnp.float32)
                                  * (1.0 / s_in)), -127, 127)
    slab[:, :] = jnp.zeros(slab.shape, jnp.float32)
    slab[:, pl.ds(db, HW)] = vals

    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1) % W
    # hoisted wrap masks (reused across the 5 kernel rows): as 0/1 f32
    # multiplicands — a multiply fuses into the FMA chain where a
    # vselect is an extra op per tap
    edge = {dv: jnp.where((col < -dv) if dv < 0 else (col >= W - dv),
                          0.0, 1.0)
            for dv in (-2, -1, 1, 2)}
    for u in range(5):
        row = None
        for v in range(5):
            dv = v - 2
            val = slab[:, pl.ds(db + (u - 2) * W + dv, HW)]
            wv = w_ref[:, u * 5 + v][:, None]
            t = (wv * val if dv == 0
                 else (wv * val) * edge[dv])
            row = t if row is None else row + t
        if u == 0:
            acc[:, :] = row
        else:
            acc[:, :] = acc[:, :] + row
    y = acc[:, :] + b_ref[:, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act is not None:
        raise ValueError(act)
    if out_scale is not None:
        y_ref[0, :, :] = jnp.clip(jnp.round(y * (1.0 / out_scale)),
                                  -127, 127).astype(jnp.int8)
    else:
        y_ref[0, :, :] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "s_in", "act",
                                             "out_scale"))
def dwconv5x5_flat_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                      s_in: float, H: int, W: int,
                      act: str | None = "silu",
                      out_scale: float | None = None) -> jax.Array:
    """Depthwise 5x5 stride-1 conv on a flat (B, C, H*W) activation.

    x: (B, C, H*W) int8 (at ``s_in``) or float (quantized in-kernel);
    w: (5, 5, 1, C) HWIO depthwise kernel (or (5, 5, C)); bias: (C,).
    Returns (B, C, H*W) bf16, or int8 at ``out_scale``.

    The conv runs on the VPU (25 lane-shifted FMAs), not the MXU: a
    depthwise conv has C independent 1-channel stencils, which the MXU
    can only express as a g-fold-sparse dense matrix (the
    DENSE_GROUPED rewrite pays 64x the MACs at C=64; the XLA VPU path
    pays a layout flip on each side). s_in is folded into the weights
    at trace time, so the kernel accumulates on raw int values.
    """
    B, C, HW = x.shape
    assert HW == H * W, (x.shape, H, W)
    if w.ndim == 4:
        assert w.shape[:3] == (5, 5, 1), w.shape
        w = w[:, :, 0]
    wf = jnp.transpose(w, (2, 0, 1)).reshape(C, 25).astype(jnp.float32)
    wf = wf * jnp.float32(s_in)
    b2 = bias.reshape(C, 1).astype(jnp.float32)

    slab_lanes = H * W + 4 * W + 128
    # stack per program ~= slab + acc + ~5 live row temporaries; the
    # 16 MB scoped-vmem limit allows a generous tile, and fewer grid
    # programs amortize per-program overhead (TC=16 at 80x80 measured
    # ~4.7 us of overhead per 2 us of compute)
    TC = _pick_tc(C, slab_lanes, bytes_per_lane=30, budget=8 << 20)
    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    kernel = functools.partial(
        _dw5_kernel, TC=TC, H=H, W=W, act=act, s_in=float(s_in),
        out_scale=out_scale, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, C // TC),
        in_specs=[
            pl.BlockSpec((1, TC, HW), lambda b, c: (b, c, 0)),
            pl.BlockSpec((TC, 25), lambda b, c: (c, 0)),
            pl.BlockSpec((TC, 1), lambda b, c: (c, 0)),
        ],
        out_specs=pl.BlockSpec((1, TC, HW), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, HW), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TC, slab_lanes), jnp.float32),
            pltpu.VMEM((TC, HW), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, wf, b2)


def _spp_kernel(x_ref, y_ref, slab, slab2, *, C, H, W):
    """One batch program: emit [x, p5, p9, p13] (4C, H*W) by three
    chained separable 5-window max passes (max-pool composition:
    5∘5 = 9, 9∘5 = 13). All compute in f32 (exact for int8 values;
    Mosaic has no int8 vector max on this target).

    Contiguous flat layout with 2 -inf halo rows each side, filled
    ONCE (the data region overwrite never touches them). Horizontal
    shifts mask the wrap columns with the iota idiom; vertical shifts
    move whole rows — halo rows are -inf, no mask needed. A
    strided-row-gutter variant with per-row writes MEASURED SLOWER
    (0.50 -> 0.82 ms at b32: latency-bound small vector writes)."""
    HW = H * W
    db = 2 * W + 2
    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1) % W

    y_ref[0, pl.ds(0, C), :] = x_ref[0]
    slab[:, :] = jnp.full(slab.shape, _NEG, jnp.float32)
    slab2[:, :] = jnp.full(slab2.shape, _NEG, jnp.float32)
    slab[:, pl.ds(db, HW)] = x_ref[0].astype(jnp.float32)

    for sec in range(1, 4):
        # horizontal 5-window max (wrap columns masked to -inf)
        m = slab[:, pl.ds(db, HW)]
        for dv in (-2, -1, 1, 2):
            val = slab[:, pl.ds(db + dv, HW)]
            if dv < 0:
                val = jnp.where(col < -dv, _NEG, val)
            else:
                val = jnp.where(col >= W - dv, _NEG, val)
            m = jnp.maximum(m, val)
        slab2[:, pl.ds(db, HW)] = m
        # vertical 5-window max: whole-row shifts, halos are -inf
        out = m
        for du in (-2, -1, 1, 2):
            out = jnp.maximum(out, slab2[:, pl.ds(db + du * W, HW)])
        y_ref[0, pl.ds(sec * C, C), :] = out.astype(x_ref.dtype)
        if sec < 3:
            slab[:, pl.ds(db, HW)] = out   # chain: 5∘5 = 9, 9∘5 = 13


@functools.partial(jax.jit, static_argnames=("H", "W"))
def spp_pools_flat(x: jax.Array, H: int, W: int) -> jax.Array:
    """SPPCSPC max pyramid on a flat (B, C, H*W) tensor: returns the
    (B, 4*C, H*W) concat [x, mp5(x), mp9(x), mp13(x)] (stride-1,
    same-pad, reference models/common.py:283). int8 passes through at
    the producer's scale (max commutes with the positive dequant).
    Whole-image per program — SPPCSPC runs at the /32 level (20x20)
    where the full (C, HW) block is a few hundred KB."""
    B, C, HW = x.shape
    assert HW == H * W, (x.shape, H, W)
    slab_lanes = HW + 4 * W + 128
    return pl.pallas_call(
        functools.partial(_spp_kernel, C=C, H=H, W=W),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, HW), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 4 * C, HW), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4 * C, HW), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, slab_lanes), jnp.float32),
            pltpu.VMEM((C, slab_lanes), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x)


def conv3x3s2_flat_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                      s_in: float, H: int, W: int,
                      act: str | None = "silu",
                      out_scale: float | None = None) -> jax.Array:
    """Stride-2 3x3 conv on a flat (B, C, H*W) int8 activation via the
    exact space-to-depth decomposition (the stem fast path's trick,
    nn/blocks.py RepSBlock._stem_fast_q8, generalized to any C):
    s2d to (B, 4C, (H/2)*(W/2)), then the stride-1 flat kernel with
    each 3x3 tap embedded at its {-1, 0} offset / phase slot (the v=2 /
    u=2 taps carry zero weights). Returns (B, O, (H/2)*(W/2))."""
    B, C, HW = x.shape
    assert HW == H * W and H % 2 == 0 and W % 2 == 0, (x.shape, H, W)
    O = w.shape[-1]
    H2, W2 = H // 2, W // 2
    # phase-slice s2d (stem_glue_bench: the 6D reshape+transpose lowers
    # to serial ~7 GB/s copies; ReOrg-style slices measured 1.5x faster)
    x4 = x.reshape(B, C, H, W)
    phases = [x4[:, :, ph::2, qw::2] for ph in (0, 1) for qw in (0, 1)]
    xs = jnp.stack(phases, axis=1).reshape(B, 4 * C, H2 * W2)
    CP = -(-4 * C // 8) * 8
    if CP > 4 * C:
        xs = jnp.pad(xs, ((0, 0), (0, CP - 4 * C), (0, 0)))
    w3 = jnp.zeros((3, 3, CP, O), jnp.float32)
    # tap (di, dj) of the original 3x3 reads input row 2i+di-1 =
    # phase (di+1)%2, s2d index i + {-1,0}; same for columns
    for ap, pph, di in ((0, 1, 0), (1, 0, 1), (1, 1, 2)):
        for bq, qph, dj in ((0, 1, 0), (1, 0, 1), (1, 1, 2)):
            ch = (pph * 2 + qph) * C
            w3 = w3.at[ap, bq, ch:ch + C].set(
                w[di, dj].astype(jnp.float32))
    return conv3x3_flat_q8(xs, w3, bias, float(s_in), H2, W2, act=act,
                           out_scale=out_scale)


def upsample2x_flat(x: jax.Array, H: int, W: int) -> jax.Array:
    """Nearest-neighbor 2x upsample on a flat (B, C, H*W) tensor ->
    (B, C, 4*H*W) (rows of the (2H, 2W) image in flat order). Pure XLA
    broadcast — int8 in, int8 out at the same scale."""
    B, C, HW = x.shape
    assert HW == H * W, (x.shape, H, W)
    y = x.reshape(B, C, H, 1, W, 1)
    y = jnp.broadcast_to(y, (B, C, H, 2, W, 2))
    return y.reshape(B, C, 4 * HW)


def gs_shuffle_flat(x: jax.Array) -> jax.Array:
    """GSConv channel shuffle (even-indexed channels first, then odd —
    reference models/common.py:3819-3825) on a flat (B, C, H*W) tensor:
    a fixed permutation of the sublane dim (one relayout copy), not the
    minor-dim strided gather the NHWC graph pays."""
    return jnp.concatenate([x[:, 0::2, :], x[:, 1::2, :]], axis=1)
