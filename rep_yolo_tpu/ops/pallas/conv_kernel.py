"""Pallas TPU kernels: fused small-channel convolutions, channel-major.

XLA's conv lowering pads BOTH the input-channel (K) and output-channel (N)
GEMM dimensions of an NHWC conv to 128 lanes, so the Rep-YOLO stem —
3x3 convs at 48 and 24 channels over 320x320 maps, ~40% of all model
FLOPs — runs at ~(48/128)^2 = 14% MXU utilization (~20 TF/s measured on
v5e). These kernels reformulate the conv as K-packed row GEMMs in a
channel-major (B, C, H, W) layout:

    y[o, h, w] = sum_{(u,v,c)} W[o, (v,u,c)] * xpad[c, h+u, w+v]

- K = 9*C (432 for C=48) -> ~84% K-dim utilization instead of 37%;
- a halo'd row slab is DMA'd from HBM once per row-tile; the (9C, W)
  im2col row is assembled by cheap in-VMEM lane-shift copies;
- bias + activation are fused into the epilogue (every stem conv is
  conv+SiLU after deploy fusion), so each conv is exactly one HBM read
  plus one HBM write;
- M = O stays sub-128 — that waste is fundamental to the model's channel
  widths, not the kernel.

`conv1x1_cmajor` is the matching pointwise GEMM (XLA's 1x1 conv at these
shapes measured ~6 TF/s, far below even the HBM roofline).

The `_q8` variants are the int8 PTQ path (ops/quant.py scales): the MXU
runs int8 at ~2x bf16 peak, but routing int8 through XLA convs measured
*slower* end-to-end because XLA materializes every s32 accumulator to
HBM in a mixed graph (BASELINE.md int8 probes). Here quant -> s32 dot ->
dequant+bias+act all happen inside one kernel, so only bf16 (or int8,
for chained quantized convs) ever crosses HBM.

Layout contract: activations (B, C, H, W); weights HWIO like the rest of
the framework (transposed/packed/quantized at trace time, constant-folded
by XLA). Wired into the deploy graph by ConvUnit's channel-major fast
path (nn/blocks.py set_cmajor_deploy), which fuses each conv's activation
into the kernel epilogue; adjacent kernels' NHWC<->NCHW boundary
transposes are inverse pairs that XLA cancels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(y, bias, act):
    y = y + bias
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    if act is None:
        return y
    raise ValueError(act)


def _conv3_kernel(xpf_ref, w_ref, b_ref, y_ref, slab, xv, *, C, O,
                  TH, W, WP, act, out_dtype):
    """One (batch, row-tile) program.

    xpf_ref: (B, C, (H+2)*WP) in HBM — the padded input with rows flattened
    into the lane dim, so BOTH the slab DMA and every im2col copy are pure
    lane-range operations (sublane-indexed reads cost a relayout each; lane
    shifts are single vector ops). w_ref (O, 9C), b_ref (O, 1) VMEM;
    y_ref block (1, O, TH*W). Scratch: slab (C, (TH+2)*WP) — one aligned
    halo'd row-slab DMA — and xv (9C, TH*WP), the im2col tile in the
    *padded*-width coordinate system:
        xv[(v*3+u)*C + c, j] = slab[c, u*WP + v + j]
    i.e. ONE whole-slab lane-shifted copy per (u, v) tap — 9 big copies
    instead of 9*TH row-sized ones (the small-copy variant measured
    copy-bound, slower than XLA's conv at b32). The dot then runs over
    TH*WP columns (~WP/W extra MACs); the valid W columns per output row
    sit at j = h*WP + w and are sliced out row-wise in the epilogue.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    def load(sem):
        cp = pltpu.make_async_copy(
            xpf_ref.at[b, :, pl.ds(i * TH * WP, (TH + 2) * WP)],
            slab.at[:, pl.ds(0, (TH + 2) * WP)], sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    for u in range(3):
        for v in range(3):
            src = u * WP + v
            xv[pl.ds((v * 3 + u) * C, C), :] = slab[:, src:src + TH * WP]
    y = jnp.dot(w_ref[:, :], xv[:, :],
                preferred_element_type=jnp.float32)        # (O, TH*WP)
    y = _epilogue(y, b_ref[:, :], act).astype(out_dtype)
    for h in range(TH):
        y_ref[0, :, pl.ds(h * W, W)] = y[:, h * WP:h * WP + W]


@functools.partial(jax.jit, static_argnames=("act", "row_tile"))
def conv3x3_cmajor(x: jax.Array, w: jax.Array, bias: jax.Array,
                   act: str | None = "silu",
                   row_tile: int | None = None) -> jax.Array:
    """Fused 3x3 stride-1 conv + bias + act, channel-major.

    x: (B, C, H, W); w: (3, 3, C, O) HWIO; bias: (O,).
    Returns (B, O, H, W) in x.dtype.
    """
    B, C, H, W = x.shape
    O = w.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0, (H, TH)

    # pad width to a 128 multiple (the DMA lane extent per row), flatten
    # rows into the lane dim so all kernel copies are lane-range ops
    wp = -(-(W + 2) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, wp - W - 1)))
    xpf = xp.reshape(B, C, (H + 2) * wp)
    # w9[o, (v,u,c)] = w[u, v, c, o] — matches xv assembly order (v-major)
    w9 = jnp.transpose(w, (3, 1, 0, 2)).reshape(O, 9 * C).astype(x.dtype)
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    kernel = functools.partial(_conv3_kernel, C=C, O=O, TH=TH, W=W, WP=wp,
                               act=act, out_dtype=x.dtype)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # xpf stays in HBM
            pl.BlockSpec((O, 9 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, H * W), x.dtype),
        scratch_shapes=[
            # +128 lanes: the (u=2, v>0) taps read `v` lanes past the
            # DMA'd slab; the overread lands in the padded-width garbage
            # columns that the row-wise epilogue slicing discards
            pltpu.VMEM((C, (TH + 2) * wp + 128), x.dtype),
            pltpu.VMEM((9 * C, TH * wp), x.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xpf, w9, b2)
    return y.reshape(B, O, H, W)   # trailing-dim split: free in XLA


def pick_row_tile(h: int, w: int | None = None, cap: int = 16) -> int:
    """Row-slab grid tile: largest divisor of `h` <= cap whose output
    block lane count t*w is 128-aligned (Mosaic requires the last block
    dim to be divisible by 128 or equal to the array dim). Falls back to
    t == h (whole-height tile == full array dim, always legal; the
    caller's selection predicate must keep that within VMEM)."""
    for t in range(min(cap, h), 0, -1):
        if h % t == 0 and (w is None or (t * w) % 128 == 0):
            return t
    return h


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def quantize_weights(w9: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: (O, K) -> int8 (O, K), f32 (O, 1)
    scales. Trace-time on constants (XLA folds it)."""
    w9 = w9.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w9), axis=1, keepdims=True), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w9 / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w


def _q8_epilogue(acc_s32, sw_ref, b_ref, s_in, act, out_scale, out_dtype):
    """Dequant + bias + activation (+ requant for int8-resident chains)."""
    y = acc_s32.astype(jnp.float32) * (sw_ref[:, :] * s_in) + b_ref[:, :]
    y = _epilogue(y, jnp.float32(0.0), act)
    if out_scale is not None:
        return jnp.clip(jnp.round(y * (1.0 / out_scale)),
                        -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def _conv3_q8_kernel(xpf_ref, w_ref, sw_ref, b_ref, y_ref, slab, xv, *,
                     C, O, TH, W, WP, act, s_in, out_scale, out_dtype, KP):
    """int8 row-tile program: same dataflow as _conv3_kernel, with the
    input slab quantized once in VMEM (or DMA'd already-int8 when the
    producer was itself a quantized conv), an int8 MXU dot accumulating
    in s32, and dequant+bias+act fused into the epilogue — the s32
    accumulator never exists outside this kernel (BASELINE.md: XLA's
    mixed-graph int8 relays s32 through HBM at 1.3-2.5 ms per conv)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    def load(sem):
        cp = pltpu.make_async_copy(
            xpf_ref.at[b, :, pl.ds(i * TH * WP, (TH + 2) * WP)],
            slab.at[:, pl.ds(0, (TH + 2) * WP)], sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    if slab.dtype == jnp.int8:
        slab_q = slab[:, :]
    else:
        slab_q = jnp.clip(jnp.round(slab[:, :].astype(jnp.float32)
                                    * (1.0 / s_in)), -127, 127
                          ).astype(jnp.int8)
    if KP > 9 * C:
        xv[pl.ds(9 * C, KP - 9 * C), :] = jnp.zeros(
            (KP - 9 * C, TH * WP), jnp.int8)
    for u in range(3):
        for v in range(3):
            src = u * WP + v
            xv[pl.ds((v * 3 + u) * C, C), :] = slab_q[:, src:src + TH * WP]
    acc = jnp.dot(w_ref[:, :], xv[:, :],
                  preferred_element_type=jnp.int32)         # (O, TH*WP)
    y = _q8_epilogue(acc, sw_ref, b_ref, s_in, act, out_scale, out_dtype)
    for h in range(TH):
        y_ref[0, :, pl.ds(h * W, W)] = y[:, h * WP:h * WP + W]


@functools.partial(jax.jit, static_argnames=("s_in", "act", "out_scale",
                                             "row_tile"))
def conv3x3_cmajor_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                      s_in: float, act: str | None = "silu",
                      out_scale: float | None = None,
                      row_tile: int | None = None) -> jax.Array:
    """Fused int8 3x3 stride-1 conv: quant -> s32 dot -> dequant+bias+act.

    x: (B, C, H, W) float (quantized in-kernel with scale `s_in`) or
    already-int8 (a chained quantized producer emitted it with this
    scale); w: (3, 3, C, O) HWIO float; bias: (O,).
    Returns (B, O, H, W) bf16, or int8 when `out_scale` is given.
    """
    B, C, H, W = x.shape
    O = w.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0, (H, TH)

    wp = _round_up(W + 2, 128)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, wp - W - 1)))
    xpf = xp.reshape(B, C, (H + 2) * wp)
    w9 = jnp.transpose(w, (3, 1, 0, 2)).reshape(O, 9 * C)
    w_q, s_w = quantize_weights(w9)
    KP = _round_up(9 * C, 32)
    if KP > 9 * C:
        w_q = jnp.pad(w_q, ((0, 0), (0, KP - 9 * C)))
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    kernel = functools.partial(
        _conv3_q8_kernel, C=C, O=O, TH=TH, W=W, WP=wp, act=act,
        s_in=float(s_in), out_scale=out_scale, out_dtype=out_dtype, KP=KP)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # xpf stays in HBM
            pl.BlockSpec((O, KP), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
        scratch_shapes=[
            # +128 lanes: tap overread into discarded columns (see
            # _conv3_kernel)
            pltpu.VMEM((C, (TH + 2) * wp + 128), x.dtype),
            pltpu.VMEM((KP, TH * wp), jnp.int8),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xpf, w_q, s_w, b2)
    return y.reshape(B, O, H, W)


def _conv1_q8_kernel(x_ref, w_ref, sw_ref, b_ref, y_ref, *, act, s_in,
                     out_scale, out_dtype):
    if x_ref.dtype == jnp.int8:
        xq = x_ref[0]
    else:
        xq = jnp.clip(jnp.round(x_ref[0].astype(jnp.float32)
                                * (1.0 / s_in)), -127, 127).astype(jnp.int8)
    acc = jnp.dot(w_ref[:, :], xq, preferred_element_type=jnp.int32)
    y_ref[0, :, :] = _q8_epilogue(acc, sw_ref, b_ref, s_in, act,
                                  out_scale, out_dtype)


@functools.partial(jax.jit, static_argnames=("s_in", "act", "out_scale",
                                             "row_tile"))
def conv1x1_cmajor_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                      s_in: float, act: str | None = "silu",
                      out_scale: float | None = None,
                      row_tile: int | None = None) -> jax.Array:
    """Fused int8 1x1 conv + bias + act, channel-major (see conv3x3_cmajor_q8)."""
    B, C, H, W = x.shape
    w2 = w.reshape(C, -1)
    O = w2.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0, (H, TH)
    w_q, s_w = quantize_weights(jnp.transpose(w2))          # (O, C)
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    kernel = functools.partial(_conv1_q8_kernel, act=act, s_in=float(s_in),
                               out_scale=out_scale, out_dtype=out_dtype)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec((1, C, TH * W), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(B, C, H * W), w_q, s_w, b2)
    return y.reshape(B, O, H, W)


def _conv1_kernel(x_ref, w_ref, b_ref, y_ref, *, act, out_dtype):
    y = jnp.dot(w_ref[:, :], x_ref[0],
                preferred_element_type=jnp.float32)        # (O, TH*W)
    y_ref[0, :, :] = _epilogue(y, b_ref[:, :], act).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("act", "row_tile"))
def conv1x1_cmajor(x: jax.Array, w: jax.Array, bias: jax.Array,
                   act: str | None = "silu",
                   row_tile: int | None = None) -> jax.Array:
    """Fused 1x1 conv + bias + act, channel-major.

    x: (B, C, H, W); w: (1, 1, C, O) or (C, O); bias: (O,).
    """
    B, C, H, W = x.shape
    w2 = w.reshape(C, -1)
    O = w2.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0, (H, TH)
    wt = jnp.transpose(w2).astype(x.dtype)                 # (O, C)
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    kernel = functools.partial(_conv1_kernel, act=act, out_dtype=x.dtype)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec((1, C, TH * W), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, H * W), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(B, C, H * W), wt, b2)
    return y.reshape(B, O, H, W)
