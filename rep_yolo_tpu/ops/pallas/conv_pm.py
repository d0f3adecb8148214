"""Pallas TPU kernels v3: fused int8 convolutions on flat PIXEL-MAJOR
(B, H*W, C) activations — a free bitcast of NHWC.

The v2 channel-major kernels (ops/pallas/conv_flat.py) eliminated the
XLA glue *between* the DER block's convs, but the block edges still
cost ~8 ms of the b32 forward (trace, round 3): the NHWC->NCHW entry
copy (1.9 ms), the separate quantize fusion (0.9 ms) + reshape
(0.8 ms), the NCHW->NHWC exit copy (2.4 ms), and channel-major max
pools running 2.5 ms where native NHWC reduce_window costs 0.2 ms.

Pixel-major kills all of it: (B, H*W, C) is exactly NHWC's row-major
memory image, so the stem conv's natural output feeds the first kernel
with NO transpose, the block output IS NHWC (bitcast), and the MPs
between DER blocks stay native XLA. The MXU does not care: the dot
becomes acc[pixels, O] = xv[pixels, 9C] @ w[9C, O] — the same 48/128
lane underfill as the channel-major orientation's (O, 9C) @ (9C,
pixels), just transposed. What changes:

- im2col taps are SUBLANE-shifted reads of the halo slab (pixel p, tap
  (u, v) -> slab row p + (u-1)*W + (v-1)); the wrapped columns of the
  flat layout are zeroed by an iota-mod row mask, mirroring v2;
- the halo DMA slices the *sublane* dim, whose alignment quantum is 32
  rows (int8 tiling) instead of 128 lanes — same constant-residue
  alignment trick as v2's _data_base, 4x cheaper slack;
- the epilogue's per-output-channel scales broadcast along LANES
  ((1, O) against (rows, O)) — the natural direction.

`conv1x1_pm_q8` needs no scratch at all: a 1x1 conv over pixel-major
activations is a plain (rows, C) @ (C, O) matmul per block, and the
DER 3-way concat (reference models/common.py:3652-3654) folds into
per-section accumulating dots exactly as in v2.

Layout contract: activations (B, H*W, C) row-major (bitcast of NHWC);
weights HWIO (quantized at trace time, constant-folded by XLA). Wired
into the deploy graph by DERBlock's fast path (nn/blocks.py
set_cmajor_deploy mode "q8").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rep_yolo_tpu.ops.pallas.conv_kernel import (
    _round_up, pick_row_tile, quantize_weights)

# sublane alignment quantum: int8 VMEM tiles are (32, 128); a 32-row
# guard also covers the u=0,v=0 tap's one-row under-read at pixel 0
_SUB = 32


def _row_base(W: int) -> int:
    """Slab row where the tile's halo row (abs pixel (i*TH-1)*W) starts.

    DMA slices of the sublane dim must be 32-row aligned. The raw source
    start (i*TH-1)*W has residue (-W) % 32 — constant across tiles
    because pick_row_tile guarantees (TH*W) % 32 == 0 — so every branch
    widens its copy to the enclosing aligned window and the kernel reads
    data at this fixed unaligned base."""
    return _SUB + (-W) % _SUB


def _load_slab_pm(x_ref, slab, b, i, *, TH, W, H):
    """One aligned DMA of pixel rows [(i*TH-1)*W, (i*TH+TH+1)*W) into
    slab rows [_row_base, _row_base + (TH+2)*W); edge tiles memset the
    missing halo row. Mirrors conv_flat._load_slab with the sliced dim
    on sublanes (32-quantum) instead of lanes (128-quantum)."""
    n_tiles = H // TH
    C = slab.shape[-1]
    r = (-W) % _SUB
    db = _SUB + r

    def copy(src_row0, size, dst_row0, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(src_row0, size), :],
            slab.at[pl.ds(dst_row0, size), :], sem)
        cp.start()
        cp.wait()

    def zero_rows(r0):
        slab[pl.ds(r0, W), :] = jnp.zeros((W, C), slab.dtype)

    if n_tiles == 1:
        zero_rows(db)
        zero_rows(db + (TH + 1) * W)
        # pixels 0..TH*W-1 land at slab rows db+W..; dst offset db+W is
        # aligned (r + W = rnd32(W)); size TH*W is a 32-multiple
        pl.run_scoped(functools.partial(copy, 0, TH * W, db + W),
                      pltpu.SemaphoreType.DMA(()))
        return

    @pl.when(i == 0)
    def _first():
        zero_rows(db)
        size0 = _round_up((TH + 1) * W, _SUB)
        pl.run_scoped(functools.partial(copy, 0, size0, db + W),
                      pltpu.SemaphoreType.DMA(()))

    # src start (i*TH-1)*W - r as an explicit multiple of 32 so Mosaic's
    # divisibility prover accepts the dynamic offset ((TH*W) % 32 == 0
    # and (W + r) % 32 == 0 make it exact)
    def src0(idx):
        return (idx * (TH * W // _SUB) - (W + r) // _SUB) * _SUB

    @pl.when(i == n_tiles - 1)
    def _last():
        zero_rows(db + (TH + 1) * W)
        # exactly (TH+1)*W + r rows: ends at H*W — aligned, no overrun
        def go(sem):
            copy(src0(i), (TH + 1) * W + r, _SUB, sem)
        pl.run_scoped(go, pltpu.SemaphoreType.DMA(()))

    @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
    def _interior():
        def go(sem):
            copy(src0(i), _round_up((TH + 2) * W + r, _SUB), _SUB, sem)
        pl.run_scoped(go, pltpu.SemaphoreType.DMA(()))


def _im2col_taps_pm(slab_q, xv, *, C, TH, W):
    """xv[j, (v*3+u)*C + c] = x_pad[h+u-1, w+v-1, c] for j = h*W + w,
    from the halo'd slab (pixel row p of the tile at slab row
    _row_base + W + p). Taps v=0 / v=2 wrap across row seams in the
    flat layout; an iota-mod row mask zeroes exactly the wrapped pixels
    (the zero-pad semantics)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (TH * W, 1), 0) % W
    left_edge = col == 0         # v=0 garbage: reads prev row's last col
    right_edge = col == W - 1    # v=2 garbage: reads next row's first col
    zero = jnp.zeros((TH * W, C), slab_q.dtype)
    db = _row_base(W)
    for u in range(3):
        for v in range(3):
            off = db + u * W + (v - 1)
            val = slab_q[off:off + TH * W, :]
            if v == 0:
                val = jnp.where(left_edge, zero, val)
            elif v == 2:
                val = jnp.where(right_edge, zero, val)
            xv[:, pl.ds((v * 3 + u) * C, C)] = val


def _q8_epilogue_pm(acc_s32, sw_ref, b_ref, s_in, act, out_scale,
                    out_dtype):
    """Dequant + bias + activation (+ requant when chaining): all
    per-output-channel terms broadcast along lanes ((1, O) vs (R, O))."""
    y = acc_s32.astype(jnp.float32) * (sw_ref[:, :] * s_in) + b_ref[:, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act is not None:
        raise ValueError(f"unknown act {act}")
    if out_scale is not None:
        return jnp.clip(jnp.round(y * (1.0 / out_scale)),
                        -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def _conv3_pm_q8_kernel(x_ref, w_ref, sw_ref, b_ref, y_ref, slab, xv, *,
                        TH, W, H, act, s_in, out_scale, out_dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = slab.shape[-1]
    _load_slab_pm(x_ref, slab, b, i, TH=TH, W=W, H=H)
    if slab.dtype == jnp.int8:
        slab_q = slab[:, :]
    else:
        slab_q = jnp.clip(jnp.round(slab[:, :].astype(jnp.float32)
                                    * (1.0 / s_in)), -127, 127
                          ).astype(jnp.int8)
    _im2col_taps_pm(slab_q, xv, C=C, TH=TH, W=W)
    acc = jnp.dot(xv[:, :], w_ref[:, :],
                  preferred_element_type=jnp.int32)          # (TH*W, O)
    y_ref[0, :, :] = _q8_epilogue_pm(acc, sw_ref, b_ref, s_in, act,
                                     out_scale, out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "s_in", "act",
                                             "out_scale", "row_tile"))
def conv3x3_pm_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                  s_in: float, H: int, W: int, act: str | None = "silu",
                  out_scale: float | None = None,
                  row_tile: int | None = None) -> jax.Array:
    """Fused int8 3x3 stride-1 conv on a flat pixel-major (B, H*W, C)
    activation (bitcast of NHWC): in-kernel halo, quant -> s32 dot ->
    dequant+bias+act (+requant when `out_scale` chains into another
    quantized conv).

    x: (B, H*W, C) float (quantized in-kernel at `s_in`) or already
    int8; w: (3, 3, C, O) HWIO float; bias: (O,). Returns (B, H*W, O)
    bf16, or int8 at `out_scale`.
    """
    B, HW, C = x.shape
    assert HW == H * W, (x.shape, H, W)
    O = w.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0 and (TH * W) % _SUB == 0, (H, W, TH)

    # tap order (v*3+u) matches _im2col_taps_pm: (kw, kh, C) -> rows
    w9 = jnp.transpose(w, (1, 0, 2, 3)).reshape(9 * C, O)
    w_q, s_w = quantize_weights(w9.T)                     # (O, 9C)
    w_q = w_q.T                                           # (9C, O) int8
    KP = _round_up(9 * C, _SUB)
    if KP > 9 * C:
        w_q = jnp.pad(w_q, ((0, KP - 9 * C), (0, 0)))
    sw_row = s_w.reshape(1, O)
    b_row = bias.reshape(1, O).astype(jnp.float32)

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    kernel = functools.partial(
        _conv3_pm_q8_kernel, TH=TH, W=W, H=H, act=act, s_in=float(s_in),
        out_scale=out_scale, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # x stays in HBM
            pl.BlockSpec((KP, O), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH * W, O), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, O), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_row_base(W) + (TH + 2) * W + _SUB, C), x.dtype),
            pltpu.VMEM((TH * W, KP), jnp.int8),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, w_q, sw_row, b_row)


def _conv1_pm_q8_kernel(*refs, n_in, act, s_in, out_scale, out_dtype):
    x_refs = refs[:n_in]
    w_refs = refs[n_in:2 * n_in]
    sw_ref, b_ref, y_ref = refs[2 * n_in:2 * n_in + 3]
    acc = None
    for x_ref, w_ref in zip(x_refs, w_refs):
        if x_ref.dtype == jnp.int8:
            xq = x_ref[0]
        else:
            xq = jnp.clip(jnp.round(x_ref[0].astype(jnp.float32)
                                    * (1.0 / s_in)), -127, 127
                          ).astype(jnp.int8)
        d = jnp.dot(xq, w_ref[:, :], preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    y_ref[0, :, :] = _q8_epilogue_pm(acc, sw_ref, b_ref, s_in, act,
                                     out_scale, out_dtype)


@functools.partial(jax.jit, static_argnames=("s_in", "act", "out_scale",
                                             "row_tile"))
def conv1x1_pm_q8(x, w: jax.Array, bias: jax.Array, s_in: float,
                  act: str | None = "silu",
                  out_scale: float | None = None,
                  row_tile: int | None = None) -> jax.Array:
    """Fused int8 1x1 conv on flat pixel-major (B, H*W, C) activation(s)
    — a plain per-block (rows, C) @ (C, O) matmul, no scratch.

    `x` may be a single array or a LIST of arrays (B, HW, Ci): the list
    form computes conv(concat(xs, axis=-1)) without materializing the
    concat — one accumulating dot per section (the DER 3-way concat,
    reference models/common.py:3652). All list entries must share the
    input scale treatment: either pre-quantized int8 (scale folded into
    `w` per-section by the caller) or floats quantized at `s_in`.
    w: (1, 1, sum(Ci), O) HWIO float; bias: (O,).
    """
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    B, HW, _ = xs[0].shape
    w2 = w.reshape(w.shape[-2], w.shape[-1])                  # (sum C, O)
    O = w2.shape[-1]
    # one global per-output-channel scale across all sections (exactness:
    # quantize the transposed full matrix once, then split rows)
    w_q, s_w = quantize_weights(jnp.transpose(w2))            # (O, sum C)
    w_q = jnp.transpose(w_q)                                  # (sum C, O)
    splits, off = [], 0
    for xi in xs:
        Ci = xi.shape[-1]
        splits.append(w_q[off:off + Ci, :])
        off += Ci
    assert off == w2.shape[0], (off, w2.shape)
    sw_row = s_w.reshape(1, O)
    b_row = bias.reshape(1, O).astype(jnp.float32)

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    # VMEM bytes per pixel row: input sections + the output block
    bpl = sum(xi.shape[-1] * xi.dtype.itemsize for xi in xs)
    bpl += O * (1 if out_dtype == jnp.int8 else 2)
    TH = row_tile or _pm_tile(HW, bytes_per_row=bpl)
    kernel = functools.partial(
        _conv1_pm_q8_kernel, n_in=len(xs), act=act, s_in=float(s_in),
        out_scale=out_scale, out_dtype=out_dtype)
    in_specs = [pl.BlockSpec((1, TH, xi.shape[-1]), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM) for xi in xs]
    in_specs += [pl.BlockSpec(ws.shape, lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM) for ws in splits]
    in_specs += [pl.BlockSpec((1, O), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, O), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kernel,
        grid=(B, HW // TH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, O), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, O), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(*xs, *splits, sw_row, b_row)


def _pm_tile(hw: int, bytes_per_row: int = 64,
             vmem_budget: int = 2 << 20) -> int:
    """Row tile for a 1x1 conv over a flat pixel-major activation: the
    largest 32-multiple divisor of `hw` whose VMEM-resident blocks fit
    the budget (Mosaic double-buffers every grid-indexed block, so the
    true footprint is ~4x this figure). Falls back to the whole array
    when no 32-multiple divides `hw` — truncating the grid would
    silently drop output rows."""
    cap = max(_SUB, (vmem_budget // max(bytes_per_row, 1)) // _SUB * _SUB)
    for cand in range(min(cap, hw // _SUB * _SUB), _SUB - 1, -_SUB):
        if hw % cand == 0:
            return cand
    return hw
