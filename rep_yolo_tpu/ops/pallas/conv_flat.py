"""Pallas TPU kernels v2: glue-free fused convolutions on flat row-major
(B, C, H*W) activations.

The first-generation channel-major kernels (ops/pallas/conv_kernel.py)
required the caller to pad the width to a 128 multiple and flatten rows
in XLA before every conv. At the target batch (b32, 640px) that XLA glue
— pad copies, 3D<->4D reshape relayouts, the pre-cv1 concat — measured
~12 ms of the DER l1 block's 31.7 ms (trace rollup, round 3), and the
lane padding (WP=384 for W=322) wasted 19% of the MXU columns.

These v2 kernels take the activation exactly as the previous kernel (or
a single XLA transpose at the region edge) produced it: a flat
(B, C, H*W) row-major array, i.e. a free bitcast of (B, C, H, W). The
convolution halo is handled *inside* the kernel:

- the row slab is DMA'd per (batch, row-tile) program directly from the
  unpadded input with one contiguous copy (edge tiles memset the missing
  halo row);
- the width wrap of the flat layout (output col 0 tap v=-1 reads the
  previous row's last pixel instead of a zero pad) is fixed by masking
  the two affected im2col taps with an iota-modulo select — no padded
  copy of the activation ever exists;
- everything else (K=9C im2col packing, int8 MXU dot with s32
  accumulation, dequant+bias+SiLU epilogue, int8-resident chaining via
  `out_scale`) matches the v1 kernels.

`conv1x1_flat_q8` additionally accepts a LIST of inputs: the DER block's
3-way concat (reference models/common.py:3652-3654) is folded into the
cv1 kernel as per-section accumulating dots, eliminating the concat copy.

Layout contract: activations (B, C, H*W) row-major; weights HWIO like
the rest of the framework (packed/quantized at trace time, constant-
folded by XLA). Wired into the deploy graph by DERBlock's channel-major
fast path (nn/blocks.py set_cmajor_deploy mode "q8").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rep_yolo_tpu.ops.pallas.conv_kernel import (
    _epilogue, _q8_epilogue, _round_up, pick_row_tile, quantize_weights)

# left guard so tap offset -1 at the first data lane stays in bounds;
# the garbage it reads is killed by the v=0 tap mask
_PAD = 128


def _data_base(W: int, halo: int = 1) -> int:
    """Slab lane where the tile's first halo row (abs row i*TH-halo)
    starts.

    Mosaic requires DMA slices on tiled refs to be 128-lane aligned. The
    raw source start (i*TH-halo)*W has residue (-halo*W) % 128 — CONSTANT
    across tiles because pick_row_tile guarantees (TH*W) % 128 == 0 — so
    every branch below widens its copy to the enclosing aligned window
    and the kernel reads data at this fixed unaligned base instead."""
    return _PAD + (-halo * W) % 128


def _slab_dma(x_ref, slab, sem, b, i, *, C, TH, W, H, wait: bool,
              halo: int = 1):
    """Start (wait=False) or wait on (wait=True) the aligned slab DMA of
    rows [i*TH-halo, i*TH+TH+halo) into slab lanes [_data_base,
    _data_base+(TH+2*halo)*W). The wait side reconstructs the IDENTICAL
    descriptor (same (b, i) -> same pl.when case -> same static size),
    which is the Pallas idiom for cross-grid-step async copies. All DMA
    starts/sizes are 128-lane aligned by construction (see _data_base)."""
    n_tiles = H // TH
    off = (-halo * W) % 128
    db = _PAD + off

    def copy(src_lane0, size, dst_lane0):
        cp = pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(src_lane0, size)],
            slab.at[:, pl.ds(dst_lane0, size)], sem)
        cp.wait() if wait else cp.start()

    if n_tiles == 1:
        # image rows 0..TH-1 land at tile rows halo..TH+halo-1; src start
        # 0 and size TH*W are aligned; dst db+halo*W is aligned
        # (off + halo*W = rnd128(halo*W))
        copy(0, TH * W, db + halo * W)
        return

    @pl.when(i == 0)
    def _first():
        copy(0, _round_up((TH + halo) * W, 128), db + halo * W)

    # src start (i*TH-halo)*W - off as an explicit multiple of 128 so
    # Mosaic's divisibility prover accepts the dynamic slice offset
    # ((TH*W) % 128 == 0 and (halo*W+off) % 128 == 0 make it exact)
    def src0(idx):
        return (idx * (TH * W // 128) - (halo * W + off) // 128) * 128

    @pl.when(i == n_tiles - 1)
    def _last():
        # exactly (TH+halo)*W + off lanes: ends at H*W — aligned, no
        # overrun
        copy(src0(i), (TH + halo) * W + off, _PAD)

    @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
    def _interior():
        copy(src0(i), _round_up((TH + 2 * halo) * W + off, 128), _PAD)


def _zero_halo(slab, i, *, C, TH, W, H, halo: int = 1):
    """Memset the missing halo row(s) of edge tiles. Disjoint from every
    DMA destination range of the same tile, so it is safe to run while
    that tile's slab DMA is in flight."""
    n_tiles = H // TH
    db = _data_base(W, halo)

    def zero_row(r):
        slab[:, pl.ds(db + r * W, W)] = jnp.zeros((C, W), slab.dtype)

    if n_tiles == 1:
        for r in range(halo):
            zero_row(r)
            zero_row(TH + halo + r)
        return

    @pl.when(i == 0)
    def _first():
        for r in range(halo):
            zero_row(r)

    @pl.when(i == n_tiles - 1)
    def _last():
        for r in range(halo):
            zero_row(TH + halo + r)


def _load_slab(x_ref, slab, b, i, *, C, TH, W, H, halo: int = 1):
    """Synchronous slab load (start + wait in one grid step)."""
    _zero_halo(slab, i, C=C, TH=TH, W=W, H=H, halo=halo)

    def go(sem):
        _slab_dma(x_ref, slab, sem, b, i, C=C, TH=TH, W=W, H=H,
                  wait=False, halo=halo)
        _slab_dma(x_ref, slab, sem, b, i, C=C, TH=TH, W=W, H=H,
                  wait=True, halo=halo)

    pl.run_scoped(go, pltpu.SemaphoreType.DMA(()))


def _im2col_taps(slab_q, xv, *, C, TH, W, CP=None):
    """xv[(v*3+u)*CP + c, j] = x_pad[c, h+u-1, w+v-1] for j = h*W + w, from
    the flat slab (row r of the halo'd tile at lanes _PAD + r*W). Taps
    v=0 / v=2 wrap across row seams in the flat layout; an iota-mod mask
    zeroes exactly the wrapped columns (the zero-pad semantics).

    CP > C places each tap's C-row block at a 32-aligned sublane offset
    (int8 VMEM tiles are (32, 128): C=48 writes at offsets 48k straddle
    tiles and lower to shifted stores). The CP-C pad rows are never
    written — they hold garbage that multiplies against the zero rows
    the weight packing inserts at the same offsets."""
    CP = CP or C
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TH * W), 1) % W
    left_edge = col == 0         # v=0 garbage: reads prev row's last col
    right_edge = col == W - 1    # v=2 garbage: reads next row's first col
    zero = jnp.zeros((C, TH * W), slab_q.dtype)
    db = _data_base(W)
    for u in range(3):
        for v in range(3):
            off = db + u * W + (v - 1)
            val = slab_q[:, off:off + TH * W]
            if v == 0:
                val = jnp.where(left_edge, zero, val)
            elif v == 2:
                val = jnp.where(right_edge, zero, val)
            xv[pl.ds((v * 3 + u) * CP, C), :] = val


def _pick_col_chunks(TH: int, W: int) -> int:
    """Column-chunk count for the software-pipelined tile interior: split
    the TH*W output columns so each chunk is a 128-multiple >= 512 lanes
    (chunk boundaries stay lane-tile-aligned; dots stay wide enough to
    amortize MXU issue). 1 = the single-shot interior."""
    n = TH * W
    for k in (4, 2):
        if n % k == 0 and (n // k) % 128 == 0 and n // k >= 512:
            return k
    return 1


def _taps_chunk(slab_q, xv, n0, CH, *, C, W, CP):
    """im2col taps for output columns [n0, n0+CH) only (same math as
    _im2col_taps, iota offset by n0)."""
    db = _data_base(W)
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) + n0) % W
    left_edge = col == 0
    right_edge = col == W - 1
    zero = jnp.zeros((C, CH), slab_q.dtype)
    for u in range(3):
        for v in range(3):
            off = db + u * W + (v - 1) + n0
            val = slab_q[:, off:off + CH]
            if v == 0:
                val = jnp.where(left_edge, zero, val)
            elif v == 2:
                val = jnp.where(right_edge, zero, val)
            xv[pl.ds((v * 3 + u) * CP, C), pl.ds(n0, CH)] = val


def _tile_interior(slab_q, xv, w_ref, sw_ref, b_ref, y_ref, *, C, TH, W,
                   CP, act, s_in, out_scale, out_dtype, col_chunks):
    """Tile interior: im2col -> int8 MXU dot -> dequant/act/requant.

    col_chunks > 1 software-pipelines the interior over column chunks:
    chunk k+1's tap extraction (VPU) is issued before chunk k's epilogue
    (VPU), so the VPU work of one chunk overlaps the MXU dot of the next
    — the round-3 trace showed the single-shot interior serializing
    ~0.85 ms of im2col+epilogue behind each 0.9 ms dot on the l1 st
    shapes (2.53 ms/kernel vs the fill-adjusted ~0.9 roofline)."""
    if col_chunks <= 1:
        _im2col_taps(slab_q, xv, C=C, TH=TH, W=W, CP=CP)
        acc = jnp.dot(w_ref[:, :], xv[:, :],
                      preferred_element_type=jnp.int32)      # (O, TH*W)
        y_ref[0, :, :] = _q8_epilogue(acc, sw_ref, b_ref, s_in, act,
                                      out_scale, out_dtype)
        return
    CH = TH * W // col_chunks

    def dot(k):
        return jnp.dot(w_ref[:, :], xv[:, pl.ds(k * CH, CH)],
                       preferred_element_type=jnp.int32)     # (O, CH)

    def epi(k, acc):
        y_ref[0, :, pl.ds(k * CH, CH)] = _q8_epilogue(
            acc, sw_ref, b_ref, s_in, act, out_scale, out_dtype)

    _taps_chunk(slab_q, xv, 0, CH, C=C, W=W, CP=CP)
    acc_prev = dot(0)
    for k in range(1, col_chunks):
        _taps_chunk(slab_q, xv, k * CH, CH, C=C, W=W, CP=CP)
        acc_k = dot(k)
        epi(k - 1, acc_prev)
        acc_prev = acc_k
    epi(col_chunks - 1, acc_prev)


def _conv3_flat_q8_kernel(x_ref, w_ref, sw_ref, b_ref, y_ref, slab, xv, *,
                          C, O, TH, W, H, act, s_in, out_scale,
                          out_dtype, CP, col_chunks=1):
    b = pl.program_id(0)
    i = pl.program_id(1)
    _load_slab(x_ref, slab, b, i, C=C, TH=TH, W=W, H=H)
    if slab.dtype == jnp.int8:
        slab_q = slab[:, :]
    else:
        slab_q = jnp.clip(jnp.round(slab[:, :].astype(jnp.float32)
                                    * (1.0 / s_in)), -127, 127
                          ).astype(jnp.int8)
    _tile_interior(slab_q, xv, w_ref, sw_ref, b_ref, y_ref, C=C, TH=TH,
                   W=W, CP=CP, act=act, s_in=s_in, out_scale=out_scale,
                   out_dtype=out_dtype, col_chunks=col_chunks)


def _conv3_flat_q8_kernel_pipe(x_ref, w_ref, sw_ref, b_ref, y_ref,
                               slab_a, slab_b, xv, sem_a, sem_b, *,
                               B, C, O, TH, W, H, act, s_in, out_scale,
                               out_dtype, CP, col_chunks=1):
    """Software-pipelined variant: grid (B, n_tiles//2, 2). Each (b, j)
    pair covers tiles 2j (phase h=0, slab A) and 2j+1 (h=1, slab B); the
    NEXT tile's slab DMA is always started before the current tile's
    compute, so the HBM read of tile n+1 overlaps the im2col+dot of tile
    n (the sync kernel serialized them: start -> wait -> dot per step,
    round-3 trace: 2.53 ms vs ~0.9 fill-adjusted roofline on the l1 st
    shapes). Both slab refs are static — the A/B alternation lives in the
    grid's phase dimension, not in a dynamically indexed buffer."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    h = pl.program_id(2)
    n_tiles = H // TH
    n_pairs = n_tiles // 2

    def issue(slab, sem, bb, ii):
        _zero_halo(slab, ii, C=C, TH=TH, W=W, H=H)
        _slab_dma(x_ref, slab, sem, bb, ii, C=C, TH=TH, W=W, H=H,
                  wait=False)

    def compute(slab):
        if slab.dtype == jnp.int8:
            slab_q = slab[:, :]
        else:
            slab_q = jnp.clip(jnp.round(slab[:, :].astype(jnp.float32)
                                        * (1.0 / s_in)), -127, 127
                              ).astype(jnp.int8)
        _tile_interior(slab_q, xv, w_ref, sw_ref, b_ref, y_ref, C=C,
                       TH=TH, W=W, CP=CP, act=act, s_in=s_in,
                       out_scale=out_scale, out_dtype=out_dtype,
                       col_chunks=col_chunks)

    @pl.when(h == 0)
    def _phase_a():
        @pl.when(jnp.logical_and(b == 0, j == 0))
        def _prologue():
            issue(slab_a, sem_a, 0, 0)

        issue(slab_b, sem_b, b, 2 * j + 1)        # overlaps compute(A)
        _slab_dma(x_ref, slab_a, sem_a, b, 2 * j, C=C, TH=TH, W=W, H=H,
                  wait=True)
        compute(slab_a)

    @pl.when(h == 1)
    def _phase_b():
        # prefetch the next pair's A tile (possibly the next image);
        # slab A's last read finished in phase h=0 of this same pair
        @pl.when(b * n_pairs + j + 1 < B * n_pairs)
        def _prefetch():
            roll = j + 1 >= n_pairs
            nb = jnp.where(roll, b + 1, b)
            ni = jnp.where(roll, 0, 2 * j + 2)
            issue(slab_a, sem_a, nb, ni)

        _slab_dma(x_ref, slab_b, sem_b, b, 2 * j + 1, C=C, TH=TH, W=W,
                  H=H, wait=True)
        compute(slab_b)


def _conv3_flat_q8_kernel_whole(x_ref, w_ref, sw_ref, b_ref, y_ref, slab,
                                xv, *, C, O, TH, W, H, act, s_in,
                                out_scale, out_dtype, CP, col_chunks=1):
    """Whole-image variant (H == TH): the image arrives as a VMEM block
    (no manual DMA — small deep-stage images like 40x40 have no
    128-multiple lane extent, so _load_slab's aligned copies cannot
    express them; vector writes have no such constraint)."""
    db = _data_base(W)
    if x_ref.dtype == jnp.int8:
        xq = x_ref[0]
    else:
        xq = jnp.clip(jnp.round(x_ref[0].astype(jnp.float32)
                                * (1.0 / s_in)), -127, 127).astype(jnp.int8)
    zero = jnp.zeros((C, W), jnp.int8)
    slab[:, pl.ds(db, W)] = zero                       # top halo row
    slab[:, pl.ds(db + W, TH * W)] = xq
    slab[:, pl.ds(db + (TH + 1) * W, W)] = zero        # bottom halo row
    _tile_interior(slab[:, :], xv, w_ref, sw_ref, b_ref, y_ref, C=C,
                   TH=TH, W=W, CP=CP, act=act, s_in=s_in,
                   out_scale=out_scale, out_dtype=out_dtype,
                   col_chunks=col_chunks)


@functools.partial(jax.jit, static_argnames=("H", "W", "s_in", "act",
                                             "out_scale", "row_tile",
                                             "col_chunks"))
def conv3x3_flat_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                    s_in: float, H: int, W: int, act: str | None = "silu",
                    out_scale: float | None = None,
                    row_tile: int | None = None,
                    col_chunks: int | None = None) -> jax.Array:
    """Fused int8 3x3 stride-1 conv on a flat (B, C, H*W) activation:
    in-kernel halo, quant -> s32 dot -> dequant+bias+act (+requant when
    `out_scale` chains into another quantized conv).

    x: (B, C, H*W) float (quantized in-kernel at `s_in`) or already-int8;
    w: (3, 3, C, O) HWIO float; bias: (O,). Returns (B, O, H*W) bf16, or
    int8 at `out_scale`.

    (A `tap_align` option — 32-row padding of each im2col tap block for
    aligned VMEM stores at the cost of a wider dot — was removed in
    round 4: a 9-round interleaved A/B with a negative control measured
    it a WASH on all three target shapes; BASELINE.md round-4 table.)
    """
    B, C, HW = x.shape
    assert HW == H * W, (x.shape, H, W)
    O = w.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0, (H, TH)

    CP = C
    w9 = jnp.transpose(w, (3, 1, 0, 2))                       # (O,3,3,C)
    if CP > C:
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, 0), (0, CP - C)))
    w9 = w9.reshape(O, 9 * CP)
    w_q, s_w = quantize_weights(w9)
    KP = _round_up(9 * CP, 32)
    if KP > 9 * CP:
        w_q = jnp.pad(w_q, ((0, 0), (0, KP - 9 * CP)))
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    # the pipelined kernel needs an even tile count: shrink TH if that
    # buys one (e.g. 80x80: TH 16 -> 8 turns 5 tiles into 10)
    if row_tile is None and (H // TH) % 2 == 1 and H // TH > 1:
        for t in range(TH - 1, 0, -1):
            if H % t == 0 and (t * W) % 128 == 0 and (H // t) % 2 == 0:
                TH = t
                break

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    n_tiles = H // TH
    if col_chunks is None:
        # default: single shot. The chunked interior MEASURED A SLIGHT
        # LOSS on hardware (round 4, interleaved A/B median-of-5: l1 st
        # 2.43 -> 2.47 ms, l1 mid 1.15 -> 1.19, l5 st 0.53 -> 0.59) —
        # Mosaic's own instruction scheduling already overlaps what it
        # can, and the per-chunk iota/mask/slice bookkeeping adds more
        # VPU work than the pipelining hides. Kept as an option for
        # future shapes where the interior dominates differently.
        col_chunks = 1
    whole = n_tiles == 1 and (TH * W) % 128 != 0
    interpret = jax.default_backend() != "tpu"
    # +256 right guard: DMA round-up slack plus the (u=2, v=2) tap's
    # one-lane overread (masked out by the right_edge select)
    slab_shape = (C, _data_base(W) + (TH + 2) * W + 256)
    w_specs = [
        pl.BlockSpec((O, KP), lambda *g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((O, 1), lambda *g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((O, 1), lambda *g: (0, 0), memory_space=pltpu.VMEM),
    ]
    if whole:
        # small deep-stage images (e.g. 40x40): no 128-aligned DMA
        # exists; feed the whole image as a VMEM block instead
        kernel = functools.partial(
            _conv3_flat_q8_kernel_whole, C=C, O=O, TH=TH, W=W, H=H,
            act=act, s_in=float(s_in), out_scale=out_scale,
            out_dtype=out_dtype, CP=CP, col_chunks=col_chunks)
        return pl.pallas_call(
            kernel,
            grid=(B, 1),
            in_specs=[pl.BlockSpec((1, C, H * W), lambda b, i: (b, 0, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
            scratch_shapes=[
                pltpu.VMEM(slab_shape, jnp.int8),
                pltpu.VMEM((KP, TH * W), jnp.int8),
            ],
            interpret=interpret,
        )(x, w_q, s_w, b2)
    if n_tiles % 2 == 0:
        # double-buffered: tile n+1's HBM read overlaps tile n's dot
        kernel = functools.partial(
            _conv3_flat_q8_kernel_pipe, B=B, C=C, O=O, TH=TH, W=W, H=H,
            act=act, s_in=float(s_in), out_scale=out_scale,
            out_dtype=out_dtype, CP=CP, col_chunks=col_chunks)
        return pl.pallas_call(
            kernel,
            grid=(B, n_tiles // 2, 2),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
            out_specs=pl.BlockSpec((1, O, TH * W),
                                   lambda b, j, h: (b, 0, 2 * j + h),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
            scratch_shapes=[
                pltpu.VMEM(slab_shape, x.dtype),
                pltpu.VMEM(slab_shape, x.dtype),
                pltpu.VMEM((KP, TH * W), jnp.int8),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(x, w_q, s_w, b2)
    kernel = functools.partial(
        _conv3_flat_q8_kernel, C=C, O=O, TH=TH, W=W, H=H, act=act,
        s_in=float(s_in), out_scale=out_scale, out_dtype=out_dtype, CP=CP,
        col_chunks=col_chunks)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
        out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, x.dtype),
            pltpu.VMEM((KP, TH * W), jnp.int8),
        ],
        interpret=interpret,
    )(x, w_q, s_w, b2)


def _im2col_taps5(slab_q, xv, *, C, TH, W, CP):
    """5x5 version of _im2col_taps: xv[(v*5+u)*CP + c, j] =
    x_pad[c, h+u-2, w+v-2] for j = h*W + w, from the halo-2 flat slab
    (row r at lanes _data_base(W, 2) + r*W). Taps with dv != 0 wrap
    across row seams; the iota mask zeroes the wrapped columns."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TH * W), 1) % W
    zero = jnp.zeros((C, TH * W), slab_q.dtype)
    db = _data_base(W, 2)
    for u in range(5):
        for v in range(5):
            dv = v - 2
            off = db + u * W + dv
            val = slab_q[:, off:off + TH * W]
            if dv < 0:
                val = jnp.where(col < -dv, zero, val)
            elif dv > 0:
                val = jnp.where(col >= W - dv, zero, val)
            xv[pl.ds((v * 5 + u) * CP, C), :] = val


def _tile_interior5(slab_q, xv, w_ref, sw_ref, b_ref, y_ref, *, C, TH, W,
                    CP, act, s_in, out_scale, out_dtype):
    _im2col_taps5(slab_q, xv, C=C, TH=TH, W=W, CP=CP)
    acc = jnp.dot(w_ref[:, :], xv[:, :],
                  preferred_element_type=jnp.int32)          # (O, TH*W)
    y_ref[0, :, :] = _q8_epilogue(acc, sw_ref, b_ref, s_in, act,
                                  out_scale, out_dtype)


def _conv5_flat_q8_kernel(x_ref, w_ref, sw_ref, b_ref, y_ref, slab, xv, *,
                          C, O, TH, W, H, act, s_in, out_scale,
                          out_dtype, CP):
    b = pl.program_id(0)
    i = pl.program_id(1)
    _load_slab(x_ref, slab, b, i, C=C, TH=TH, W=W, H=H, halo=2)
    if slab.dtype == jnp.int8:
        slab_q = slab[:, :]
    else:
        slab_q = jnp.clip(jnp.round(slab[:, :].astype(jnp.float32)
                                    * (1.0 / s_in)), -127, 127
                          ).astype(jnp.int8)
    _tile_interior5(slab_q, xv, w_ref, sw_ref, b_ref, y_ref, C=C, TH=TH,
                    W=W, CP=CP, act=act, s_in=s_in, out_scale=out_scale,
                    out_dtype=out_dtype)


def _conv5_flat_q8_kernel_whole(x_ref, w_ref, sw_ref, b_ref, y_ref, slab,
                                xv, *, C, O, TH, W, H, act, s_in,
                                out_scale, out_dtype, CP):
    """Whole-image variant (H == TH): VMEM block input, vector-store
    slab population (no aligned-DMA constraint on small images)."""
    db = _data_base(W, 2)
    if x_ref.dtype == jnp.int8:
        xq = x_ref[0]
    else:
        xq = jnp.clip(jnp.round(x_ref[0].astype(jnp.float32)
                                * (1.0 / s_in)), -127, 127).astype(jnp.int8)
    zero = jnp.zeros((C, 2 * W), jnp.int8)
    slab[:, pl.ds(db, 2 * W)] = zero                   # top halo rows
    slab[:, pl.ds(db + 2 * W, TH * W)] = xq
    slab[:, pl.ds(db + (TH + 2) * W, 2 * W)] = zero    # bottom halo rows
    _tile_interior5(slab[:, :], xv, w_ref, sw_ref, b_ref, y_ref, C=C,
                    TH=TH, W=W, CP=CP, act=act, s_in=s_in,
                    out_scale=out_scale, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "s_in", "act",
                                             "out_scale", "row_tile"))
def conv5x5_flat_q8(x: jax.Array, w: jax.Array, bias: jax.Array,
                    s_in: float, H: int, W: int, act: str | None = "silu",
                    out_scale: float | None = None,
                    row_tile: int | None = None) -> jax.Array:
    """Fused int8 5x5 stride-1 SAME conv on a flat (B, C, H*W)
    activation — the 25-tap, halo-2 sibling of conv3x3_flat_q8.

    Primary use: GSConv's 5x5 depthwise conv (reference
    models/common.py:3807-3825) embedded as a block-diagonal DENSE
    kernel so it runs on the MXU. The C-fold MAC inflation is the
    point: the VPU sliding-window kernel (neck_flat.dwconv5x5_flat_q8)
    measured ~10x off its compute roofline (round-5 trace: 0.81 ms for
    64ch@80x80 vs ~0.08 ideal), while the MXU pays the inflated MACs at
    ~20x the VPU's throughput.

    x: (B, C, H*W) float (quantized in-kernel at `s_in`) or int8;
    w: (5, 5, C, O) HWIO float; bias: (O,). Returns (B, O, H*W) bf16,
    or int8 at `out_scale`."""
    B, C, HW = x.shape
    assert HW == H * W, (x.shape, H, W)
    O = w.shape[-1]
    TH = row_tile or pick_row_tile(H, W)
    assert H % TH == 0, (H, TH)

    CP = C
    w25 = jnp.transpose(w, (3, 1, 0, 2)).reshape(O, 25 * CP)  # (O,v,u,C)
    w_q, s_w = quantize_weights(w25)
    KP = _round_up(25 * CP, 32)
    if KP > 25 * CP:
        w_q = jnp.pad(w_q, ((0, 0), (0, KP - 25 * CP)))
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    n_tiles = H // TH
    whole = n_tiles == 1 and (TH * W) % 128 != 0
    interpret = jax.default_backend() != "tpu"
    slab_shape = (C, _data_base(W, 2) + (TH + 4) * W + 256)
    w_specs = [
        pl.BlockSpec((O, KP), lambda *g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((O, 1), lambda *g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((O, 1), lambda *g: (0, 0), memory_space=pltpu.VMEM),
    ]
    if whole:
        kernel = functools.partial(
            _conv5_flat_q8_kernel_whole, C=C, O=O, TH=TH, W=W, H=H,
            act=act, s_in=float(s_in), out_scale=out_scale,
            out_dtype=out_dtype, CP=CP)
        return pl.pallas_call(
            kernel,
            grid=(B, 1),
            in_specs=[pl.BlockSpec((1, C, H * W), lambda b, i: (b, 0, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
            scratch_shapes=[
                pltpu.VMEM(slab_shape, jnp.int8),
                pltpu.VMEM((KP, TH * W), jnp.int8),
            ],
            interpret=interpret,
        )(x, w_q, s_w, b2)
    kernel = functools.partial(
        _conv5_flat_q8_kernel, C=C, O=O, TH=TH, W=W, H=H, act=act,
        s_in=float(s_in), out_scale=out_scale, out_dtype=out_dtype, CP=CP)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
        out_specs=pl.BlockSpec((1, O, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, H * W), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, x.dtype),
            pltpu.VMEM((KP, TH * W), jnp.int8),
        ],
        interpret=interpret,
    )(x, w_q, s_w, b2)


def _conv1_flat_q8_kernel(*refs, n_in, act, s_in, out_scale, out_dtype):
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
        d = jnp.dot(w_ref[:, :], xq, preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    y_ref[0, :, :] = _q8_epilogue(acc, sw_ref, b_ref, s_in, act,
                                  out_scale, out_dtype)


def _requant(y_f32, out_scale, out_dtype):
    if out_scale is not None:
        return jnp.clip(jnp.round(y_f32 * (1.0 / out_scale)),
                        -127, 127).astype(jnp.int8)
    return y_f32.astype(out_dtype)


def _conv1_pool_flat_q8_kernel(*refs, n_in, act, s_in, out_scale,
                               out_dtype, TR, W):
    """1x1 concat-conv over 2*TR rows with a fused 2x2/s2 max pool: the
    epilogue runs in f32 on the full-resolution tile, row pairs reduce
    by lane slices, lane pairs by the 0/1 selection-matrix MXU dots
    (pool_flat.py's decimation idiom), and requant happens LAST —
    bit-identical to unfused conv -> max_pool2_flat because round/clip/
    bf16-cast are monotone non-decreasing, so they commute with max."""
    x_refs = refs[:n_in]
    w_refs = refs[n_in:2 * n_in]
    sw_ref, b_ref, se_ref, so_ref, y_ref = refs[2 * n_in:2 * n_in + 5]
    acc = None
    for x_ref, w_ref in zip(x_refs, w_refs):
        if x_ref.dtype == jnp.int8:
            xq = x_ref[0]
        else:
            xq = jnp.clip(jnp.round(x_ref[0].astype(jnp.float32)
                                    * (1.0 / s_in)), -127, 127
                          ).astype(jnp.int8)
        d = jnp.dot(w_ref[:, :], xq, preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    y = acc.astype(jnp.float32) * (sw_ref[:, :] * s_in) + b_ref[:, :]
    y = _epilogue(y, jnp.float32(0.0), act)          # (O, 2*TR*W) f32
    W2 = W // 2
    for k in range(TR):
        r0 = y[:, (2 * k) * W:(2 * k + 1) * W]
        r1 = y[:, (2 * k + 1) * W:(2 * k + 2) * W]
        # requant BEFORE the lane decimation: round/clip/bf16-cast are
        # monotone non-decreasing so they commute with max, and the 0/1
        # selection dots then run at int8/bf16 MXU rate instead of f32
        # (~1/8 rate; the f32 dots billed ~0.5 ms of l1's cv1 in the
        # round-5 trace). The dots move the quantized values EXACTLY
        # (0/1 matrix, widened accumulation) — still bit-identical to
        # unfused conv -> max_pool2_flat.
        m = _requant(jnp.maximum(r0, r1), out_scale, out_dtype)
        if out_dtype == jnp.int8:
            a = jnp.dot(m, se_ref[:, :], preferred_element_type=jnp.int32)
            b = jnp.dot(m, so_ref[:, :], preferred_element_type=jnp.int32)
            # Mosaic does not legalize arith.maxsi on this target (see
            # pool_flat.py): take the max in f32 — exact for int8-range
            # values riding in s32 accumulators
            sel = jnp.maximum(a.astype(jnp.float32),
                              b.astype(jnp.float32))
        else:
            a = jnp.dot(m, se_ref[:, :],
                        preferred_element_type=jnp.float32)
            b = jnp.dot(m, so_ref[:, :],
                        preferred_element_type=jnp.float32)
            sel = jnp.maximum(a, b)
        y_ref[0, :, pl.ds(k * W2, W2)] = sel.astype(out_dtype)


def pool_fusible(H: int, W: int) -> bool:
    """True when conv1x1_flat_q8 can fuse a trailing 2x2/s2 max pool for
    this image size: a 128-aligned output-row tile exists, or the map is
    small enough (<= 4096 lanes) to process whole-image per program (the
    f32 epilogue intermediate is (O, H*W) there, so the cap bounds
    VMEM)."""
    from rep_yolo_tpu.ops.pallas import pool_flat

    if H % 2 or W % 2:
        return False
    return pool_flat._pick_tr(H, W) is not None or H * W <= 4096


@functools.partial(jax.jit, static_argnames=("s_in", "act", "out_scale",
                                             "row_tile", "pool_hw"))
def conv1x1_flat_q8(x, w: jax.Array, bias: jax.Array, s_in: float,
                    act: str | None = "silu",
                    out_scale: float | None = None,
                    row_tile: int | None = None,
                    pool_hw: tuple[int, int] | None = None) -> jax.Array:
    """Fused int8 1x1 conv on flat (B, C, H*W) activation(s).

    `x` may be a single array or a LIST of arrays (B, Ci, H*W): the list
    form computes conv(concat(xs, axis=1)) without materializing the
    concat — one accumulating dot per section (the DER 3-way concat,
    reference models/common.py:3652). All list entries must share the
    input scale treatment: either pre-quantized int8 (scale folded into
    `w` per-section by the caller) or floats quantized at `s_in`.
    w: (1, 1, sum(Ci), O) HWIO float; bias: (O,).

    `pool_hw=(H, W)` fuses the reference MP (2x2/s2 max pool,
    models/common.py:32) that follows the DER cv1 into this kernel's
    epilogue: the output is (B, O, (H//2)*(W//2)) and the pool kernel's
    HBM round-trip plus 3/4 of cv1's output write disappear. Bit-exact
    vs unfused conv -> max_pool2_flat (requant is monotone, so it
    commutes with max). Requires pool_fusible(H, W).
    """
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    B, _, HW = xs[0].shape
    w2 = w.reshape(w.shape[-2], w.shape[-1])                  # (sum C, O)
    O = w2.shape[-1]
    # one global per-output-channel scale across all sections (exactness:
    # quantize the transposed full matrix once, then split rows)
    w_q, s_w = quantize_weights(jnp.transpose(w2))            # (O, sum C)
    splits, off = [], 0
    for xi in xs:
        Ci = xi.shape[1]
        splits.append(w_q[:, off:off + Ci])
        off += Ci
    assert off == w2.shape[0], (off, w2.shape)
    b2 = bias.reshape(O, 1).astype(jnp.float32)

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    interpret = jax.default_backend() != "tpu"
    const_specs = [pl.BlockSpec(ws.shape, lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM) for ws in splits]
    const_specs += [pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((O, 1), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM)]

    if pool_hw is not None:
        from rep_yolo_tpu.ops.pallas import pool_flat

        H, W = pool_hw
        assert HW == H * W and pool_fusible(H, W), (x if not xs else
                                                    xs[0].shape, pool_hw)
        W2, H2 = W // 2, H // 2
        # output rows per program: a 128-aligned row tile, else the
        # whole image (block dim == array dim is always legal)
        TR = pool_flat._pick_tr(H, W) or H2
        sel_dt = jnp.int8 if out_dtype == jnp.int8 else jnp.bfloat16
        se, so = (m.astype(sel_dt) for m in pool_flat._sel_matrices(W))
        kernel = functools.partial(
            _conv1_pool_flat_q8_kernel, n_in=len(xs), act=act,
            s_in=float(s_in), out_scale=out_scale, out_dtype=out_dtype,
            TR=TR, W=W)
        in_specs = [pl.BlockSpec((1, xi.shape[1], 2 * TR * W),
                                 lambda b, i: (b, 0, i),
                                 memory_space=pltpu.VMEM) for xi in xs]
        in_specs += const_specs
        in_specs += [pl.BlockSpec((W, W2), lambda b, i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((W, W2), lambda b, i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            kernel,
            grid=(B, H2 // TR),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, O, TR * W2), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, O, H2 * W2), out_dtype),
            interpret=interpret,
        )(*xs, *splits, s_w, b2, se, so)

    # VMEM bytes per output lane: int8 input sections + the output block
    bpl = sum(xi.shape[1] * xi.dtype.itemsize for xi in xs)
    bpl += O * (1 if out_dtype == jnp.int8 else 2)
    TH = row_tile or _flat_tile(HW, bytes_per_lane=bpl)
    kernel = functools.partial(
        _conv1_flat_q8_kernel, n_in=len(xs), act=act, s_in=float(s_in),
        out_scale=out_scale, out_dtype=out_dtype)
    in_specs = [pl.BlockSpec((1, xi.shape[1], TH), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM) for xi in xs]
    in_specs += const_specs
    return pl.pallas_call(
        kernel,
        grid=(B, HW // TH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, O, TH), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, HW), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(*xs, *splits, s_w, b2)


def _flat_tile(hw: int, bytes_per_lane: int = 64,
               vmem_budget: int = 2 << 20) -> int:
    """Lane tile for a 1x1 conv over a flat (B, C, HW) activation: the
    largest 128-multiple divisor of `hw` whose VMEM-resident blocks
    (input sections + output, `bytes_per_lane` bytes per lane) fit the
    budget. The budget is per buffer-set: Mosaic double-buffers every
    grid-indexed block and materializes the dequant temporaries, so the
    true VMEM footprint is ~4x this figure — 2 MB keeps the kernel
    safely inside the 16 MB scoped limit. When no 128-multiple divides
    `hw` (e.g. 40*40 = 1600), fall back to the whole array (block dim ==
    array dim is always legal for Mosaic) — truncating the grid would
    silently drop output lanes."""
    cap = max(128, (vmem_budget // max(bytes_per_lane, 1)) // 128 * 128)
    for cand in range(min(cap, hw // 128 * 128), 127, -128):
        if hw % cand == 0:
            return cand
    return hw


def max_pool_cm(x: jax.Array) -> jax.Array:
    """2x2 stride-2 max pool on an NCHW tensor (reference MP,
    models/common.py:32) as a reshape+max — XLA fuses it into one
    strided loop fusion; no reduce_window, no layout constraint."""
    B, C, H, W = x.shape
    y = x.reshape(B, C, H // 2, 2, W // 2, 2)
    return jnp.max(jnp.max(y, axis=5), axis=3)
