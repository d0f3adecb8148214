"""Pallas TPU weight-gradient kernel for thin 3x3 stride-1 convs.

Training profile (BASELINE.md): the weight gradients of the 48/24-channel
320^2 backbone convs run at ~4 TF/s under XLA — the wgrad is a
(3*3*C, O) output reduced over N*H*W ~ 10^6 positions, and XLA's
choreography for that tall-skinny contraction dominates l1's backward.
This kernel streams the reduction through VMEM row-slabs with an f32
accumulator that lives across the sequential TPU grid, one dot per
kernel tap:

    dW[u, v, c, o] = sum_{n,y,j} Xpad[n, y+u, j+v, c] * dYp[n, y, j, o]

with X zero-padded (1 left, 3 right -> width W+4) and dY zero-padded
(0 left, 2 right -> width W+2 = WP): the extra columns multiply dY
zeros, so every tap's operand is a plain static slice of the same
halo'd slab and every tap's contraction runs over the full padded
width (no ragged bounds).

The replaced torch/cuDNN counterpart is the cudnn wgrad call behind
`loss.backward()` (reference train.py:382).

Layout note (why NHWC here, channel-major in conv_kernel.py): wgrad's
MXU shape is (K x C)^T @ (K x O) with K = N*H*W huge and C, O = 24..64
— both operand lane dims are the thin channel axes whichever way the
spatial dims are laid out, so the forward kernels' channel-major trick
buys nothing; staying NHWC avoids transposing the saved activations in
the backward graph (the integration cost that sank the int8 deploy
path at b32 — BASELINE.md round-2 table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad3_kernel(x_hbm, dy_ref, dw_ref, slab, acc, *, TH, WP, C, O):
    """One (batch, row-tile) grid step.

    x_hbm:  (B, H+2, WP+2, C) padded input, stays in HBM — the row
            windows of consecutive steps overlap by the 2-row halo, so
            the slab is DMA'd manually instead of block-mapped
    dy_ref: (1, TH, WP, O) block — cotangent, zero in pad columns
    slab:   (TH+2, WP+2, C) VMEM scratch — the halo'd row window
    acc:    (9*C, O) f32 scratch — persists across the sequential grid
    dw_ref: (9*C, O) f32 output block — written on the last step
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * pl.num_programs(1) + i

    @pl.when(step == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    def load(sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * TH, TH + 2), :, :], slab, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    dy = dy_ref[0].reshape(TH * WP, O)
    for u in range(3):
        for v in range(3):
            xa = slab[u:u + TH, v:v + WP, :].reshape(TH * WP, C)
            t = (u * 3 + v) * C
            acc[t:t + C, :] += jax.lax.dot_general(
                xa, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    last = (pl.num_programs(0) * pl.num_programs(1)) - 1

    @pl.when(step == last)
    def _emit():
        dw_ref[:, :] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("row_tile",))
def wgrad3x3_nhwc(x: jax.Array, dy: jax.Array,
                  row_tile: int | None = None) -> jax.Array:
    """Weight gradient of a 3x3 stride-1 same-pad NHWC conv.

    x: (B, H, W, C) saved forward input; dy: (B, H, W, O) cotangent.
    Returns dW (3, 3, C, O) in f32 (master-precision accumulation, the
    mixed-precision contract of train/trainer.py).
    """
    B, H, W, C = x.shape
    O = dy.shape[-1]
    TH = row_tile or max(1, min(16, H))
    while H % TH:
        TH -= 1
    WP = W + 2
    # X: 1 left / >=3 right zero columns, 1 top / 1 bottom zero rows;
    # dY: 2 right zero columns. See module docstring for the algebra.
    # X's padded width is rounded up to a multiple of 8: the slab DMA
    # slices the row dim of the (B, H+2, Wpad, C) memref, and Mosaic
    # requires the resulting second-minor extent to be 8-aligned (the
    # extra columns sit beyond every tap's reach, so they are inert).
    wpad = -(-(W + 4) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - W - 1), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, 2), (0, 0)))

    grid = (B, H // TH)
    dw = pl.pallas_call(
        functools.partial(_wgrad3_kernel, TH=TH, WP=WP, C=C, O=O),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TH, WP, O), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * C, O), lambda b, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * C, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + 2, wpad, C), x.dtype),
                        pltpu.VMEM((9 * C, O), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp, dyp)
    return dw.reshape(3, 3, C, O)


def conv3x3_pallas_wgrad(x: jax.Array, w: jax.Array,
                         precision=None) -> jax.Array:
    """3x3 stride-1 same-pad NHWC conv whose backward computes the
    weight gradient with wgrad3x3_nhwc (input grad stays on XLA's
    transposed conv). Forward is exactly XLA's conv — wrap call sites
    behind a trace-time flag to A/B the backward only."""

    @jax.custom_vjp
    def conv(x, w):
        return _fwd(x, w)

    def _fwd(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision)

    def fwd(x, w):
        return _fwd(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        # input grad: correlate dy with the spatially-flipped kernel
        w_flip = jnp.flip(w, (0, 1)).swapaxes(2, 3)  # HWIO, O<->I
        dx = jax.lax.conv_general_dilated(
            dy, w_flip, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision)
        dw = wgrad3x3_nhwc(x, dy).astype(w.dtype)
        return dx.astype(x.dtype), dw

    conv.defvjp(fwd, bwd)
    return conv(x, w)
