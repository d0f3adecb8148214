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

Layout contract: activations (B, C, H, W); weights HWIO like the rest of
the framework (transposed/packed at trace time, constant-folded by XLA).
Used by rep_yolo_tpu/models/stem_fast.py for the deploy-mode stem.
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

    xpf_ref: (B, C, (H+8)*WP) in HBM — the padded input with rows flattened
    into the lane dim, so BOTH the slab DMA and every im2col copy are pure
    lane-range operations (sublane-indexed reads cost a relayout each; lane
    shifts are single vector ops). w_ref (O, 9C), b_ref (O, 1) VMEM;
    y_ref block (1, O, TH*W). Scratch: slab (C, (TH+2)*WP) — one aligned
    halo'd row-slab DMA — and xv (9C, TH*W), the im2col tile:
        xv[(v*3+u)*C + c, h*W + w] = slab[c, (h+u)*WP + (v + w)].
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    def load(sem):
        cp = pltpu.make_async_copy(
            xpf_ref.at[b, :, pl.ds(i * TH * WP, (TH + 2) * WP)], slab, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    for h in range(TH):
        for u in range(3):
            for v in range(3):
                # xpad col (w+v) for output col w; xpad row i*TH+h+u
                src = (h + u) * WP + v
                xv[pl.ds((v * 3 + u) * C, C), pl.ds(h * W, W)] = \
                    slab[:, src:src + W]
    y = jnp.dot(w_ref[:, :], xv[:, :],
                preferred_element_type=jnp.float32)        # (O, TH*W)
    y_ref[0, :, :] = _epilogue(y, b_ref[:, :], act).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("act", "row_tile"))
def conv3x3_cmajor(x: jax.Array, w: jax.Array, bias: jax.Array,
                   act: str | None = "silu", row_tile: int = 16) -> jax.Array:
    """Fused 3x3 stride-1 conv + bias + act, channel-major.

    x: (B, C, H, W); w: (3, 3, C, O) HWIO; bias: (O,).
    Returns (B, O, H, W) in x.dtype.
    """
    B, C, H, W = x.shape
    O = w.shape[-1]
    TH = row_tile
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
            pltpu.VMEM((C, (TH + 2) * wp), x.dtype),
            pltpu.VMEM((9 * C, TH * W), x.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xpf, w9, b2)
    return y.reshape(B, O, H, W)   # trailing-dim split: free in XLA


def _conv1_kernel(x_ref, w_ref, b_ref, y_ref, *, act, out_dtype):
    y = jnp.dot(w_ref[:, :], x_ref[0],
                preferred_element_type=jnp.float32)        # (O, TH*W)
    y_ref[0, :, :] = _epilogue(y, b_ref[:, :], act).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("act", "row_tile"))
def conv1x1_cmajor(x: jax.Array, w: jax.Array, bias: jax.Array,
                   act: str | None = "silu", row_tile: int = 16) -> jax.Array:
    """Fused 1x1 conv + bias + act, channel-major.

    x: (B, C, H, W); w: (1, 1, C, O) or (C, O); bias: (O,).
    """
    B, C, H, W = x.shape
    w2 = w.reshape(C, -1)
    O = w2.shape[-1]
    TH = row_tile
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
