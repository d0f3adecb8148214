"""Flat-layout 2x2/s2 max pool for the channel-major int8 region.

The reference MP block (reference ``models/common.py:32``, nn.MaxPool2d
k=2 s=2) sits between DER stages. Inside the deploy-time q8 region
(models/network.py) activations live as flat ``(B, C, H*W)`` int8 with
H*W on the 128-lane axis. The XLA formulation (``max_pool_cm``:
reshape + strided max) makes the compiler flip the tensor to a
C-on-lanes layout for the spatial reduction and copy it back for the
next Pallas custom-call — a 2.56 ms relayout + 0.83 ms reduce at b32
l1 alone (BASELINE.md round-3 trace), more than the pool's roofline by
an order of magnitude.

This kernel never leaves the flat layout:

- **row pairs** are plain lane slices (rows are contiguous spans of
  ``W`` lanes), so ``max(row 2k, row 2k+1)`` is elementwise;
- **lane pairs** (the horizontal 2:1 decimation) use two tiny int8 MXU
  dots against constant 0/1 selection matrices ``S_even``/``S_odd``
  (``(W, W//2)``) instead of a stride-2 lane slice — strided lane
  access has no efficient Mosaic lowering, while a (C, W) x (W, W/2)
  int8 matmul is a single MXU pass and exact for 0/1 weights.

max is scale-preserving for the positive dequant scale, so the pool
needs no epilogue: int8 in, the same calibrated scale out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _sel_matrices(W: int) -> tuple[jax.Array, jax.Array]:
    """0/1 int8 selection matrices picking even / odd lanes of a W-row."""
    cols = W // 2
    i = jnp.arange(W)[:, None]
    j = jnp.arange(cols)[None, :]
    even = (i == 2 * j).astype(jnp.int8)
    odd = (i == 2 * j + 1).astype(jnp.int8)
    return even, odd


def _pick_tr(H: int, W: int) -> int | None:
    """Output row tile: TR output rows per grid step. Both the input
    block (2*TR*W lanes) and the output block (TR*W/2 lanes) must be
    128-multiples for lane-sliced BlockSpec delivery."""
    H2 = H // 2
    for tr in (16, 8, 4, 2, 1):
        if H2 % tr == 0 and (tr * (W // 2)) % 128 == 0 \
                and (2 * tr * W) % 128 == 0:
            return tr
    return None


def _pick_tc(C: int, HW: int, budget: int = 2 << 20) -> int | None:
    """Channel tile for the whole-image variant (used when no 128-aligned
    row tile exists, e.g. the deep-stage 80x80/40x40 maps): the largest
    divisor of C — a 32-multiple (whole int8 sublane tiles) or C itself —
    whose (TC, H*W) input block fits the VMEM budget. Lane blocks are the
    whole array dim, which Mosaic always accepts."""
    for tc in sorted((d for d in range(1, C + 1) if C % d == 0
                      and (d % 32 == 0 or d == C)), reverse=True):
        if tc * HW <= budget:
            return tc
    return None


def supports(C: int, H: int, W: int) -> bool:
    if H % 2 or W % 2:
        return False
    if _pick_tr(H, W) is not None and C <= 512:
        return True
    return _pick_tc(C, H * W) is not None


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def max_pool2_flat(x: jax.Array, H: int, W: int,
                   interpret: bool | None = None) -> jax.Array:
    """2x2 stride-2 max pool on a flat (B, C, H*W) tensor, returning
    (B, C, (H//2)*(W//2)) in the same dtype and layout (int8 passes
    through at its calibrated scale; bf16 works too — the selection
    dot runs in f32 then)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, C, HW = x.shape
    assert HW == H * W, (x.shape, H, W)
    TR = _pick_tr(H, W) if C <= 512 else None
    W2, H2 = W // 2, H // 2

    # Mosaic on this target legalizes neither arith.maxsi nor int8
    # vector compares — every elementwise MAX runs in f32 (exact for
    # int8 values; same pattern as the conv_flat epilogues). The
    # selection DOTS run at the input dtype's MXU rate when possible:
    # int8 input -> int8 dot with s32 accumulation (the f32 dots ran at
    # ~1/8 MXU rate and billed most of the kernel's time in the round-5
    # trace); values pass through the 0/1 matrix exactly either way.
    q8 = x.dtype == jnp.int8
    se, so = (m.astype(jnp.int8 if q8 else jnp.float32)
              for m in _sel_matrices(W))

    def make_kernel(rows: int):
        def kernel(x_ref, se_ref, so_ref, y_ref):
            for k in range(rows):
                r0 = x_ref[0, :, pl.ds((2 * k) * W, W)].astype(jnp.float32)
                r1 = x_ref[0, :, pl.ds((2 * k + 1) * W, W)].astype(
                    jnp.float32)
                m = jnp.maximum(r0, r1)
                if q8:
                    mq = m.astype(jnp.int8)
                    a = jnp.dot(mq, se_ref[:, :],
                                preferred_element_type=jnp.int32)
                    b = jnp.dot(mq, so_ref[:, :],
                                preferred_element_type=jnp.int32)
                else:
                    a = jnp.dot(m, se_ref[:, :],
                                preferred_element_type=jnp.float32)
                    b = jnp.dot(m, so_ref[:, :],
                                preferred_element_type=jnp.float32)
                y_ref[0, :, pl.ds(k * W2, W2)] = (
                    jnp.maximum(a.astype(jnp.float32),
                                b.astype(jnp.float32)).astype(x_ref.dtype))
        return kernel

    if TR is not None:
        return pl.pallas_call(
            make_kernel(TR),
            grid=(B, H2 // TR),
            in_specs=[
                pl.BlockSpec((1, C, 2 * TR * W), lambda b, i: (b, 0, i)),
                pl.BlockSpec((W, W2), lambda b, i: (0, 0)),
                pl.BlockSpec((W, W2), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, TR * W2), lambda b, i: (b, 0, i)),
            out_shape=jax.ShapeDtypeStruct((B, C, H2 * W2), x.dtype),
            interpret=interpret,
        )(x, se, so)

    # whole-image variant (deep-stage maps: no 128-aligned row tile
    # exists — e.g. 80x80, 40x40): grid over channel tiles, lane blocks
    # span the full H*W / H2*W2 (block dim == array dim is always legal)
    TC = _pick_tc(C, HW)
    assert TC is not None, (C, H, W)
    return pl.pallas_call(
        make_kernel(H2),
        grid=(B, C // TC),
        in_specs=[
            pl.BlockSpec((1, TC, HW), lambda b, c: (b, c, 0)),
            pl.BlockSpec((W, W2), lambda b, c: (0, 0)),
            pl.BlockSpec((W, W2), lambda b, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TC, H2 * W2), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, H2 * W2), x.dtype),
        interpret=interpret,
    )(x, se, so)
