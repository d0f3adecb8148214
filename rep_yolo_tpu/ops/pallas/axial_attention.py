"""Pallas TPU kernels: fused axial (criss-cross / vertical) attention.

The reference's `CrissCrossAttention` / `VerticalAttention`
(reference models/common.py:3675-3779) decompose into row-wise and
column-wise batched matmuls with a joint softmax over the H+W axial
neighborhood. XLA executes that as ~15 separate kernels per block with
layout copies between nearly every pair (measured ~11 ms for one
80x80x64 CCVA at batch 128 on v5e — over a third of it pure
`data formatting`).

Design — two VMEM-resident kernels + a flash-style merge:
- the ROW kernel tiles (B, H/TH); each program computes its tile's
  row energies e_w[t,w,g] = q[t,w]·k[t,g], a branch-local softmax
  (own max m_w, denominator s_w) and the *unnormalized* aggregation
  o_w = exp(e_w - m_w) @ v.
- the COLUMN kernel tiles (B, W/TW) on pre-transposed operands
  (column attention is per-column independent) and produces o_h, m_h,
  s_h the same way.
- a cheap XLA elementwise epilogue merges the two branches into the
  exact joint softmax: with m = max(m_w, m_h),
  out = (o_w·e^{m_w-m} + o_h·e^{m_h-m}) / (s_w·e^{m_w-m} + s_h·e^{m_h-m}).
  This is the standard flash-attention combine — bitwise-equivalent
  math to normalizing over the concatenated [H ; W] energies.

Layout notes: q/k carry their tiny C/8 head dim on the *sublane* axis
((.., c8, W) / (.., c8, H)) — putting an 8-wide dim on the 128-lane
axis would pad it 16x. All contractions are leading-dim batched
`dot_general`s, which Mosaic lowers to MXU loops without relayouts.

Numerics: energies accumulate in f32 (`preferred_element_type`), the
softmax runs in f32, exp-weights are cast back to the input dtype for
the aggregation matmul (matching the XLA path in nn/blocks.py), and
normalization happens in f32 after aggregation.

Used by `nn.blocks.CrissCrossAttention` / `VerticalAttention` when
`set_fused_attention(True)` (the deploy/serving path enables it on
TPU). Off-TPU the kernels run in interpreter mode for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_pad128 = lambda n: -(-n // 128) * 128


def _tile(n_tiled: int, n_other: int) -> int:
    """Largest tile of the independent axis whose padded f32 energy/exp
    tensors (2 x (T, N->128pad, N->128pad) f32) fit ~6 MB. Tiles below 8
    sublanes are invalid on TPU, so the fallback is the whole axis
    (fine in interpreter mode; `fits` gates the TPU path)."""
    for t in (n_tiled, 32, 16, 8):
        if n_tiled % t:
            continue
        if 2 * t * _pad128(n_other) * _pad128(n_other) * 4 \
                <= 6 * 1024 * 1024:
            return t
    return n_tiled


def fits(h: int, w: int, c: int) -> bool:
    """True when the fused kernels support (h, w, c) within VMEM — the
    per-tile energies plus the (T, N, C->128pad) value tensor must fit.
    Covers every 640px scale (80/40/20) and 1280px P6 (160)."""
    ok = True
    for m, n in ((h, w), (w, h)):
        t = _tile(m, n)
        e_bytes = 2 * t * _pad128(n) * _pad128(n) * 4
        v_bytes = t * n * _pad128(c) * 2
        ok &= (t == m or (m % t == 0 and t >= 8)) and \
            e_bytes + v_bytes <= 10 * 1024 * 1024
    return ok


def _bdot(a: jax.Array, b: jax.Array, ca: int, cb: int):
    """Leading-dim batched matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _axis_kernel(softmax: bool):
    """One axial branch: energies + (optional) local softmax + aggregation.

    Refs (leading block dim of 1 stripped):
      qs:  (T, c8, N) — queries for this tile, head dim on sublanes
      ks:  (T, c8, N) — keys over the full attended axis (N = H or W)
      v:   (T, N, C)  — values over the full attended axis
      out: (T, N_q, C) unnormalized aggregation  [N_q == N here]
      m:   (T, N_q) f32 local max   (softmax only)
      s:   (T, N_q) f32 local denom (softmax only)
    """
    if softmax:
        def kernel(qs_ref, ks_ref, v_ref, o_ref, m_ref, s_ref):
            qs, ks, v = qs_ref[0], ks_ref[0], v_ref[0]
            e = _bdot(qs, ks, 1, 1)                  # (T, N, N) f32
            m = jnp.max(e, axis=-1)                  # (T, N)
            p = jnp.exp(e - m[:, :, None])
            s = jnp.sum(p, axis=-1)
            o = _bdot(p.astype(v.dtype), v, 2, 1)    # (T, N, C)
            o_ref[0] = o.astype(o_ref.dtype)
            m_ref[0] = m
            s_ref[0] = s
    else:
        def kernel(qs_ref, ks_ref, v_ref, o_ref):
            qs, ks, v = qs_ref[0], ks_ref[0], v_ref[0]
            e = _bdot(qs, ks, 1, 1)                  # raw energies
            o = _bdot(e.astype(v.dtype), v, 2, 1)
            o_ref[0] = o.astype(o_ref.dtype)
    return kernel


def _axis_attention(qs, ks, v, *, softmax: bool, out_dtype):
    """Run one axial branch. qs/ks: (B, M, c8, N); v: (B, M, N, C) where
    M is the tiled (independent) axis and N the attended axis."""
    B, M, c8, N = qs.shape
    C = v.shape[-1]
    T = _tile(M, N)
    vm = pltpu.VMEM
    grid = (B, M // T)
    in_specs = [
        pl.BlockSpec((1, T, c8, N), lambda b, i: (b, i, 0, 0), memory_space=vm),
        pl.BlockSpec((1, T, c8, N), lambda b, i: (b, i, 0, 0), memory_space=vm),
        pl.BlockSpec((1, T, N, C), lambda b, i: (b, i, 0, 0), memory_space=vm),
    ]
    o_spec = pl.BlockSpec((1, T, N, C), lambda b, i: (b, i, 0, 0),
                          memory_space=vm)
    if softmax:
        st_spec = pl.BlockSpec((1, T, N), lambda b, i: (b, i, 0),
                               memory_space=vm)
        return pl.pallas_call(
            _axis_kernel(True), grid=grid, in_specs=in_specs,
            out_specs=[o_spec, st_spec, st_spec],
            out_shape=[jax.ShapeDtypeStruct((B, M, N, C), out_dtype),
                       jax.ShapeDtypeStruct((B, M, N), jnp.float32),
                       jax.ShapeDtypeStruct((B, M, N), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(qs, ks, v)
    return pl.pallas_call(
        _axis_kernel(False), grid=grid, in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, N, C), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(qs, ks, v)


# ---------------------------------------------------------------------------
# v2 kernels: projections absorbed (x in -> branch out)
# ---------------------------------------------------------------------------
#
# The round-2/3 finding (BASELINE.md): the v1 kernels beat XLA in
# isolation but regress the full forward — their three pre-transposed
# q/k/v operands carry custom-call layout constraints that cascade
# relayout copies into unrelated layers. These v2 kernels take the
# block INPUT x instead and compute the q/k/v projections inside:
#
#   q = relu6(bn_qk(silu(x @ Wq + bq)))   (grouped 1x1 densified, BN as
#   k = relu6(bn_qk(silu(x @ Wk + bk)))    a folded affine — deploy mode
#   v = relu6(bn_v (silu(x * wv + bv)))    runs on running stats)
#
# so the only tensors crossing the custom-call boundary are x (natural
# layout), one XLA transpose of x for the column branch, and the
# branch outputs. The projection math is exactly the deploy path of
# CrissCrossAttention/VerticalAttention (reference models/common.py:
# 3686-3704): conv -> SiLU -> shared-BN -> ReLU6, with q/k sharing one
# BN and v owning bn1. Weight packing (nn/blocks.py _axial_consts):
#   wqk (2*c8, C) = [Wq^T ; Wk^T] densified from the grouped kernels;
#   pq  (3, 2*c8) = [[bq;bk], [a_qk;a_qk], [c_qk;c_qk]]  (y = x*a + c);
#   pv  (4, C)    = [wv, bv, a_v, c_v]    (depthwise value conv).


def _axis_kernel_x(softmax: bool, c8: int):
    """One axial branch from x: in-kernel projections + energies +
    (optional) local softmax + aggregation.

    Refs (leading block dim of 1 stripped):
      x:   (T, N, C) input tile (T tiled rows/cols, N attended axis)
      wqk: (2*c8, C); pv: (4, C); pq: (3, 2*c8)
      out: (T, N, C); m, s: (T, N) f32 (softmax only)
    """
    def project(x_ref, wqk_ref, pv_ref, pq_ref):
        xb = x_ref[0].astype(jnp.float32)                 # (T, N, C)
        wqk = wqk_ref[:, :]                               # (2c8, C)
        # stacked matmul (T*N rows x C) @ (C x 2c8) — the one dot form
        # Mosaic lowers unconditionally; q and k share it. All constant
        # broadcasts below stay 2D-sliced ((1, D)[None] -> (1,1,D)):
        # in-kernel 1D vectors (pq[0], jnp.concatenate of rows) SIGABRT
        # the Mosaic compiler on this target.
        qk = jax.lax.dot_general(xb, wqk, (((2,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qk = jnp.clip(jax.nn.silu(qk + pq_ref[0:1, :][None])
                      * pq_ref[1:2, :][None] + pq_ref[2:3, :][None],
                      0.0, 6.0)
        v = jax.nn.silu(xb * pv_ref[0:1, :][None] + pv_ref[1:2, :][None])
        v = jnp.clip(v * pv_ref[2:3, :][None] + pv_ref[3:4, :][None],
                     0.0, 6.0).astype(x_ref.dtype)        # (T, N, C)
        # (T, 2c8, N): head dim to sublanes — the proven v1 energy form
        qk_t = jnp.transpose(qk, (0, 2, 1))
        e = jax.lax.dot_general(
            qk_t[:, :c8], qk_t[:, c8:], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return e, v                                        # (T,N,N),(T,N,C)

    if softmax:
        def kernel(x_ref, wqk_ref, pv_ref, pq_ref, o_ref, m_ref, s_ref):
            e, v = project(x_ref, wqk_ref, pv_ref, pq_ref)
            m = jnp.max(e, axis=-1)
            p = jnp.exp(e - m[:, :, None])
            s = jnp.sum(p, axis=-1)
            o = _bdot(p.astype(v.dtype), v, 2, 1)
            o_ref[0] = o.astype(o_ref.dtype)
            m_ref[0] = m
            s_ref[0] = s
    else:
        def kernel(x_ref, wqk_ref, pv_ref, pq_ref, o_ref):
            e, v = project(x_ref, wqk_ref, pv_ref, pq_ref)
            o = _bdot(e.astype(v.dtype), v, 2, 1)
            o_ref[0] = o.astype(o_ref.dtype)
    return kernel


def _axis_attention_x(x, wqk, pv, pq, *, softmax: bool):
    """Run one axial branch from x: (B, M, N, C) where M is the tiled
    (independent) axis and N the attended axis."""
    B, M, N, C = x.shape
    c8 = pq.shape[1] // 2
    T = _tile(M, N)
    vm = pltpu.VMEM
    grid = (B, M // T)
    in_specs = [
        pl.BlockSpec((1, T, N, C), lambda b, i: (b, i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec(wqk.shape, lambda b, i: (0, 0), memory_space=vm),
        pl.BlockSpec(pv.shape, lambda b, i: (0, 0), memory_space=vm),
        pl.BlockSpec(pq.shape, lambda b, i: (0, 0), memory_space=vm),
    ]
    o_spec = pl.BlockSpec((1, T, N, C), lambda b, i: (b, i, 0, 0),
                          memory_space=vm)
    interp = jax.default_backend() != "tpu"
    if softmax:
        st_spec = pl.BlockSpec((1, T, N), lambda b, i: (b, i, 0),
                               memory_space=vm)
        return pl.pallas_call(
            _axis_kernel_x(True, c8), grid=grid, in_specs=in_specs,
            out_specs=[o_spec, st_spec, st_spec],
            out_shape=[jax.ShapeDtypeStruct((B, M, N, C), x.dtype),
                       jax.ShapeDtypeStruct((B, M, N), jnp.float32),
                       jax.ShapeDtypeStruct((B, M, N), jnp.float32)],
            interpret=interp,
        )(x, wqk, pv, pq)
    return pl.pallas_call(
        _axis_kernel_x(False, c8), grid=grid, in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, N, C), x.dtype),
        interpret=interp,
    )(x, wqk, pv, pq)


@jax.jit
def criss_cross_fused_x(x: jax.Array, wqk: jax.Array, pv: jax.Array,
                        pq: jax.Array, gamma: jax.Array) -> jax.Array:
    """Whole criss-cross block from x (projections absorbed): returns
    gamma * joint_softmax_attention + x. Boundary tensors: x and one
    XLA transpose of it."""
    o_w, m_w, s_w = _axis_attention_x(x, wqk, pv, pq, softmax=True)
    xt = jnp.transpose(x, (0, 2, 1, 3))
    o_ht, m_ht, s_ht = _axis_attention_x(xt, wqk, pv, pq, softmax=True)
    o_h = jnp.transpose(o_ht, (0, 2, 1, 3))
    m_h = jnp.transpose(m_ht, (0, 2, 1))
    s_h = jnp.transpose(s_ht, (0, 2, 1))
    m = jnp.maximum(m_w, m_h)
    a_w = jnp.exp(m_w - m)
    a_h = jnp.exp(m_h - m)
    num = (o_w.astype(jnp.float32) * a_w[..., None]
           + o_h.astype(jnp.float32) * a_h[..., None])
    den = s_w * a_w + s_h * a_h
    out = (num / den[..., None]).astype(x.dtype)
    return gamma * out + x


@jax.jit
def vertical_fused_x(x: jax.Array, wqk: jax.Array, pv: jax.Array,
                     pq: jax.Array, gamma: jax.Array) -> jax.Array:
    """Whole vertical block from x (raw-energy quirk preserved —
    reference models/common.py:3770-3777)."""
    xt = jnp.transpose(x, (0, 2, 1, 3))
    o_ht = _axis_attention_x(xt, wqk, pv, pq, softmax=False)
    return gamma * jnp.transpose(o_ht, (0, 2, 1, 3)) + x


@jax.jit
def criss_cross_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                      x: jax.Array, gamma: jax.Array) -> jax.Array:
    """Fused criss-cross attention (reference models/common.py:3693-3726).

    q, k: (B, H, W, C/8) projected queries/keys; v: (B, H, W, C);
    x: residual input; gamma: (1,) learned scale.
    Returns gamma * (out_h + out_w) + x, shape (B, H, W, C).
    """
    # row branch: tiled axis = H, attended axis = W
    qs = jnp.transpose(q, (0, 1, 3, 2))     # (B, H, c8, W)
    ks = jnp.transpose(k, (0, 1, 3, 2))
    o_w, m_w, s_w = _axis_attention(qs, ks, v, softmax=True, out_dtype=x.dtype)

    # column branch: tiled axis = W, attended axis = H (transposed domain)
    qts = jnp.transpose(q, (0, 2, 3, 1))    # (B, W, c8, H)
    kts = jnp.transpose(k, (0, 2, 3, 1))
    vt = jnp.transpose(v, (0, 2, 1, 3))     # (B, W, H, C)
    o_ht, m_ht, s_ht = _axis_attention(qts, kts, vt, softmax=True,
                                       out_dtype=x.dtype)
    o_h = jnp.transpose(o_ht, (0, 2, 1, 3))           # (B, H, W, C)
    m_h = jnp.transpose(m_ht, (0, 2, 1))
    s_h = jnp.transpose(s_ht, (0, 2, 1))

    # flash-style merge == joint softmax over [energy_H ; energy_W]
    m = jnp.maximum(m_w, m_h)
    a_w = jnp.exp(m_w - m)
    a_h = jnp.exp(m_h - m)
    num = (o_w.astype(jnp.float32) * a_w[..., None]
           + o_h.astype(jnp.float32) * a_h[..., None])
    den = s_w * a_w + s_h * a_h
    out = (num / den[..., None]).astype(x.dtype)
    return gamma * out + x


@jax.jit
def vertical_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                   x: jax.Array, gamma: jax.Array) -> jax.Array:
    """Fused vertical (column-only, raw-energy) attention — the reference
    computes a softmax but uses the raw energies (dead softmax quirk,
    models/common.py:3770-3777)."""
    qts = jnp.transpose(q, (0, 2, 3, 1))    # (B, W, c8, H)
    kts = jnp.transpose(k, (0, 2, 3, 1))
    vt = jnp.transpose(v, (0, 2, 1, 3))     # (B, W, H, C)
    o_ht = _axis_attention(qts, kts, vt, softmax=False, out_dtype=x.dtype)
    return gamma * jnp.transpose(o_ht, (0, 2, 1, 3)) + x
