"""Block library (flax.linen, NHWC, static shapes) — the Rep-YOLO block zoo.

Every block used by the Rep-YOLO graph (reference cfg/training/Rep-YOLO.yaml)
plus the commonly reachable zoo entries, re-designed for TPU:

- NHWC layout so convs tile directly onto the MXU; all shapes static.
- Train-time multi-branch and deploy-time fused paths are the *same module*
  gated by a static ``deploy`` flag; fusion itself is a pure pytree
  transform in ``rep_yolo_tpu.nn.fuse``.
- Attention blocks (criss-cross / vertical axial attention) are expressed
  as einsums that XLA lowers to batched MXU matmuls instead of the
  reference's permute+bmm choreography (reference models/common.py:3675).

Reference parity citations are given per block. Two reference quirks are
reproduced deliberately (they affect trained-weight parity):

- ``CA`` operates on and returns the *pooled* (B,1,1,C) tensor
  (reference models/common.py:3797-3802); ``ADD`` then broadcasts it.
- ``VerticalAttention`` computes a softmax but applies the *raw* energies
  as attention weights (reference models/common.py:3770-3777).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rep_yolo_tpu.nn.initializers import conv_kernel_init, conv_bias_init_for

# BatchNorm hyperparameters pinned by the reference's initialize_weights
# (reference utils/torch_utils.py:149-151): torch momentum 0.03 == flax
# running-average momentum 0.97; eps 1e-3.
BN_MOMENTUM = 0.97
BN_EPS = 1e-3

# Conv MXU precision. HIGHEST gives exact f32 on CPU (golden parity) and is
# what the tests pin; the bf16 serving path can switch to DEFAULT, which
# lets XLA use native one-pass bf16 MXU convs. Set via set_conv_precision
# BEFORE building modules (it is read at trace time).
CONV_PRECISION = jax.lax.Precision.HIGHEST


def set_conv_precision(p) -> None:
    global CONV_PRECISION
    CONV_PRECISION = p


# Fused Pallas axial attention (ops/pallas/axial_attention.py): one kernel
# per CrissCross/Vertical block instead of XLA's ~15 ops + layout copies.
# Inference-only (train keeps the XLA path: dropout + exact golden grads).
# Enabled by the serving/bench paths via set_fused_attention(True).
# max_hw limits fusion to blocks with H*W <= max_hw — the kernels' layout
# constraints cascade relayout copies at the largest (80x80) scale, but
# the small-scale blocks' boundaries are cheap (see BASELINE.md).
FUSED_ATTENTION = False
FUSED_ATTENTION_MAX_HW: int | None = None


def set_fused_attention(enabled: bool, max_hw: int | None = None) -> None:
    global FUSED_ATTENTION, FUSED_ATTENTION_MAX_HW
    FUSED_ATTENTION = enabled
    FUSED_ATTENTION_MAX_HW = max_hw


def _use_fused_attention(h: int, w: int) -> bool:
    if not FUSED_ATTENTION:
        return False
    return FUSED_ATTENTION_MAX_HW is None or h * w <= FUSED_ATTENTION_MAX_HW


# Fused training-BN statistics: REMOVED after two hardware measurements.
# The idea (one concat reduce for all RepSBlock branch-BN stats instead
# of per-branch c2-lane reduces) lost both times on a v5e: the first
# variant regressed b8 189 -> 255 ms/step (the (B,H,W,G*c) f32 concat
# materialized through fwd+bwd), the normalize-per-branch rework
# regressed 188 -> 222 ms/step (round 4, same-session A/B). XLA already
# fuses the per-branch stats well enough that the concat's extra HBM
# traffic dominates. See BASELINE.md round-4 training table.


def autopad(k: int, p: int | None = None) -> int:
    """'same'-style pad (reference models/common.py:25-29)."""
    return k // 2 if p is None else p


def _act(name: str | None, x: jax.Array) -> jax.Array:
    if name == "silu":
        return jax.nn.silu(x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "relu6":
        return jax.nn.relu6(x)
    if name == "leaky":
        return jax.nn.leaky_relu(x, 0.1)
    if name == "hardswish":
        return jax.nn.hard_swish(x)
    if name == "mish":
        # reference utils/activations.py:23-45 (Mish / MemoryEfficientMish
        # — on TPU XLA rematerializes, no manual-bwd variant needed)
        return x * jnp.tanh(jax.nn.softplus(x))
    if name is None or name == "identity":
        return x
    raise ValueError(f"unknown activation {name!r}")


def _s2d_stride2_conv(x: jax.Array, kern: jax.Array,
                      precision) -> jax.Array:
    """Exact stride-2 3x3 conv via space-to-depth: fold each 2x2 pixel
    block into channels (c1 -> 4*c1) and run a 2x2 stride-1 conv with the
    9 taps scattered over the (kernel position, phase) lattice. For the
    3-channel stem this turns a K=27 contraction (21% MXU row fill) into
    K=48 over a quarter of the positions. Derivation: output row taps
    r = 2i+di-1 map to s2d coords (a, p) with a = i-1+a'; (a', p) -> di
    is (0,1)->0, (1,0)->1, (1,1)->2 and (0,0) empty, so pad=((1,0),(1,0))
    with a 2x2 VALID conv reproduces the stride-2 'same' conv exactly."""
    B, H, W, C = x.shape
    O = kern.shape[-1]
    dt = jnp.result_type(x, kern)
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H // 2, W // 2, 4 * C)
    w2 = jnp.zeros((2, 2, 4 * C, O), kern.dtype)
    for ap, pph, di in ((0, 1, 0), (1, 0, 1), (1, 1, 2)):
        for bq, qph, dj in ((0, 1, 0), (1, 0, 1), (1, 1, 2)):
            ch = (pph * 2 + qph) * C
            w2 = w2.at[ap, bq, ch:ch + C].set(kern[di, dj])
    return jax.lax.conv_general_dilated(
        xs.astype(dt), w2.astype(dt), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def max_pool(x: jax.Array, k: int, s: int, p: int = 0) -> jax.Array:
    """NHWC max pool, torch semantics (floor mode, -inf padding)."""
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, k, k, 1), (1, s, s, 1), pad)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """2x nearest upsample (reference cfg rows `nn.Upsample [None,2,'nearest']`)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _ConvParams(nn.Module):
    """Kernel/bias param holder matching nn.Conv's tree ({kernel, bias})
    so checkpoints stay identical to the original nn.Conv-based ConvUnit."""

    shape: tuple
    use_bias: bool
    fan_in: int

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", conv_kernel_init, self.shape)
        bias = self.param("bias", conv_bias_init_for(self.fan_in),
                          (self.shape[-1],)) if self.use_bias else None
        return kern, bias


# ---------------------------------------------------------------------------
# Channel-major deploy fast path (ops/pallas/conv_kernel.py)
#
# The DER blocks are pure conv+bias+SiLU chains after fusion; XLA runs
# their thin (24/48-ch) convs far under the MXU ceiling (BASELINE.md: l1
# alone is 27% of the deploy forward). When enabled, DERBlock's deploy
# branch executes the whole block through fused conv kernels instead:
#   "q8"     — Pallas int8 channel-major kernels, int8-resident between
#              convs (quant/s32-dot/dequant+SiLU in-kernel; needs
#              calibration scales from ops/quant.calibrate)
#   "xla_q8" — same int8-resident dataflow but XLA NHWC convs with the
#              requant fused into each conv's epilogue
#   "bf16"   — Pallas bf16 channel-major kernels (no scales needed)
# Trace-time global (same contract as CONV_PRECISION): set BEFORE the
# first traced forward.
# ---------------------------------------------------------------------------
CMAJOR_DEPLOY: str | None = None
CMAJOR_SCALES: dict[str, float] = {}


def set_cmajor_deploy(mode: str | None, scales: dict[str, float] | None = None,
                      select=None) -> None:
    """Enable the DER deploy fast path. `scales`: ops/quant.calibrate
    output ({ConvUnit scope path: act scale}), required for the q8 modes.
    `select(c1, h, w) -> bool` limits which DER blocks use it (default:
    c1 <= 512 = the whole backbone. The round-4 gate sweep measured 512
    a loss vs 128 — l7's 3x3 256->256 @40x40 loses int8 per the PTQ
    probe table — but once the NECK runs in-region too (round 5),
    keeping l7 in-region deletes the l7-exit + l9-entry relayout pair
    and the interleaved A/B flipped: 512 is a -0.23 ms REAL win
    (ab_flag deep_gate, BASELINE.md round-5)."""
    global CMAJOR_DEPLOY, CMAJOR_SCALES, _CMAJOR_SELECT
    assert mode in (None, "q8", "xla_q8", "bf16"), mode
    CMAJOR_DEPLOY = mode
    CMAJOR_SCALES = dict(scales or {})
    _CMAJOR_SELECT = select or (lambda c1, h, w: c1 <= 512)


_CMAJOR_SELECT = lambda c1, h, w: c1 <= 512

# Trace-time flag: fold a sole-consumer trailing MP into the DER cv1
# kernel's epilogue inside the q8 region (conv_flat.conv1x1_flat_q8
# pool_hw — bit-exact; the standalone pool kernel and 3/4 of cv1's
# output write disappear). Set before the first trace, like the other
# cmajor flags (jit caches are not keyed on it).
# Round-5 flat int8 NECK region: when the q8 mode is active, the planner
# (models/network.py) also routes SPPCSPC / GSConv / VoVGSCSP / Conv /
# RepConv / IDetect spans through the flat kernels (bf16 islands remain
# at the CA/CCVA/ADD attention sandwiches). Trace-time global, same
# contract as CMAJOR_DEPLOY.
NECK_Q8 = True


def set_neck_q8(enable: bool) -> None:
    """Gate the flat int8 neck region (requires mode "q8"). Trace-time."""
    global NECK_Q8
    NECK_Q8 = bool(enable)


def cm_scale_for(mod: nn.Module, sub: str) -> float | None:
    """Calibrated activation scale for a conv under this module's scope
    (key = ConvUnit scope path, as produced by ops/quant.calibrate)."""
    prefix = "/".join(mod.scope.path) if mod.scope is not None else ""
    s = CMAJOR_SCALES.get(f"{prefix}/{sub}" if prefix else sub)
    return float(s) if s is not None and s > 0.0 else None


CMAJOR_POOL_FUSE = True


def set_cmajor_pool_fuse(enable: bool) -> None:
    global CMAJOR_POOL_FUSE
    CMAJOR_POOL_FUSE = bool(enable)

# Trace-time flag: route 3x3/s1 convs through the Pallas wgrad kernel
# in the backward (ops/pallas/wgrad_kernel.py — XLA runs thin-conv
# weight gradients at ~4 TF/s, see BASELINE.md training table). Same
# before-first-trace contract as CONV_PRECISION.
#
# Hardware constraint (round 3): Mosaic tiles manual-DMA memrefs to
# (8, 128), so the kernel's x-slab DMA is only legal when the channel
# (lane) dim is a 128-multiple — the thin 24/48/64-channel convs it was
# written for CANNOT run it on a real TPU (interpret mode has no such
# constraint, which is how the kernel's parity tests pass). The default
# select therefore requires c1 % 128 == 0 on TPU; the thin-conv training
# cost is attacked structurally instead (RepSBlock branch-concat).
WGRAD_PALLAS = False


def _wgrad_default_select(c1: int, c2: int) -> bool:
    if jax.default_backend() == "tpu":
        return c1 % 128 == 0 and c1 <= 256
    return c1 <= 64 and c2 <= 64


_WGRAD_SELECT = _wgrad_default_select


def set_pallas_wgrad(enable: bool, select=None) -> None:
    """Enable the Pallas weight-gradient backward for 3x3 stride-1
    ungrouped convs passing `select(c1, c2)` (default: see
    _wgrad_default_select and the Mosaic DMA note above)."""
    global WGRAD_PALLAS, _WGRAD_SELECT
    WGRAD_PALLAS = bool(enable)
    _WGRAD_SELECT = select or _wgrad_default_select


# Grouped/depthwise convs don't map onto the MXU: XLA lowers them to a
# VPU sliding window, and the round-4 b32 trace shows the GSConv 5x5
# depthwise convs (reference models/common.py GSConv, g == c2) running
# ~20x off the bandwidth roofline (0.35 ms each at 32ch@80x80). Below
# this channel width it is cheaper to EMBED the grouped kernel into a
# block-diagonal dense kernel and run one MXU conv — the extra
# multiply-by-zero MACs are free next to the VPU path (g x more MACs,
# but the MXU has >100x the grouped path's measured throughput). Exact:
# the off-diagonal taps contribute 0.0 to the accumulator.
DENSE_GROUPED_MAX_C1 = 64

# How the stem fast path space-to-depths the quantized image before its
# fused flat conv (read at trace time). "6d" = one 6D reshape+transpose;
# "phase" = four strided slices (ReOrg-style). stem_glue_bench's
# isolated chain favored "phase" (3.70 -> 2.41 ms), but in the full b32
# q8 graph XLA lowers the strided slices to four 1.0 ms s32-index
# gather fusions (round-5 trace: l0 3.1 -> 7.6 ms); the interleaved
# end-to-end A/B (ab_flag stem_s2d, b32 q8) measured phase a REAL
# +4.30 ms loss, control noise 0.09 — the default follows the graph.
STEM_S2D_MODE = "6d"


def set_stem_s2d(mode: str) -> None:
    """Select the stem s2d formulation ("phase" | "6d"). Trace-time flag
    (same contract as set_dense_grouped): set BEFORE the first traced
    forward; already-jitted functions keep their cached computation."""
    global STEM_S2D_MODE
    assert mode in ("phase", "6d"), mode
    STEM_S2D_MODE = mode


def set_dense_grouped(max_c1: int) -> None:
    """Channel-width gate for the block-diagonal dense rewrite of grouped
    convs (0 disables; default 64 — above that the g-fold MAC overhead
    starts to rival the VPU path it replaces). Read at trace time (same
    contract as set_conv_precision): set BEFORE the first traced forward;
    already-jitted functions keep their cached computation."""
    global DENSE_GROUPED_MAX_C1
    DENSE_GROUPED_MAX_C1 = int(max_c1)


def _dense_grouped_weights(kern: jax.Array, c1: int, c2: int,
                           g: int) -> jax.Array:
    """(k, k, c1/g, c2) grouped kernel -> (k, k, c1, c2) block-diagonal
    dense kernel computing the identical conv with g == 1."""
    cg_in = c1 // g
    cg_out = c2 // g
    i = jnp.arange(c1)
    o = jnp.arange(c2)
    dense = jnp.take(kern, i % cg_in, axis=2)            # (k, k, c1, c2)
    mask = (i[:, None] // cg_in) == (o[None, :] // cg_out)
    return dense * mask.astype(kern.dtype)


class _NestedConvParams(nn.Module):
    """Declares a deploy conv's {kernel, bias} under a nested module-name
    chain, producing the SAME param paths as the regular module tree
    (e.g. ("stage1", "reparam_conv") -> stage1/reparam_conv/w/{kernel,bias})
    so the fast path consumes unmodified fused checkpoints. (The field is
    `chain`, not `path` — nn.Module already owns a `path` property.)"""

    chain: tuple
    shape: tuple
    fan_in: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        if len(self.chain) == 0:
            return _ConvParams(self.shape, self.use_bias, self.fan_in,
                               name="w")()
        return _NestedConvParams(self.chain[1:], self.shape, self.fan_in,
                                 self.use_bias, name=self.chain[0])()


class _BNStatParams(nn.Module):
    """Declares one BatchNorm's {scale, bias} params and {mean, var}
    running stats with nn.BatchNorm's exact names/shapes/dtypes, returning
    the raw params + mutable variable refs for fused-stat execution."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class _NestedBNParams(nn.Module):
    """BN analog of _NestedConvParams: declares a BN's params/stats under
    the wrapper name + a 'norm' leaf (e.g. name='rbr_skip' ->
    rbr_skip/norm/{scale,bias} + batch_stats rbr_skip/norm/{mean,var}),
    identical to what BN/nn.BatchNorm would declare — fused and unfused
    paths share checkpoints bit-for-bit."""

    features: int

    @nn.compact
    def __call__(self):
        return _BNStatParams(self.features, name="norm")()


def _xla_conv_q8(x_q, w, bias, s_in, out_scale=None):
    """XLA NHWC int8 conv with the requant fused into the epilogue: int8
    in -> s32 accumulate -> f32 dequant+bias+SiLU -> bf16 (or int8 at
    out_scale). Weights quantized per-output-channel at trace time."""
    from rep_yolo_tpu.ops.pallas.conv_kernel import quantize_weights

    k = w.shape[0]
    O = w.shape[-1]
    w_q, s_w = quantize_weights(w.reshape(-1, O).T)      # (O, k*k*C)
    w_q = w_q.T.reshape(w.shape)                          # HWIO int8
    p = k // 2
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_w[:, 0] * s_in) + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    if out_scale is not None:
        return jnp.clip(jnp.round(y * (1.0 / out_scale)),
                        -127, 127).astype(jnp.int8)
    return y.astype(jnp.bfloat16)


def _quantize_tensor(x, s):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s)),
                    -127, 127).astype(jnp.int8)


class ConvUnit(nn.Module):
    """Raw conv wrapper with torch-default init and explicit padding.

    Routes through the int8 PTQ path (ops/quant.py) when this conv has a
    calibrated activation scale and the quantization registry selects it.

    Flat-region input (ops/pallas/neck_flat.FlatT, or a list of them —
    an unmaterialized concat): runs the fused flat int8 kernel instead,
    with ``cm_act`` fused into the epilogue and the output quantized at
    ``cm_out`` (float -> FlatT; None/"bf16" -> raw (B, O, H*W) bf16,
    the caller handles the exit relayout).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    use_bias: bool = False
    cm_act: str | None = None
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x) -> jax.Array:
        from rep_yolo_tpu.ops import quant
        from rep_yolo_tpu.ops.pallas import neck_flat

        if neck_flat.is_flat(x):
            if isinstance(x, (list, tuple)):
                c1 = sum(t.c for t in x)
            else:
                c1 = x.c
            fan_in = (c1 // self.g) * self.k * self.k
            shape = (self.k, self.k, c1 // self.g, self.c2)
            kern, bias = _ConvParams(shape, self.use_bias, fan_in,
                                     name="w")()
            out_s = self.cm_out if isinstance(self.cm_out, float) else None
            return neck_flat.flat_conv(x, kern, bias, self.k, self.s,
                                       self.g, self.cm_act, out_s)

        p = autopad(self.k, self.p)
        c1 = x.shape[-1]
        fan_in = (c1 // self.g) * self.k * self.k
        kern, bias = _ConvParams((self.k, self.k, c1 // self.g, self.c2),
                                 self.use_bias, fan_in, name="w")()

        path = "/".join(self.scope.path) if self.scope is not None else ""
        s_in = quant.scale_for(path, self.k, c1, self.c2, self.g)
        if s_in is not None:
            y = quant.quant_conv(x, kern, s_in, self.s, p)
        elif (self.k == 3 and self.s == 2 and p == 1 and self.g == 1
                and c1 <= 8 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # thin-channel stride-2 stem (K = 9*c1 = 27 at c1=3 badly
            # underfills the MXU contraction rows; measured 3.9 ms of the
            # b32 deploy forward): exact space-to-depth decomposition
            y = _s2d_stride2_conv(x, kern, CONV_PRECISION)
        elif (WGRAD_PALLAS and self.k == 3 and self.s == 1 and p == 1
                and self.g == 1 and _WGRAD_SELECT(c1, self.c2)):
            from rep_yolo_tpu.ops.pallas.wgrad_kernel import \
                conv3x3_pallas_wgrad

            dt = jnp.result_type(x, kern)
            y = conv3x3_pallas_wgrad(x.astype(dt), kern.astype(dt),
                                     precision=CONV_PRECISION)
        elif (self.g > 1 and c1 <= DENSE_GROUPED_MAX_C1
                and c1 % self.g == 0 and self.c2 % self.g == 0):
            # grouped/depthwise -> block-diagonal dense MXU conv (see
            # DENSE_GROUPED_MAX_C1 above); numerically exact (the zero
            # taps contribute 0.0 — summation order may differ)
            dt = jnp.result_type(x, kern)
            dense = _dense_grouped_weights(kern, c1, self.c2, self.g)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), dense.astype(dt), (self.s, self.s),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=CONV_PRECISION)
        else:
            # same dtype promotion as nn.Conv (dtype=None): inputs and
            # params are promoted to a common dtype before the conv
            dt = jnp.result_type(x, kern)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kern.astype(dt), (self.s, self.s),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.g,
                precision=CONV_PRECISION)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class BN(nn.Module):
    """BatchNorm with reference hyperparameters.

    Eval keeps the input dtype (flax's default promotes bf16 activations
    to f32 via the f32 stats, which silently drags every downstream op —
    notably the axial-attention einsums — onto the slow f32 path).
    Training uses full f32 stats as usual.
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # f32 training keeps flax's default f32 stats math; bf16 inputs
        # (mixed-precision training / bf16 serving) stay bf16 so downstream
        # ops aren't silently promoted. Running stats are stored f32 either
        # way (param_dtype default).
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=None if (train and x.dtype == jnp.float32) else x.dtype,
            name="norm",
        )(x)


class ConvBnAct(nn.Module):
    """conv + BN + act — the reference `Conv` (models/common.py:101-116).

    ``deploy=True`` swaps to a single biased conv (BN folded by
    ``fuse.fold_conv_bn``), mirroring `fuseforward`.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: str | None = "silu"
    deploy: bool = False
    # flat-region output target (see ConvUnit.cm_out): float -> FlatT at
    # that scale; "bf16" -> flat (B, c2, H*W) bf16; None -> NHWC exit.
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.ops.pallas import neck_flat

        if neck_flat.is_flat(x):
            assert self.deploy and not train
            h, w = neck_flat.flat_hw(x)
            y = ConvUnit(self.c2, self.k, self.s, self.p, self.g,
                         use_bias=True, cm_act=self.act,
                         cm_out=self.cm_out, name="conv")(x)
            if self.cm_out is None:
                return neck_flat.bf16_flat_to_nhwc(y, h // self.s,
                                                   w // self.s)
            return y
        y = ConvUnit(self.c2, self.k, self.s, self.p, self.g,
                     use_bias=self.deploy, name="conv")(x)
        if not self.deploy:
            y = BN(name="bn")(y, train)
        return _act(self.act, y)


def dw_groups(c1: int, c2: int) -> int:
    """DWConv group count = gcd(c1, c2) (reference models/common.py:154-156)."""
    return math.gcd(c1, c2)


class MP(nn.Module):
    """2x2 stride-2 max pool (reference models/common.py:32-38)."""

    k: int = 2

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return max_pool(x, self.k, self.k)


class SP(nn.Module):
    """k x k stride-s max pool, same padding (reference models/common.py:41-47)."""

    k: int = 3
    s: int = 1

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return max_pool(x, self.k, self.s, self.k // 2)


class ReOrg(nn.Module):
    """Space-to-depth 2x (reference models/common.py:50-55)."""

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)


class Focus(nn.Module):
    """Space-to-depth + conv (reference models/common.py:812)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: str | None = "silu"
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)
        return ConvBnAct(self.c2, self.k, self.s, self.p, self.g, self.act,
                         self.deploy, name="conv")(y, train)


class RepSBlock(nn.Module):
    """MobileOne-style reparameterizable conv block.

    Train: sum of `num_conv_branches` k x k conv+BN branches, a 1x1
    conv+BN "scale" branch (k>1), and a BN identity skip (cin==cout, s==1),
    then SiLU (reference models/common.py:3374-3434). Deploy: one biased
    k x k conv (+SiLU); the algebra lives in ``fuse.fuse_reps_block``
    (reference `_get_kernel_bias` models/common.py:3462-3489).
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    num_conv_branches: int = 1
    deploy: bool = False
    # q8-region hook (models/network.py planner): emit flat (B, c2,
    # (H/2)*(W/2)) int8 at this scale instead of NHWC bf16, entering the
    # channel-major region AT the stem — the NHWC stem output otherwise
    # pays ~5 ms of b32 layout copies + a separate quantize before l1
    # (BASELINE.md round-3 trace). Only taken for the thin stride-2 stem
    # shape (k=3, s=2, c1<=4); falls back silently when uncalibrated.
    cm_out_scale: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.deploy:
            if (self.cm_out_scale is not None and not train
                    and CMAJOR_DEPLOY == "q8" and self.k == 3
                    and self.s == 2 and self.p == 1 and self.c1 <= 4
                    and x.ndim == 4 and x.shape[1] % 2 == 0
                    and x.shape[2] % 2 == 0):
                y = self._stem_fast_q8(x)
                if y is not None:
                    return y
            y = ConvUnit(self.c2, self.k, self.s, self.p, use_bias=True,
                         name="reparam_conv")(x)
            return jax.nn.silu(y)

        # Branch pre-BN tensors in the reference's accumulation order
        # (skip, scale, conv_0..N). Accumulate without a scalar seed:
        # jnp.zeros(()) is f32 and would silently promote the whole (bf16)
        # mixed-precision forward AND its backward to f32 (measured
        # 690 -> f32 backward on v5e).
        parts: list[tuple[jax.Array, str]] = []
        if self.c1 == self.c2 and self.s == 1:
            parts.append((x, "rbr_skip"))
        if self.k > 1:
            s = ConvUnit(self.c2, 1, self.s, 0, name="rbr_scale_conv")(x)
            parts.append((s, "rbr_scale_bn"))
        if self.num_conv_branches > 1:
            # run the N identical kxk branches as ONE output-concatenated
            # conv: the branches are independent per output channel, so
            # conv(x, concat_O(k_i)) == concat_O(conv(x, k_i)) exactly —
            # but the fused conv fills N*c2 MXU lanes instead of c2
            # (b8 train trace: the 48-out 3x3s run at 37% lane fill and
            # are HALF the step; fusing the 2 branches doubles fill for
            # fwd, dgrad, and wgrad in one move). Params are declared at
            # the same paths as the per-branch ConvUnits, so checkpoints
            # and the fuse transform are unaffected.
            ks = [
                _NestedConvParams(
                    (), (self.k, self.k, self.c1, self.c2),
                    self.c1 * self.k * self.k, use_bias=False,
                    name=f"rbr_conv_{i}_conv")()[0]
                for i in range(self.num_conv_branches)
            ]
            kcat = jnp.concatenate(ks, axis=-1)
            dt = jnp.result_type(x, kcat)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kcat.astype(dt), (self.s, self.s),
                ((self.p, self.p), (self.p, self.p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=CONV_PRECISION)
            for i in range(self.num_conv_branches):
                sl = y[..., i * self.c2:(i + 1) * self.c2]
                parts.append((sl, f"rbr_conv_{i}_bn"))
        else:
            for i in range(self.num_conv_branches):
                b = ConvUnit(self.c2, self.k, self.s, self.p,
                             name=f"rbr_conv_{i}_conv")(x)
                parts.append((b, f"rbr_conv_{i}_bn"))
        out = None
        for t, name in parts:
            b = BN(name=name)(t, train)
            out = b if out is None else out + b
        return jax.nn.silu(out)

    def _stem_fast_q8(self, x: jax.Array) -> jax.Array | None:
        """Thin stride-2 stem directly into the flat int8 region: quantize
        the image, space-to-depth to channel-major (B, 4*c1, H/2*W/2), and
        run ONE fused flat conv that is exactly the stride-2 3x3 stem —
        the s2d 2x2 kernel (same (phase, tap) lattice as
        `_s2d_stride2_conv`) embedded at [:2, :2] of a 3x3 so the
        stride-1 SAME flat kernel reproduces pad ((1,0),(1,0)) VALID 2x2
        (taps at offsets {-1, 0}; the v=2/u=2 taps carry zero weights).
        Declares the SAME `reparam_conv/w` param paths as the regular
        deploy ConvUnit. Returns None when the input scale is
        uncalibrated."""
        from rep_yolo_tpu.ops.pallas.conv_flat import conv3x3_flat_q8

        prefix = "/".join(self.scope.path) if self.scope is not None else ""
        s_in = CMAJOR_SCALES.get(f"{prefix}/reparam_conv")
        if s_in is None or s_in <= 0.0:
            return None
        C, O = self.c1, self.c2
        kern, bias = _NestedConvParams(
            (), (3, 3, C, O), C * 9, True, name="reparam_conv")()

        bn, H, W, _ = x.shape
        H2, W2 = H // 2, W // 2
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_in)),
                      -127, 127).astype(jnp.int8)
        # barrier: keep the cheap int8 relayout below the quantize
        # (same hoisting hazard as DERBlock's entry, measured there)
        xq = jax.lax.optimization_barrier(xq)
        # Channel order stays (phase-block, C) either way — the weight
        # embedding below matches. See STEM_S2D_MODE for why both
        # formulations are kept.
        if STEM_S2D_MODE == "phase":
            phases = [xq[:, ph::2, qw::2, :]
                      for ph in (0, 1) for qw in (0, 1)]
            xs = jnp.stack(phases, axis=1)          # (B, 4, H2, W2, C)
            xs = jnp.transpose(xs, (0, 1, 4, 2, 3)).reshape(bn, 4 * C,
                                                            H2 * W2)
        else:
            xs = xq.reshape(bn, H2, 2, W2, 2, C)
            xs = jnp.transpose(xs, (0, 2, 4, 5, 1, 3)).reshape(bn, 4 * C,
                                                               H2 * W2)
        # the flat kernel's slab DMA slices the channel dim, which must
        # sit on whole sublane tiles: pad 4*C=12 -> 16 with zero channels
        # (and zero weight rows below) — exact
        CP = -(-4 * C // 8) * 8
        if CP > 4 * C:
            xs = jnp.pad(xs, ((0, 0), (0, CP - 4 * C), (0, 0)))
        w3 = jnp.zeros((3, 3, CP, O), jnp.float32)
        for ap, pph, di in ((0, 1, 0), (1, 0, 1), (1, 1, 2)):
            for bq, qph, dj in ((0, 1, 0), (1, 0, 1), (1, 1, 2)):
                ch = (pph * 2 + qph) * C
                w3 = w3.at[ap, bq, ch:ch + C].set(
                    kern[di, dj].astype(jnp.float32))
        return conv3x3_flat_q8(xs, w3, bias, float(s_in), H2, W2,
                               act="silu",
                               out_scale=float(self.cm_out_scale))


class DERBlock(nn.Module):
    """Composite backbone block: 3 full-width RepS stages, then 3 half-width
    RepS stages sandwiched by 1x1 compress/expand Convs, with a 3-way concat
    of [stage1, mid1, mid3] -> 1x1 projection. Dropout(0.2) after every
    stage (reference models/common.py:3530-3654; forward at :3644-3654).
    """

    c1: int
    c2: int
    num_blocks_per_stage: int = 1  # accepted for cfg parity; stages are single-block
    num_conv_branches: int = 1
    deploy: bool = False
    # Channel-major q8 REGION hooks (set by DetectionNet's region planner,
    # models/network.py): with cm_in, `x` arrives as (B, c1, H*W) int8
    # already quantized at this block's st1 scale (cm_hw carries the
    # spatial shape); with cm_out_scale, the block returns (B, c2, H*W)
    # int8 at that scale instead of NHWC bf16 — the per-block entry
    # quantize+transpose and exit relayout (b32 trace: ~4.6 ms of l1's
    # 17.2) disappear inside the region.
    cm_in: bool = False
    cm_hw: tuple | None = None
    cm_out_scale: float | None = None
    # With cm_pool (planner-set, requires cm_out_scale), the trailing
    # reference MP (2x2/s2 max pool) is fused into cv1's epilogue: the
    # block returns (B, c2, (H//2)*(W//2)) int8 and the standalone pool
    # kernel never runs (conv_flat.conv1x1_flat_q8 pool_hw).
    cm_pool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1, nb, dep = self.c1, self.num_conv_branches, self.deploy

        if dep and not train and CMAJOR_DEPLOY:
            hh, ww = (self.cm_hw if self.cm_in
                      else (x.shape[1], x.shape[2]))
            if _CMAJOR_SELECT(c1, hh, ww):
                y = self._fast_deploy(x)
                if y is not None:
                    return y
            if self.cm_in:
                raise ValueError(
                    "cm_in set but the fast path declined (missing "
                    "calibration scales or gate mismatch)")

        def stage(name: str, ch: int, h: jax.Array) -> jax.Array:
            h = RepSBlock(ch, ch, 3, 1, 1, nb, dep, name=name)(h, train)
            return nn.Dropout(0.2, deterministic=not train)(h)

        x1 = stage("stage1", c1, x)
        x2 = stage("stage2", c1, x1)
        x3 = stage("stage3", c1, x2)
        x4_1 = ConvBnAct(c1, 1, 1, deploy=dep, name="cv0_2")(
            stage("stage4", c1 // 2,
                  ConvBnAct(c1 // 2, 1, 1, deploy=dep, name="cv0_1")(x3, train)),
            train)
        x4_2 = ConvBnAct(c1, 1, 1, deploy=dep, name="cv1_2")(
            stage("stage5", c1 // 2,
                  ConvBnAct(c1 // 2, 1, 1, deploy=dep, name="cv1_1")(x4_1, train)),
            train)
        x4_3 = ConvBnAct(c1, 1, 1, deploy=dep, name="cv2_2")(
            stage("stage6", c1 // 2,
                  ConvBnAct(c1 // 2, 1, 1, deploy=dep, name="cv2_1")(x4_2, train)),
            train)
        x5 = jnp.concatenate([x1, x4_1, x4_3], axis=-1)
        return ConvBnAct(self.c2, 1, 1, deploy=dep, name="cv1")(x5, train)

    def _fast_deploy(self, x: jax.Array) -> jax.Array | None:
        """Execute the fused deploy block through the channel-major /
        int8-resident conv kernels (see set_cmajor_deploy). Declares the
        SAME param tree as the regular deploy path via _NestedConvParams.
        Returns None (before declaring anything) when the mode needs
        calibration scales that are missing."""
        from rep_yolo_tpu.ops.pallas.conv_kernel import (
            conv1x1_cmajor, conv3x3_cmajor)

        c1, c2 = self.c1, self.c2
        half = c1 // 2
        mode = CMAJOR_DEPLOY
        # (name, module path, k, cin, cout) in dataflow order
        layout = [
            ("st1", ("stage1", "reparam_conv"), 3, c1, c1),
            ("st2", ("stage2", "reparam_conv"), 3, c1, c1),
            ("st3", ("stage3", "reparam_conv"), 3, c1, c1),
            ("cv0_1", ("cv0_1", "conv"), 1, c1, half),
            ("st4", ("stage4", "reparam_conv"), 3, half, half),
            ("cv0_2", ("cv0_2", "conv"), 1, half, c1),
            ("cv1_1", ("cv1_1", "conv"), 1, c1, half),
            ("st5", ("stage5", "reparam_conv"), 3, half, half),
            ("cv1_2", ("cv1_2", "conv"), 1, half, c1),
            ("cv2_1", ("cv2_1", "conv"), 1, c1, half),
            ("st6", ("stage6", "reparam_conv"), 3, half, half),
            ("cv2_2", ("cv2_2", "conv"), 1, half, c1),
            ("cv1", ("cv1",), 1, 3 * c1, c2),
        ]
        prefix = "/".join(self.scope.path) if self.scope is not None else ""
        scales = {}
        if mode in ("q8", "xla_q8"):
            for name, path, _, _, _ in layout:
                # ConvBnAct's inner ConvUnit scope is <name>/conv
                key = f"{prefix}/{'/'.join(path if len(path) > 1 else (path[0], 'conv'))}"
                s = CMAJOR_SCALES.get(key)
                if s is None or s <= 0.0:
                    return None  # uncalibrated: use the regular path
                scales[name] = float(s)

        params = {}
        for name, path, k, cin, cout in layout:
            mpath = path if len(path) > 1 else (path[0], "conv")
            params[name] = _NestedConvParams(
                mpath[1:], (k, k, cin, cout), cin * k * k, name=mpath[0])()

        # consumer map: conv -> the conv whose input scale its int8
        # output is emitted at (the concat parts use the fold below)
        nxt = {"st1": "st2", "st2": "st3", "st3": "cv0_1", "cv0_1": "st4",
               "st4": "cv0_2", "cv0_2": "cv1_1", "cv1_1": "st5",
               "st5": "cv1_2", "cv1_2": "cv2_1", "cv2_1": "st6",
               "st6": "cv2_2", "cv2_2": "cv1"}

        def run_chain(h0, conv):
            x1 = conv("st1", h0)
            x2 = conv("st2", x1)
            x3 = conv("st3", x2)
            x4_1 = conv("cv0_2", conv("st4", conv("cv0_1", x3)))
            x4_2 = conv("cv1_2", conv("st5", conv("cv1_1", x4_1)))
            x4_3 = conv("cv2_2", conv("st6", conv("cv2_1", x4_2)))
            return x1, x4_1, x4_3

        k_cv1, b_cv1 = params["cv1"]
        if mode in ("q8", "xla_q8"):
            # concat sections arrive int8 at different scales (x1 @
            # s(st2), x4_1 @ s(cv1_1), x4_3 @ s(cv1)): fold each
            # section's scale into cv1's per-input-channel weights and
            # run cv1 with s_in = 1 — exact, no int8 rescaling step.
            sec = jnp.concatenate([
                jnp.full((c1,), scales["st2"], jnp.float32),
                jnp.full((c1,), scales["cv1_1"], jnp.float32),
                jnp.full((c1,), scales["cv1"], jnp.float32)])
            k_cv1 = k_cv1.astype(jnp.float32) * sec[None, None, :, None]

        if mode == "q8":
            # v2 flat kernels (ops/pallas/conv_flat.py): the whole block
            # runs on flat (B, C, H*W) row-major int8 with in-kernel halo
            # handling — no XLA pads/reshapes/concat between convs.
            # (A pixel-major (B, H*W, C) formulation was built and
            # measured dead on arrival: Mosaic tiles the custom-call
            # operands' minor dim to 128 lanes, so thin-C pixel-major
            # buffers pad 2.7x and every chained activation pays a pad
            # relayout — see ops/pallas/conv_pm.py, kept for wide-C use.)
            # Quantize BEFORE the entry transpose, behind an optimization
            # barrier: without it XLA hoists the NHWC->NCHW transpose
            # above the quantize and moves 157 MB of bf16 instead of
            # 78 MB of int8 (b32 trace: 1.89 ms copy + 0.85 ms separate
            # clamp fusion).
            from rep_yolo_tpu.ops.pallas.conv_flat import (
                conv1x1_flat_q8, conv3x3_flat_q8)

            bn = x.shape[0]
            if self.cm_in:
                hh, ww = self.cm_hw
                xf = x     # (B, c1, H*W) int8, already at scales["st1"]
            else:
                bn, hh, ww, _ = x.shape
                # Quantize BEFORE the entry transpose, behind a barrier:
                # without it XLA hoists the NHWC->NCHW transpose above
                # the quantize and moves 2x the bytes (bf16 vs int8).
                xq = jnp.clip(jnp.round(x.astype(jnp.float32)
                                        * (1.0 / scales["st1"])), -127, 127
                              ).astype(jnp.int8)
                xq = jax.lax.optimization_barrier(xq)
                xf = jnp.transpose(xq, (0, 3, 1, 2)).reshape(bn, c1, hh * ww)

            def conv(name, h):
                kern, bias = params[name]
                if kern.shape[0] == 3:
                    return conv3x3_flat_q8(h, kern, bias, scales[name],
                                           hh, ww, act="silu",
                                           out_scale=scales[nxt[name]])
                return conv1x1_flat_q8(h, kern, bias, scales[name],
                                       act="silu",
                                       out_scale=scales[nxt[name]])

            x1, x4_1, x4_3 = run_chain(xf, conv)
            if self.cm_out_scale is not None:
                # stay in the region: flat int8 at the successor's scale;
                # with cm_pool the trailing MP is fused into this kernel
                # (output already pooled to (H//2, W//2))
                return conv1x1_flat_q8([x1, x4_1, x4_3], k_cv1, b_cv1,
                                       1.0, act="silu",
                                       out_scale=float(self.cm_out_scale),
                                       pool_hw=((hh, ww) if self.cm_pool
                                                else None))
            y = conv1x1_flat_q8([x1, x4_1, x4_3], k_cv1, b_cv1, 1.0,
                                act="silu")
            y = jnp.transpose(y.reshape(bn, self.c2, hh, ww), (0, 2, 3, 1))
            out_dt = jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype
            return y.astype(out_dt)

        if mode == "bf16":
            xc = jnp.transpose(x, (0, 3, 1, 2))

            def conv(name, h):
                kern, bias = params[name]
                fn = (conv3x3_cmajor if kern.shape[0] == 3
                      else conv1x1_cmajor)
                return fn(h, kern.astype(h.dtype), bias, act="silu")

            x1, x4_1, x4_3 = run_chain(xc, conv)
            cat = jnp.concatenate([x1, x4_1, x4_3], axis=1)
            y = conv1x1_cmajor(cat, k_cv1.astype(cat.dtype), b_cv1,
                               act="silu")
            return jnp.transpose(y, (0, 2, 3, 1)).astype(x.dtype)

        # mode == "xla_q8": NHWC int8-resident XLA convs
        def conv(name, h):
            kern, bias = params[name]
            return _xla_conv_q8(h, kern, bias, scales[name],
                                out_scale=scales[nxt[name]])

        xq = _quantize_tensor(x, scales["st1"])
        x1, x4_1, x4_3 = run_chain(xq, conv)
        cat = jnp.concatenate([x1, x4_1, x4_3], axis=-1)
        y = _xla_conv_q8(cat, k_cv1, b_cv1, 1.0)
        return y.astype(x.dtype)


class RepConv(nn.Module):
    """RepVGG block: 3x3 conv+BN || 1x1 conv+BN || BN identity, summed, SiLU
    (reference models/common.py:476-520). Deploy: single biased 3x3 conv;
    fusion algebra in ``fuse.fuse_repconv`` (reference
    `get_equivalent_kernel_bias` models/common.py:522-529).
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: str | None = "silu"
    deploy: bool = False
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.ops.pallas import neck_flat as nf

        assert self.k == 3
        if nf.is_flat(x):
            h, w = nf.flat_hw(x)
            y = ConvUnit(self.c2, 3, self.s, 1, self.g, use_bias=True,
                         cm_act=self.act, cm_out=self.cm_out,
                         name="rbr_reparam")(x)
            if self.cm_out is None:
                return nf.bf16_flat_to_nhwc(y, h // self.s, w // self.s)
            return y
        if self.deploy:
            y = ConvUnit(self.c2, 3, self.s, 1, self.g, use_bias=True,
                         name="rbr_reparam")(x)
            return _act(self.act, y)
        dense = BN(name="rbr_dense_bn")(
            ConvUnit(self.c2, 3, self.s, 1, self.g, name="rbr_dense_conv")(x), train)
        one = BN(name="rbr_1x1_bn")(
            ConvUnit(self.c2, 1, self.s, 0, self.g, name="rbr_1x1_conv")(x), train)
        out = dense + one
        if self.c1 == self.c2 and self.s == 1:
            out = out + BN(name="rbr_identity")(x, train)
        return _act(self.act, out)


class SPPCSPC(nn.Module):
    """CSP spatial pyramid pooling, maxpool k=(5,9,13), 7 convs
    (reference models/common.py:270-290).
    """

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: tuple[int, ...] = (5, 9, 13)
    deploy: bool = False
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.ops.pallas import neck_flat as nf

        c_ = int(2 * self.c2 * self.e)
        dep = self.deploy
        if nf.is_flat(x):
            # flat path: the k=(5,9,13) pyramid runs as one Pallas
            # kernel emitting the 4-way concat (max commutes with the
            # dequant scale, so the pools are pure int8 passthrough)
            assert self.k == (5, 9, 13), self.k
            import numpy as np

            h, w = nf.flat_hw(x)
            ss = {nm: cm_scale_for(self, f"{nm}/conv")
                  for nm in ("cv3", "cv4", "cv5", "cv6", "cv7")}
            assert all(s is not None for s in ss.values()), ss
            cvf = lambda name, c, k_, out: ConvBnAct(
                c, k_, 1, deploy=True, cm_out=out, name=name)
            x1 = cvf("cv1", c_, 1, ss["cv3"])(x, train)
            x1 = cvf("cv3", c_, 3, ss["cv4"])(x1, train)
            x1 = cvf("cv4", c_, 1, ss["cv5"])(x1, train)
            pooled = nf.FlatT(nf.spp_pools_flat(x1.data, h, w),
                              np.tile(x1.scale_vec(), 4), h, w)
            y1 = cvf("cv5", c_, 1, ss["cv6"])(pooled, train)
            y1 = cvf("cv6", c_, 3, ss["cv7"])(y1, train)
            y2 = cvf("cv2", c_, 1, ss["cv7"])(x, train)
            return cvf("cv7", self.c2, 1, self.cm_out)([y1, y2], train)
        cv = lambda name, c, k_, s: ConvBnAct(c, k_, s, deploy=dep, name=name)
        x1 = cv("cv4", c_, 1, 1)(cv("cv3", c_, 3, 1)(cv("cv1", c_, 1, 1)(x, train), train), train)
        pooled = [x1] + [max_pool(x1, k_, 1, k_ // 2) for k_ in self.k]
        y1 = cv("cv6", c_, 3, 1)(
            cv("cv5", c_, 1, 1)(jnp.concatenate(pooled, axis=-1), train), train)
        y2 = cv("cv2", c_, 1, 1)(x, train)
        return cv("cv7", self.c2, 1, 1)(jnp.concatenate([y1, y2], axis=-1), train)


class SPP(nn.Module):
    """Plain SPP (reference models/common.py:202-213)."""

    c2: int
    k: tuple[int, ...] = (5, 9, 13)
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        x = ConvBnAct(c1 // 2, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y = jnp.concatenate([x] + [max_pool(x, k, 1, k // 2) for k in self.k], axis=-1)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv2")(y, train)


class SPPF(nn.Module):
    """Fast SPP: 3 chained k-pools (reference models/common.py:824)."""

    c2: int
    k: int = 5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        x = ConvBnAct(c1 // 2, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y1 = max_pool(x, self.k, 1, self.k // 2)
        y2 = max_pool(y1, self.k, 1, self.k // 2)
        y3 = max_pool(y2, self.k, 1, self.k // 2)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train)


def gs_shuffle(x: jax.Array) -> jax.Array:
    """GSConv channel shuffle: even-indexed channels first, then odd
    (equivalent to the reshape/permute dance at reference
    models/common.py:3819-3825).
    """
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


class GSConv(nn.Module):
    """Half-width conv + 5x5 depthwise conv, concat, channel shuffle
    (Slim-Neck GSConv, reference models/common.py:3807-3825).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: str | None = "silu"
    deploy: bool = False
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.ops.pallas import neck_flat

        c_ = self.c2 // 2
        if neck_flat.is_flat(x):
            return self._flat_q8(x, train, c_, neck_flat)
        x1 = ConvBnAct(c_, self.k, self.s, self.p, self.g, self.act,
                       self.deploy, name="cv1")(x, train)
        x2 = ConvBnAct(c_, 5, 1, self.p, c_, self.act,
                       self.deploy, name="cv2")(x1, train)
        return gs_shuffle(jnp.concatenate([x1, x2], axis=-1))

    def _flat_q8(self, x, train, c_, nf):
        """Flat int8 region path: cv1 emits int8 at cv2's calibrated
        input scale, the 5x5 depthwise runs on the VPU flat kernel, and
        the even/odd channel shuffle is a sublane permutation (per-
        channel scale metadata shuffles with it — exact across the
        mixed-scale concat)."""
        import numpy as np

        h, w = nf.flat_hw(x)
        h2, w2 = h // self.s, w // self.s
        s_cv2 = cm_scale_for(self, "cv2/conv")
        assert s_cv2 is not None, "planner routed flat without cv2 scale"
        x1 = ConvBnAct(c_, self.k, self.s, self.p, self.g, self.act,
                       True, cm_out=s_cv2, name="cv1")(x, train)
        out_t = self.cm_out
        if isinstance(out_t, float):
            x2 = ConvBnAct(c_, 5, 1, self.p, c_, self.act, True,
                           cm_out=out_t, name="cv2")(x1, train)
            # the channel shuffle moves no bytes: it rides as a
            # logical->physical permutation that consumers fold into
            # their weight rows (FlatT.perm)
            sv = np.concatenate([x1.scale_vec(), x2.scale_vec()])
            data = jnp.concatenate([x1.data, x2.data], axis=1)
            # logical order = [evens of concat, odds of concat]
            perm = np.concatenate([np.arange(0, 2 * c_, 2),
                                   np.arange(1, 2 * c_, 2)])
            return nf.FlatT(data, sv, h2, w2, perm=perm)
        # float exit ("bf16" flat or NHWC): dequant x1, keep cv2 float
        x2 = ConvBnAct(c_, 5, 1, self.p, c_, self.act, True,
                       cm_out="bf16", name="cv2")(x1, train)
        x1f = x1.data.astype(jnp.bfloat16) * jnp.bfloat16(float(s_cv2))
        data = jnp.concatenate([x1f, x2], axis=1)
        shuf = nf.gs_shuffle_flat(data)
        if out_t == "bf16":
            return shuf
        return nf.bf16_flat_to_nhwc(shuf, h2, w2)


class GSBottleneck(nn.Module):
    """GSConv bottleneck with 1x1 conv shortcut (reference models/common.py:3827-3838).

    ``cheap=True`` gives GSBottleneckC: depthwise-conv shortcut instead
    (reference models/common.py:3840-3844).
    """

    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    cheap: bool = False
    deploy: bool = False
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.ops.pallas import neck_flat as nf

        c_ = int(self.c2 * self.e)
        if nf.is_flat(x):
            # flat path: the residual add runs in flat bf16 (both
            # branches emit float; int8 addition would need a shared
            # scale that calibration does not provide for the addends),
            # then requants at cm_out — one cheap elementwise pass
            assert not self.cheap, "flat path: GSBottleneckC unsupported"
            h, w = nf.flat_hw(x)
            s_gs2 = cm_scale_for(self, "gs2/cv1/conv")
            assert s_gs2 is not None
            y = GSConv(c_, 1, 1, deploy=True, cm_out=s_gs2,
                       name="gs1")(x, train)
            y = GSConv(self.c2, 3, 1, act=None, deploy=True,
                       cm_out="bf16", name="gs2")(y, train)
            sc = ConvBnAct(self.c2, 1, 1, act=None, deploy=True,
                           cm_out="bf16", name="shortcut")(x, train)
            out = y + sc
            if isinstance(self.cm_out, float):
                return nf.quantize_flat_bf16(out, self.cm_out, h, w)
            if self.cm_out == "bf16":
                return out
            return nf.bf16_flat_to_nhwc(out, h, w)
        y = GSConv(c_, 1, 1, deploy=self.deploy, name="gs1")(x, train)
        y = GSConv(self.c2, 3, 1, act=None, deploy=self.deploy, name="gs2")(y, train)
        if self.cheap:
            sc = ConvBnAct(self.c2, self.k, self.s,
                           g=dw_groups(x.shape[-1], self.c2), act=None,
                           deploy=self.deploy, name="shortcut")(x, train)
        else:
            sc = ConvBnAct(self.c2, 1, 1, act=None, deploy=self.deploy,
                           name="shortcut")(x, train)
        return y + sc


class VoVGSCSP(nn.Module):
    """CSP aggregation of GSBottlenecks (reference models/common.py:3846-3861).

    Note: the reference defines `self.res` (a 3x3 conv) but never uses it in
    forward; we omit it so the param tree has no dead weights.
    """

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    cheap: bool = False
    deploy: bool = False
    cm_out: float | str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        from rep_yolo_tpu.ops.pallas import neck_flat as nf

        c_ = int(self.c2 * self.e)
        if nf.is_flat(x):
            assert not self.cheap, "flat path: VoVGSCSPC unsupported"
            s_cv3 = cm_scale_for(self, "cv3/conv")
            s_gsb = cm_scale_for(self, "gsb_0/gs1/cv1/conv")
            assert s_cv3 is not None and s_gsb is not None
            x1 = ConvBnAct(c_, 1, 1, deploy=True, cm_out=s_gsb,
                           name="cv1")(x, train)
            for i in range(self.n):
                nxt = (cm_scale_for(self, f"gsb_{i + 1}/gs1/cv1/conv")
                       if i + 1 < self.n else s_cv3)
                assert nxt is not None
                x1 = GSBottleneck(c_, e=1.0, deploy=True, cm_out=nxt,
                                  name=f"gsb_{i}")(x1, train)
            y = ConvBnAct(c_, 1, 1, deploy=True, cm_out=s_cv3,
                          name="cv2")(x, train)
            return ConvBnAct(self.c2, 1, deploy=True, cm_out=self.cm_out,
                             name="cv3")([y, x1], train)
        x1 = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        if self.cheap:
            # VoVGSCSPC: one GSBottleneckC(k=1,s=1) (models/common.py:3863-3868)
            x1 = GSBottleneck(c_, 1, 1, e=1.0, cheap=True, deploy=self.deploy,
                              name="gsb_0")(x1, train)
        else:
            for i in range(self.n):
                x1 = GSBottleneck(c_, e=1.0, deploy=self.deploy,
                                  name=f"gsb_{i}")(x1, train)
        y = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, deploy=self.deploy, name="cv3")(
            jnp.concatenate([y, x1], axis=-1), train)


class CA(nn.Module):
    """Channel attention (squeeze-excite-like). Reference quirk reproduced:
    it pools, excites, and returns ``pooled*sigma + pooled`` of shape
    (B,1,1,C) — NOT a reweighted feature map (reference
    models/common.py:3788-3802). The downstream ``ADD`` broadcasts it.
    """

    c1: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        h = ConvUnit(self.c1 // self.ratio, 1, name="f1")(pooled)
        h = ConvUnit(self.c1, 1, name="f2")(jax.nn.relu(h))
        return pooled * jax.nn.sigmoid(h) + pooled


def _densify_grouped_1x1(kern: jax.Array, c1: int, cout: int,
                         g: int) -> jax.Array:
    """Grouped 1x1 conv kernel (1,1,c1/g,cout) -> dense (c1, cout) f32
    block-diagonal matrix (output o reads input group o // (cout/g))."""
    k2 = kern[0, 0].astype(jnp.float32)        # (c1/g, cout)
    cin_g, cout_g = c1 // g, cout // g
    w = jnp.zeros((c1, cout), jnp.float32)
    for gi in range(g):
        w = w.at[gi * cin_g:(gi + 1) * cin_g,
                 gi * cout_g:(gi + 1) * cout_g].set(
            k2[:, gi * cout_g:(gi + 1) * cout_g])
    return w


def _axial_consts(c1: int):
    """Declare the axial-attention projection params at the REGULAR
    deploy module paths (query_conv/key_conv/value_conv ConvUnits + the
    shared 'bn' and value 'bn1' BatchNorms — reference
    models/common.py:3686-3704) and fold them into the packed constants
    the absorbed Pallas kernels take (ops/pallas/axial_attention.py
    v2 docstring): wqk (2*c8, c1), pv (4, c1), pq (4, c8). Must be
    called inside an @nn.compact attention module in deploy mode."""
    c8 = c1 // 8
    g8 = dw_groups(c1, c8)
    kq, bq = _NestedConvParams(("conv",), (1, 1, c1 // g8, c8), c1 // g8,
                               True, name="query_conv")()
    kk, bk = _NestedConvParams(("conv",), (1, 1, c1 // g8, c8), c1 // g8,
                               True, name="key_conv")()
    kv, bv = _NestedConvParams(("conv",), (1, 1, 1, c1), 1, True,
                               name="value_conv")()
    s_qk, b_qk, m_qk, v_qk = _NestedBNParams(c8, name="bn")()
    s_v, b_v, m_v, v_v = _NestedBNParams(c1, name="bn1")()
    wq = _densify_grouped_1x1(kq, c1, c8, g8)
    wk = _densify_grouped_1x1(kk, c1, c8, g8)
    wqk = jnp.concatenate([jnp.transpose(wq), jnp.transpose(wk)], axis=0)
    a_qk = s_qk * jax.lax.rsqrt(v_qk.value + BN_EPS)
    c_qk = b_qk - m_qk.value * a_qk
    a_v = s_v * jax.lax.rsqrt(v_v.value + BN_EPS)
    c_v = b_v - m_v.value * a_v
    # pq rows pre-concatenated for the stacked q;k dot (the kernel's
    # constant broadcasts must stay 2D — see the v2 kernel docstring)
    pq = jnp.stack([
        jnp.concatenate([bq.astype(jnp.float32), bk.astype(jnp.float32)]),
        jnp.concatenate([a_qk, a_qk]),
        jnp.concatenate([c_qk, c_qk])])
    pv = jnp.stack([kv[0, 0, 0].astype(jnp.float32),
                    bv.astype(jnp.float32), a_v, c_v])
    return wqk, pv, pq


class CrissCrossAttention(nn.Module):
    """Axial (criss-cross) attention: row + column energies, joint softmax
    over H+W, learned scalar gamma residual (reference
    models/common.py:3675-3726). Einsum formulation -> batched MXU matmuls.

    Projections reproduce the reference's conv->BN->SiLU->BN->ReLU6 stack:
    q/k/v are grouped 1x1 DWConvs (g=gcd), and — reference quirk — q and k
    share ONE post-BN (`self.bn`) while v has its own (`self.bn1`)
    (reference models/common.py:3686-3687, 3696-3704). BN order q,k,v is
    preserved so running stats match.
    """

    c1: int
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c8 = self.c1 // 8
        H, W = x.shape[1], x.shape[2]
        if (self.deploy and not train and _use_fused_attention(H, W)):
            from rep_yolo_tpu.ops.pallas import axial_attention as _ax
            if _ax.fits(H, W, self.c1):
                # absorbed-projection kernel: only x and one transpose
                # of it cross the custom-call boundary (the v1 kernels'
                # pre-transposed q/k/v operands cascaded relayouts into
                # unrelated layers — BASELINE.md round-2/3)
                wqk, pv, pq = _axial_consts(self.c1)
                gamma = self.param("gamma", nn.initializers.zeros, (1,))
                return _ax.criss_cross_fused_x(x, wqk, pv, pq, gamma)
        g8 = dw_groups(self.c1, c8)
        bn_qk = BN(name="bn")       # shared between q and k
        bn_v = BN(name="bn1")
        q = jax.nn.relu6(bn_qk(
            ConvBnAct(c8, 1, 1, g=g8, deploy=self.deploy, name="query_conv")(x, train),
            train))
        k = jax.nn.relu6(bn_qk(
            ConvBnAct(c8, 1, 1, g=g8, deploy=self.deploy, name="key_conv")(x, train),
            train))
        v = jax.nn.relu6(bn_v(
            ConvBnAct(self.c1, 1, 1, g=self.c1, deploy=self.deploy,
                      name="value_conv")(x, train),
            train))

        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        if _use_fused_attention(x.shape[1], x.shape[2]) and not train:
            from rep_yolo_tpu.ops.pallas import axial_attention as _ax
            if _ax.fits(x.shape[1], x.shape[2], self.c1):
                return _ax.criss_cross_fused(q, k, v, x, gamma)

        hi = CONV_PRECISION
        # TPU-optimized but mathematically identical formulation of the
        # reference's permute+bmm choreography (models/common.py:3693-3726):
        # 1) the column branch runs in a once-transposed (B,W,H,C) layout so
        #    both its einsums are clean leading-batch GEMMs (XLA otherwise
        #    re-transposes the much larger energy/attention tensors);
        # 2) the joint softmax over [energy_H ; energy_W] uses a shared
        #    max/denominator instead of materializing the (B,H,W,H+W)
        #    concat + slices. ~1.7x faster at 80x80 on v5e.
        qT = jnp.transpose(q, (0, 2, 1, 3))              # (B,W,H,c8)
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))              # (B,W,H,C)
        # e_hT[b,w,h,g] = energy_H[b,h,w,g] = sum_c q[bhwc] k[bgwc]
        e_hT = jnp.einsum("bwhc,bwgc->bwhg", qT, kT, precision=hi)
        # energy_W[b,h,w,g] = sum_c q[bhwc] k[bhgc]
        e_w = jnp.einsum("bhwc,bhgc->bhwg", q, k, precision=hi)

        m = jnp.maximum(jnp.transpose(e_hT.max(-1), (0, 2, 1)),
                        e_w.max(-1))[..., None]           # (B,H,W,1)
        mT = jnp.transpose(m, (0, 2, 1, 3))
        x_h = jnp.exp((e_hT - mT).astype(jnp.float32)).astype(e_hT.dtype)
        x_w = jnp.exp((e_w - m).astype(jnp.float32)).astype(e_w.dtype)
        s = jnp.transpose(x_h.sum(-1), (0, 2, 1)) + x_w.sum(-1)  # (B,H,W)
        att_hT = x_h / jnp.transpose(s[..., None], (0, 2, 1, 3))
        att_w = x_w / s[..., None]
        att_w = nn.Dropout(0.2, deterministic=not train)(att_w)

        out_h = jnp.transpose(
            jnp.einsum("bwgc,bwhg->bwhc", vT, att_hT, precision=hi),
            (0, 2, 1, 3))
        out_w = jnp.einsum("bhgc,bhwg->bhwc", v, att_w, precision=hi)
        return gamma * (out_h + out_w) + x


class VerticalAttention(nn.Module):
    """Column-only axial attention. Reference quirk reproduced: the softmax
    is computed but the *raw* energies are used as attention weights
    (reference models/common.py:3770-3777) — so we skip the dead softmax
    entirely (it cannot affect outputs or gradients).
    """

    c1: int
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c8 = self.c1 // 8
        if (self.deploy and not train
                and _use_fused_attention(x.shape[1], x.shape[2])):
            from rep_yolo_tpu.ops.pallas import axial_attention as _ax
            if _ax.fits(x.shape[1], x.shape[2], self.c1):
                wqk, pv, pq = _axial_consts(self.c1)
                gamma = self.param("gamma", nn.initializers.zeros, (1,))
                return _ax.vertical_fused_x(x, wqk, pv, pq, gamma)
        g8 = dw_groups(self.c1, c8)
        bn_qk = BN(name="bn")       # shared between q and k (reference quirk)
        bn_v = BN(name="bn1")
        q = jax.nn.relu6(bn_qk(
            ConvBnAct(c8, 1, 1, g=g8, deploy=self.deploy, name="query_conv")(x, train),
            train))
        k = jax.nn.relu6(bn_qk(
            ConvBnAct(c8, 1, 1, g=g8, deploy=self.deploy, name="key_conv")(x, train),
            train))
        v = jax.nn.relu6(bn_v(
            ConvBnAct(self.c1, 1, 1, g=self.c1, deploy=self.deploy,
                      name="value_conv")(x, train),
            train))

        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        if _use_fused_attention(x.shape[1], x.shape[2]) and not train:
            from rep_yolo_tpu.ops.pallas import axial_attention as _ax
            if _ax.fits(x.shape[1], x.shape[2], self.c1):
                return _ax.vertical_fused(q, k, v, x, gamma)

        hi = CONV_PRECISION
        # same (B,W,H,C)-layout trick as CrissCrossAttention
        qT = jnp.transpose(q, (0, 2, 1, 3))
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))
        energy_h = jnp.einsum("bwhc,bwgc->bwhg", qT, kT, precision=hi)
        out_h = jnp.transpose(
            jnp.einsum("bwgc,bwhg->bwhc", vT, energy_h, precision=hi),
            (0, 2, 1, 3))
        return gamma * out_h + x


class Bottleneck(nn.Module):
    """Darknet bottleneck (reference models/common.py:216-226)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        y = ConvBnAct(self.c2, 3, 1, g=self.g, deploy=self.deploy, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs and *two* sequential bottleneck stacks
    m, m1 (reference models/common.py:2633-2655 — this fork's C3 runs
    cv3(cat(m1(m(cv1(x))), cv2(x)))).
    """

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        h = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        h = self.inner(c_, h, train)
        y = ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, deploy=self.deploy, name="cv3")(
            jnp.concatenate([h, y], axis=-1), train)

    def inner(self, c_: int, h: jax.Array, train: bool) -> jax.Array:
        for i in range(self.n):
            h = Bottleneck(c_, self.shortcut, self.g, 1.0, self.deploy,
                           name=f"m_{i}")(h, train)
        for i in range(self.n):
            h = Bottleneck(c_, self.shortcut, self.g, 1.0, self.deploy,
                           name=f"m1_{i}")(h, train)
        return h


class CCVA(C3):
    """C3 whose inner stacks are CrissCrossAttention + VerticalAttention
    (reference models/common.py:3781-3786).
    """

    def inner(self, c_: int, h: jax.Array, train: bool) -> jax.Array:
        h = CrissCrossAttention(c_, self.deploy, name="m")(h, train)
        return VerticalAttention(c_, self.deploy, name="m1")(h, train)


class GhostConv(nn.Module):
    """Ghost conv (reference models/common.py:159-169)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str | None = "silu"
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.c2 // 2
        y = ConvBnAct(c_, self.k, self.s, None, self.g, self.act,
                      self.deploy, name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, None, c_, self.act, self.deploy, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class DownC(nn.Module):
    """Strided conv + pooled conv concat downsampler (reference models/common.py:188-199)."""

    c2: int
    n: int = 1
    k: int = 2
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        a = ConvBnAct(c1, 1, 1, deploy=self.deploy, name="cv1")(x, train)
        a = ConvBnAct(self.c2 // 2, 3, self.k, deploy=self.deploy, name="cv2")(a, train)
        b = ConvBnAct(self.c2 // 2, 1, 1, deploy=self.deploy, name="cv3")(
            max_pool(x, self.k, self.k), train)
        return jnp.concatenate([a, b], axis=-1)


class Stem(nn.Module):
    """Stem (reference models/common.py:172-185)."""

    c2: int
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 / 2)
        x = ConvBnAct(c_, 3, 2, deploy=self.deploy, name="cv1")(x, train)
        a = ConvBnAct(c_, 3, 2, deploy=self.deploy, name="cv3")(
            ConvBnAct(c_, 1, 1, deploy=self.deploy, name="cv2")(x, train), train)
        b = max_pool(x, 2, 2)
        return ConvBnAct(self.c2, 1, 1, deploy=self.deploy, name="cv4")(
            jnp.concatenate([a, b], axis=-1), train)


class BiFPNConcat(nn.Module):
    """Learned-weight normalized concat (reference models/common.py:3870-3897)."""

    n_in: int = 2

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False) -> jax.Array:
        w = self.param("w", nn.initializers.ones, (self.n_in,))
        w = w / (jnp.sum(w) + 1e-4)
        return jnp.concatenate([w[i] * xs[i] for i in range(self.n_in)], axis=-1)
