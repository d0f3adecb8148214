"""Post-training int8 quantization for the deploy path.

The v5e MXU runs int8 at ~2x bf16 peak, and int8 also halves the HBM
traffic that bounds this model's thin pointwise convs. This module gives
the framework a TensorRT-style PTQ flow (the reference deploys through
TRT engines, deploy/triton-inference-server/README.md:13-24, where int8
calibration is the standard optimization):

    deploy, fused = model.fuse(variables)          # reparam first
    scales = calibrate(deploy, fused, [batch, ...])  # per-conv act absmax
    enable(scales)                                 # opt-in, process-global
    y = deploy.predict(fused, x)                   # selected convs run int8

Scheme: symmetric int8, per-output-channel weight scales (computed
in-graph from the fused f32/bf16 weights — XLA folds them), per-tensor
activation scales from calibration absmax. Accumulation in int32 via
`preferred_element_type`; dequant + bias + activation stay in bf16.

Selection: not every conv wins. Measured on v5e at batch 128 (640px
shapes, see BASELINE.md): int8 is 1.5-2.9x on 3x3 convs with cin>=48
and on thin 1x1s (the bf16 48-lane-underfill ceiling does not bind
int8), roughly neutral at cin<=24 and on 1x1 512->256, and *slower*
for 3x3 256->256 @40 (bf16 hits 235 TF/s there). `default_select`
encodes that table; pass a custom predicate to `enable` to override.
Grouped/depthwise convs and the detect-head 1x1s (plain nn.Conv, never
routed here) always stay bf16.

Calibration runs under `nn.intercept_methods` inside a single jit trace:
the interceptor returns each ConvUnit input's absmax as a graph output,
so one compiled forward yields every scale (no eager per-op dispatch).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# process-global registry: ConvUnit scope path -> activation scale (f32).
_SCALES: dict[str, float] = {}
_ENABLED = False


def default_select(k: int, cin: int, cout: int) -> bool:
    """Empirical v5e win table (BASELINE.md int8 probes): thin 1x1s win
    2.2-2.3x; wide 1x1s (cin>=512) measured roughly neutral and are
    excluded; 3x3s win except 256->256 (bf16 already at 235 TF/s)."""
    if k == 1:
        return 48 <= cin < 512 and cout <= 256
    return cin >= 48 and not (cin == 256 and cout == 256)


def enable(scales: dict[str, float],
           select: Callable[[int, int, int], bool] | None = None) -> None:
    """Turn on int8 for calibrated convs passing `select`.

    Applies at *trace* time: ConvUnit consults the registry when the
    forward is traced, and jit caches are not keyed on it — call before
    the first traced forward of the function you care about (same
    contract as set_conv_precision). Toggling after a function has been
    jitted has no effect on that function's cached executable; re-jit
    (or call `.clear_cache()` on the jitted fn) to pick up the change.
    """
    global _SCALES, _ENABLED
    _SCALES = {p: float(s) for p, s in scales.items()}
    _SELECT[0] = select or default_select
    _ENABLED = True


def disable() -> None:
    """Trace-time toggle — same caching caveat as `enable`."""
    global _ENABLED
    _ENABLED = False


_SELECT: list[Callable[[int, int, int], bool]] = [default_select]


def scale_for(path: str, k: int, cin: int, cout: int,
              groups: int) -> float | None:
    """Activation scale if `path` should run int8, else None."""
    if not _ENABLED or groups != 1:
        return None
    s = _SCALES.get(path)
    if s is None or s <= 0.0 or not _SELECT[0](k, cin, cout):
        return None
    return s


def quant_conv(x: jax.Array, w: jax.Array, s_in: float,
               stride: int, pad: int) -> jax.Array:
    """Symmetric int8 conv: per-tensor act scale, per-channel weight
    scales, int32 accumulation, bf16/f32 dequant. Bias/act are applied
    by the caller (they stay in the float domain)."""
    w = w.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_in)),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_w * s_in)).astype(x.dtype)


def calibrate(model, variables: dict, batches: list[jax.Array],
              margin: float = 1.0) -> dict[str, float]:
    """Per-ConvUnit input absmax over `batches` through the deploy model.

    Returns {scope_path: absmax * margin / 127}. One jit trace per batch
    shape; the interceptor exports each conv input's absmax as a graph
    output, so calibration is a single compiled forward per batch.
    """
    from flax import linen as nn

    from rep_yolo_tpu.nn.blocks import ConvUnit

    paths: list[str] = []

    def run(v, x):
        vals: list[jax.Array] = []

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            # ConvUnit covers every block conv; nn.Conv covers the
            # detect-head 1x1s (models/heads._head_conv) — their input
            # scale is what the flat-region RepConv emits at
            if isinstance(m, (ConvUnit, nn.Conv)) \
                    and context.method_name == "__call__" \
                    and m.scope is not None:
                paths.append("/".join(m.scope.path))
                vals.append(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(v, x, train=False)
        return vals

    run_j = jax.jit(run)
    maxes: dict[str, float] = {}
    for x in batches:
        vals = jax.device_get(run_j(variables, x))
        # jit caching: the interceptor only runs on (re)trace, so `paths`
        # grows once per distinct batch shape — always use the first trace's
        # ordering (identical across traces of the same model).
        order = paths[:len(vals)]
        for p, a in zip(order, vals):
            maxes[p] = max(maxes.get(p, 0.0), float(a))
    return {p: a * margin / 127.0 for p, a in maxes.items() if a > 0.0}
