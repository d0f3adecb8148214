"""A/B the stem entry glue: NHWC bf16 image -> flat int8 s2d (B, 16,
102400) feeding conv3x3_flat_q8 (the l0 fast path, nn/blocks.py
_stem_fast_q8).

The round-5 b32 trace bills the current chain 1.7 ms of XLA glue
(quantize 0.92 ms in a batch-minor padded layout + s2d copy 0.53 +
reshape 0.21) against a ~0.2 ms HBM floor. Each variant below feeds the
REAL stem kernel (same consumer => same layout pressure) inside a
slope-timed fori_loop.

Usage: python tools/stem_glue_bench.py [batch]
"""

from __future__ import annotations

import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax
import jax.numpy as jnp

from rep_yolo_tpu.ops.pallas.conv_flat import conv3x3_flat_q8

S = 640
C, O = 3, 48
S_IN = 1.0 / 127.0


def _q(x):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / S_IN)),
                    -127, 127).astype(jnp.int8)


def _kernel_feed(xs, w3, bias):
    H2 = S // 2
    return conv3x3_flat_q8(xs, w3, bias, S_IN, H2, H2, act="silu",
                           out_scale=0.05)


def chain_current(x, w3, bias):
    """Today's chain: quantize NHWC -> barrier -> 6D transpose s2d ->
    pad 12 -> 16 channels."""
    b = x.shape[0]
    H2 = S // 2
    xq = jax.lax.optimization_barrier(_q(x))
    xs = xq.reshape(b, H2, 2, H2, 2, C)
    xs = jnp.transpose(xs, (0, 2, 4, 5, 1, 3)).reshape(b, 4 * C, H2 * H2)
    xs = jnp.pad(xs, ((0, 0), (0, 4), (0, 0)))
    return _kernel_feed(xs, w3, bias)


def chain_flatq(x, w3, bias):
    """Quantize on the (B, H*W*C) 1D view (dodges the batch-minor padded
    layout XLA picked for the NHWC quantize), then the same s2d."""
    b = x.shape[0]
    H2 = S // 2
    xq = _q(x.reshape(b, S * S * C))
    xq = jax.lax.optimization_barrier(xq).reshape(b, S, S, C)
    xs = xq.reshape(b, H2, 2, H2, 2, C)
    xs = jnp.transpose(xs, (0, 2, 4, 5, 1, 3)).reshape(b, 4 * C, H2 * H2)
    xs = jnp.pad(xs, ((0, 0), (0, 4), (0, 0)))
    return _kernel_feed(xs, w3, bias)


def chain_reorg(x, w3, bias):
    """ReOrg-style: quantize, then 4 strided phase slices + stack on a
    new channel-group dim, transpose phases+C to the front."""
    b = x.shape[0]
    H2 = S // 2
    xq = jax.lax.optimization_barrier(_q(x))
    phases = [xq[:, ph::2, qw::2, :] for ph in (0, 1) for qw in (0, 1)]
    xs = jnp.stack(phases, axis=1)                  # (B, 4, H2, W2, C)
    xs = jnp.transpose(xs, (0, 1, 4, 2, 3)).reshape(b, 4 * C, H2 * H2)
    xs = jnp.pad(xs, ((0, 0), (0, 4), (0, 0)))
    return _kernel_feed(xs, w3, bias)


def slope(fn, x, w3, bias, label, iters=5):
    @jax.jit
    def loop(x, n):
        def body(_, carry):
            xc, acc = carry
            s = fn(xc, w3, bias).astype(jnp.float32).sum() + acc
            xc = xc.at[0, 0, 0, 0].add((s * 1e-24).astype(xc.dtype))
            return (xc, s)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    float(loop(x, 1))

    def timed(n):
        t0 = time.perf_counter()
        float(loop(x, n))
        return time.perf_counter() - t0

    t_n = statistics.median(timed(iters) for _ in range(3))
    t_2n = statistics.median(timed(2 * iters) for _ in range(3))
    dt = (t_2n - t_n) / iters
    print(f"{label:24s} {dt * 1e3:7.3f} ms/batch", flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dev = jax.devices()[0]
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (batch, S, S, C),
                           jnp.bfloat16), dev)
    w3 = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, O),
                          jnp.float32) * 0.05, dev)
    bias = jax.device_put(jnp.zeros((O,), jnp.float32), dev)
    for fn, label in ((chain_current, "current (NHWC quantize)"),
                      (chain_flatq, "1D-view quantize"),
                      (chain_reorg, "ReOrg phase slices")):
        slope(fn, x, w3, bias, label)


if __name__ == "__main__":
    main()
