"""Per-shape TPU bench: XLA bf16 conv vs channel-major Pallas kernels
(bf16 + int8), at the deploy graph's actual conv shapes.

Slope method (2N-N in-loop iterations, data dependency between steps) —
the tunneled runtime memoizes identical dispatches, see slope_bench.py.

Variants per shape:
  xla      — NHWC conv_general_dilated + bias + silu (the current path)
  cm       — conv{3x3,1x1}_cmajor bf16, channel-major in/out (chained cost)
  q8       — conv{3x3,1x1}_cmajor_q8, bf16 in/out (quant in-kernel)
  q8c      — q8 with int8 input + int8 output (int8-resident chain cost)
  cm+T     — cm with NHWC->NCHW->kernel->NHWC transposes (boundary cost)

Usage: python tools/kernel_bench.py [batch] [--csv]
"""

from __future__ import annotations

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rep_yolo_tpu.ops.pallas.conv_kernel import (
    conv1x1_cmajor, conv1x1_cmajor_q8, conv3x3_cmajor, conv3x3_cmajor_q8,
    pick_row_tile)

ITERS = 5

# (k, C, O, H) — deploy-graph conv shapes at 640px input (W == H).
SHAPES = [
    (3, 48, 48, 320),     # l1 DER full-width stages (x3)
    (1, 48, 24, 320),     # l1 half-width compress
    (3, 24, 24, 320),     # l1 half-width stage
    (1, 24, 48, 320),     # l1 half-width expand
    (1, 144, 48, 320),    # l1 cv1
    (3, 48, 48, 160),     # l3 stages
    (1, 144, 128, 160),   # l3 cv1
    (3, 128, 128, 80),    # l5 stages
    (1, 128, 64, 80),     # l5 compress
    (1, 384, 256, 80),    # l5 cv1
    (3, 256, 256, 40),    # l7 stages
    (1, 768, 512, 40),    # l7 cv1
    (3, 128, 256, 80),    # RepConv head /8
    (3, 256, 512, 40),    # RepConv head /16
    (3, 512, 1024, 20),   # RepConv head /32
]


def slope(fn, *args):
    @jax.jit
    def loop(x, n, *rest):
        def body(_, carry):
            xc, acc = carry
            y = fn(xc, *rest)
            s = y.astype(jnp.float32).sum()
            xc = xc + (s * 1e-24).astype(xc.dtype)
            return (xc, acc + s)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    x, *rest = args
    float(loop(x, 1, *rest))

    def timed(n):
        t0 = time.perf_counter()
        float(loop(x, n, *rest))
        return time.perf_counter() - t0

    t_n = statistics.median(timed(ITERS) for _ in range(3))
    t_2n = statistics.median(timed(2 * ITERS) for _ in range(3))
    return (t_2n - t_n) / ITERS


def main():
    p = argparse.ArgumentParser("kernel_bench")
    p.add_argument("batch", nargs="?", type=int, default=32)
    p.add_argument("--csv", action="store_true")
    opts = p.parse_args()
    B = opts.batch
    dev = jax.devices()[0]
    print(f"# device {dev}, batch {B}", flush=True)
    hdr = f"{'shape':26s} {'xla':>8s} {'cm':>8s} {'q8':>8s} {'q8c':>8s} {'cm+T':>8s}   TF/s(q8)"
    print(hdr, flush=True)

    for (k, C, O, H) in SHAPES:
        W = H
        key = jax.random.PRNGKey(0)
        x_nhwc = jax.device_put(
            jax.random.uniform(key, (B, H, W, C), jnp.bfloat16) - 0.5, dev)
        x_cm = jax.device_put(jnp.transpose(x_nhwc, (0, 3, 1, 2)), dev)
        w = jax.device_put(
            (jax.random.uniform(jax.random.PRNGKey(1), (k, k, C, O),
                                jnp.bfloat16) - 0.5) * 0.1, dev)
        bias = jax.device_put(jnp.zeros(O, jnp.bfloat16), dev)
        s_in = 0.5 / 127.0
        x_q8 = jax.device_put(
            jnp.clip(jnp.round(x_cm.astype(jnp.float32) / s_in), -127, 127
                     ).astype(jnp.int8), dev)
        pad = k // 2
        rt = pick_row_tile(H, W)

        def xla(x, w=w, bias=bias):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.DEFAULT) + bias
            return jax.nn.silu(y)

        conv_cm = conv3x3_cmajor if k == 3 else conv1x1_cmajor
        conv_q8 = conv3x3_cmajor_q8 if k == 3 else conv1x1_cmajor_q8

        def cm(x, w=w, bias=bias):
            return conv_cm(x, w, bias, act="silu", row_tile=rt)

        def q8(x, w=w, bias=bias):
            return conv_q8(x, w, bias, s_in, act="silu", row_tile=rt)

        def q8c(x, w=w, bias=bias):
            return conv_q8(x, w, bias, s_in, act="silu",
                           out_scale=s_in, row_tile=rt)

        def cm_T(x, w=w, bias=bias):
            xc = jnp.transpose(x, (0, 3, 1, 2))
            y = conv_cm(xc, w, bias, act="silu", row_tile=rt)
            return jnp.transpose(y, (0, 2, 3, 1))

        times = {}
        for name, fn, arg in (("xla", xla, x_nhwc), ("cm", cm, x_cm),
                              ("q8", q8, x_cm), ("q8c", q8c, x_q8),
                              ("cmT", cm_T, x_nhwc)):
            try:
                times[name] = slope(fn, arg)
            except Exception as e:
                times[name] = float("nan")   # e.g. VMEM overflow at TH==H

        flops = 2 * B * H * W * C * O * k * k
        tf = flops / times["q8"] / 1e12
        label = f"{k}x{k} {C:4d}->{O:4d} @{H}"
        if opts.csv:
            print(f"{label},{times['xla']*1e3:.3f},{times['cm']*1e3:.3f},"
                  f"{times['q8']*1e3:.3f},{times['q8c']*1e3:.3f},"
                  f"{times['cmT']*1e3:.3f}", flush=True)
        else:
            print(f"{label:26s} {times['xla']*1e3:8.3f} {times['cm']*1e3:8.3f}"
                  f" {times['q8']*1e3:8.3f} {times['q8c']*1e3:8.3f}"
                  f" {times['cmT']*1e3:8.3f}   {tf:6.1f}", flush=True)


if __name__ == "__main__":
    main()
