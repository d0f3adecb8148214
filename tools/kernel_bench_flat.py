"""Micro-bench: v1 channel-major kernels (+ their XLA pad/reshape glue)
vs v2 flat kernels at the DER l1/l3 shapes, slope method on the real TPU.

Usage: python tools/kernel_bench_flat.py [batch]
"""

from __future__ import annotations

import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# register the CPU backend alongside the pinned axon TPU
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax
import jax.numpy as jnp

from rep_yolo_tpu.ops.pallas.conv_kernel import (
    conv1x1_cmajor_q8, conv3x3_cmajor_q8)
from rep_yolo_tpu.ops.pallas.conv_flat import (
    conv1x1_flat_q8, conv3x3_flat_q8, max_pool_cm)

ITERS = 10


def slope(step_fn, x, label: str):
    @jax.jit
    def loop(x, n):
        def body(_, carry):
            xc, acc = carry
            s = step_fn(xc) + acc
            # single-element data dependency (see bench.py)
            xc = xc.at[(0,) * xc.ndim].add((s * 1e-24).astype(xc.dtype))
            return (xc, s)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    float(loop(x, 1))

    def timed(n):
        t0 = time.perf_counter()
        float(loop(x, n))
        return time.perf_counter() - t0

    t_n = statistics.median(timed(ITERS) for _ in range(3))
    t_2n = statistics.median(timed(2 * ITERS) for _ in range(3))
    dt = (t_2n - t_n) / ITERS
    print(f"{label:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    s = 1.0 / 64.0

    for C, O, H, W, tag in [(48, 48, 320, 320, "l1 st 3x3 48ch@320^2"),
                            (24, 24, 320, 320, "l1 st 3x3 24ch@320^2"),
                            (48, 48, 160, 160, "l3 st 3x3 48ch@160^2"),
                            (24, 24, 160, 160, "l3 mid 3x3 24ch@160^2"),
                            (16, 48, 320, 320, "stem s2d 16ch@320^2")]:
        w = jax.device_put(
            jax.random.uniform(key, (3, 3, C, O)) - 0.5, dev)
        bias = jnp.zeros(O)
        xq = jax.device_put(
            jax.random.randint(key, (B, C, H, W), -127, 127, jnp.int8), dev)
        # v1: int8 in -> int8 out, incl. the XLA pad+reshape glue
        slope(lambda xc: conv3x3_cmajor_q8(
            xc, w, bias, s, out_scale=s).astype(jnp.int8).sum(
                dtype=jnp.int32).astype(jnp.float32),
            xq, f"v1 cm q8 {tag} (chained)")
        xf = xq.reshape(B, C, H * W)
        slope(lambda xc: conv3x3_flat_q8(
            xc, w, bias, s, H, W, out_scale=s).sum(
                dtype=jnp.int32).astype(jnp.float32),
            xf, f"v2 flat q8 {tag} (chained)")
        for rt in (32,):
            if H % rt == 0 and (rt * W) % 128 == 0:
                slope(lambda xc, rt=rt: conv3x3_flat_q8(
                    xc, w, bias, s, H, W, out_scale=s, row_tile=rt).sum(
                        dtype=jnp.int32).astype(jnp.float32),
                    xf, f"v2 flat q8 {tag} rt={rt}")

    # 1x1 concat->cv1: v1 = concat + kernel; v2 = 3-ref kernel. The three
    # sections travel as ONE stacked loop-carried array so they don't get
    # baked into the program as 157 MB constants.
    C, O, H, W = 48, 48, 320, 320
    wc = jax.random.uniform(key, (1, 1, 3 * C, O)) - 0.5
    bias = jnp.zeros(O)
    x3 = jax.device_put(
        jax.random.randint(key, (3, B, C, H, W), -127, 127, jnp.int8), dev)

    def v1_cv1(xc):
        cat = jnp.concatenate([xc[0], xc[1], xc[2]], axis=1)
        return conv1x1_cmajor_q8(cat, wc, bias, s).astype(
            jnp.float32).sum()

    slope(v1_cv1, x3, "v1 concat + conv1x1 q8 144->48@320^2")
    x3f = x3.reshape(3, B, C, H * W)

    def v2_cv1(xc):
        return conv1x1_flat_q8([xc[0], xc[1], xc[2]], wc, bias, s).astype(
            jnp.float32).sum()

    slope(v2_cv1, x3f, "v2 3-ref conv1x1 q8 144->48@320^2")

    # MP: NHWC reduce_window vs cm reshape-max
    xn = jax.device_put(
        jax.random.uniform(key, (B, 320, 320, 48), jnp.bfloat16), dev)
    slope(lambda xc: jax.lax.reduce_window(
        xc, jnp.bfloat16(-jnp.inf), jax.lax.max, (1, 2, 2, 1),
        (1, 2, 2, 1), "VALID").astype(jnp.float32).sum(),
        xn, "MP NHWC reduce_window 48ch@320^2")
    xc4 = jax.device_put(
        jax.random.uniform(key, (B, 48, 320, 320), jnp.bfloat16), dev)
    slope(lambda xc: max_pool_cm(xc).astype(jnp.float32).sum(),
          xc4, "MP cm reshape-max 48ch@320^2")


if __name__ == "__main__":
    main()
