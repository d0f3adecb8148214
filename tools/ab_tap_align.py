"""Noise-proof A/B decision protocol for the conv3x3_flat_q8 `tap_align`
option (round-3 left it in measurement limbo: one run showed a 6x win,
the next a 5x loss with a failed negative control — tunnel-state drift
swamps one-shot slope measurements).

Protocol (VERDICT round-3 item 4):
- INTERLEAVED A/B: each round times A then B (order flipped every round,
  ABBA) so slow drift cancels instead of biasing one arm;
- median of >= 9 rounds per arm;
- NEGATIVE CONTROL: a second, independently-jitted copy of A is timed
  the same way — |A - A'| measures the protocol's noise floor; a real
  A-vs-B delta must exceed 3x that to count;
- run on both the stem-entry and l3-mid shapes (the kernels it targets).

Usage: python tools/ab_tap_align.py [batch] [rounds]
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

ITERS = 10


def make_loop(w, bias, s, H, W, tap_align: bool):
    @jax.jit
    def loop(x, n):
        def body(_, carry):
            xc, acc = carry
            y = conv3x3_flat_q8(xc, w, bias, s, H, W, out_scale=s,
                                tap_align=tap_align)
            a = y.sum(dtype=jnp.int32).astype(jnp.float32) + acc
            xc = (xc.astype(jnp.int32)
                  + (a * 1e-24).astype(jnp.int32)).astype(jnp.int8)
            return (xc, a)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc
    return loop


def timed(loop, x, n):
    t0 = time.perf_counter()
    float(loop(x, n))
    return time.perf_counter() - t0


def ab(shape_tag, C, O, H, W, B, rounds):
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    s = 1.0 / 64.0
    w = jax.device_put(jax.random.uniform(key, (3, 3, C, O)) - 0.5, dev)
    bias = jnp.zeros(O)
    x = jax.device_put(
        jax.random.randint(key, (B, C, H * W), -127, 127, jnp.int8), dev)

    a = make_loop(w, bias, s, H, W, False)
    b = make_loop(w, bias, s, H, W, True)
    # negative control: an independently-jitted copy of A (fresh cache
    # entry; identical program) — measures the protocol's noise floor
    a2 = make_loop(w + 0.0, bias, s, H, W, False)

    for lp in (a, b, a2):
        timed(lp, x, 1)          # compile + warm

    t = {"A": [], "B": [], "A2": []}
    arms = [("A", a), ("B", b), ("A2", a2)]
    for r in range(rounds):
        order = arms if r % 2 == 0 else arms[::-1]
        for name, lp in order:
            t[name].append(timed(lp, x, ITERS) / ITERS)

    ma = statistics.median(t["A"])
    mb = statistics.median(t["B"])
    ma2 = statistics.median(t["A2"])
    noise = abs(ma - ma2)
    delta = mb - ma
    verdict = "WASH (within noise)"
    if abs(delta) > 3 * max(noise, 1e-6):
        verdict = "tap_align WINS" if delta < 0 else "tap_align LOSES"
    print(f"{shape_tag:28s} A={ma * 1e3:7.3f}  B(tap)={mb * 1e3:7.3f}  "
          f"ctrl|A-A'|={noise * 1e3:6.3f} ms  -> {verdict}", flush=True)
    return delta, noise


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    ab("l1 st 3x3 48ch@320^2", 48, 48, 320, 320, B, rounds)
    ab("l3 mid 3x3 24ch@160^2", 24, 24, 160, 160, B, rounds)
    ab("stem s2d 16ch@320^2", 16, 48, 320, 320, B, rounds)


if __name__ == "__main__":
    main()
