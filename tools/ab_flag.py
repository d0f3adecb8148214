"""Interleaved same-process A/B of a trace-time flag on the deploy model.

Protocol (the repo standard, BASELINE.md round-4): arm A (flag off),
arm B (flag on), and a negative control A' (an independently-jitted
copy of A — |A - A'| is the protocol noise floor; a real delta must
exceed ~3x it). Each round times every arm once in random-free fixed
order A, B, A'; the printed figure is the median over rounds of the
slope-method per-batch time.

Usage:
  python tools/ab_flag.py dense_grouped [batch] [--der-fast q8] [--fused-attn]
  python tools/ab_flag.py shuffle_fold  [batch] ...
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

import rep_yolo_tpu.nn.blocks as blocks_lib
from rep_yolo_tpu.ops.nms import non_max_suppression
from tools.slope_bench import ITERS, SIZE, build

FLAGS = {
    # name -> (set_off, set_on)
    "dense_grouped": (lambda: blocks_lib.set_dense_grouped(0),
                      lambda: blocks_lib.set_dense_grouped(64)),
    # A = 6D reshape+transpose s2d, B = ReOrg-style phase slices
    "stem_s2d": (lambda: blocks_lib.set_stem_s2d("6d"),
                 lambda: blocks_lib.set_stem_s2d("phase")),
    # A = VPU sliding-window dw5x5, B = block-diag dense MXU dw5x5
    "dw5_dense": (lambda: _nf().set_dw5_dense(False),
                  lambda: _nf().set_dw5_dense(True)),
}


def _nf():
    from rep_yolo_tpu.ops.pallas import neck_flat
    return neck_flat


def make_loop(deploy, fused, x, setter):
    """Jit a fresh serving loop traced under `setter` (trace-time flag)."""
    setter()

    def step(v, xc):
        pred = deploy.predict_topk(v, xc, conf_thres=0.25)
        det = non_max_suppression(pred, 0.25, 0.45, presorted=True)
        return det.scores.sum()

    @jax.jit
    def loop(v, x, n):
        def body(_, carry):
            xc, acc = carry
            s = step(v, xc) + acc
            xc = xc.at[0, 0, 0, 0].add((s * 1e-24).astype(xc.dtype))
            return (xc, s)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    float(loop(fused, x, 1))  # compile under the flag, then restore below
    return loop


def timed(loop, fused, x, n):
    t0 = time.perf_counter()
    float(loop(fused, x, n))
    return time.perf_counter() - t0


def main():
    import argparse

    ap = argparse.ArgumentParser("ab_flag")
    ap.add_argument("flag", choices=sorted(FLAGS) + ["deep_gate"])
    ap.add_argument("batch", nargs="?", type=int, default=32)
    ap.add_argument("--der-fast", default=None,
                    choices=["bf16", "q8", "xla_q8"])
    ap.add_argument("--der-max-c1", type=int, default=512)
    ap.add_argument("--fused-attn", action="store_true")
    ap.add_argument("--rounds", type=int, default=9)
    args = ap.parse_args()

    deploy, fused, x = build(args.batch)
    if args.fused_attn:
        blocks_lib.set_fused_attention(True)
    if args.der_fast:
        scales = None
        if args.der_fast in ("q8", "xla_q8"):
            from rep_yolo_tpu.ops import quant

            cal = jax.device_put(
                jax.random.uniform(jax.random.PRNGKey(2),
                                   (2, SIZE, SIZE, 3), jnp.bfloat16),
                jax.devices()[0])
            scales = quant.calibrate(deploy, fused, [cal])
        c1_max = args.der_max_c1
        blocks_lib.set_cmajor_deploy(args.der_fast, scales,
                                     select=lambda c1, h, w: c1 <= c1_max)
        if args.der_fast == "q8" and args.flag != "dense_grouped":
            # match bench.py's q8 serving mode (round-5 A/B)
            blocks_lib.set_dense_grouped(0)

    if args.flag == "deep_gate":
        # A = production gate (c1 <= 128), B = whole-backbone (l7 in)
        def set_off():
            blocks_lib.set_cmajor_deploy(
                args.der_fast, scales, select=lambda c1, h, w: c1 <= 128)

        def set_on():
            blocks_lib.set_cmajor_deploy(
                args.der_fast, scales, select=lambda c1, h, w: c1 <= 512)
    else:
        set_off, set_on = FLAGS[args.flag]
    orig_dense = blocks_lib.DENSE_GROUPED_MAX_C1
    orig_stem = blocks_lib.STEM_S2D_MODE
    orig_dw5 = _nf().DW5_DENSE
    try:
        loop_a = make_loop(deploy, fused, x, set_off)
        loop_b = make_loop(deploy, fused, x, set_on)
        loop_c = make_loop(deploy, fused, x, set_off)   # negative control
    finally:
        blocks_lib.set_dense_grouped(orig_dense)
        blocks_lib.set_stem_s2d(orig_stem)
        _nf().set_dw5_dense(orig_dw5)

    for lp in (loop_a, loop_b, loop_c):   # warm all three
        timed(lp, fused, x, ITERS)

    res = {"A(off)": [], "B(on)": [], "A'(ctrl)": []}
    for r in range(args.rounds):
        for name, lp in (("A(off)", loop_a), ("B(on)", loop_b),
                         ("A'(ctrl)", loop_c)):
            t_n = timed(lp, fused, x, ITERS)
            t_2n = timed(lp, fused, x, 2 * ITERS)
            res[name].append((t_2n - t_n) / ITERS * 1e3)

    med = {k: statistics.median(v) for k, v in res.items()}
    noise = abs(med["A(off)"] - med["A'(ctrl)"])
    delta = med["B(on)"] - med["A(off)"]
    for k in res:
        print(f"{k:10s} median {med[k]:8.3f} ms/batch  "
              f"(all: {' '.join(f'{t:.2f}' for t in res[k])})")
    verdict = ("WASH" if abs(delta) <= 3 * max(noise, 1e-6)
               else ("REAL WIN" if delta < 0 else "REAL LOSS"))
    print(f"delta(B-A) {delta:+.3f} ms, control noise {noise:.3f} ms "
          f"-> {verdict}")


if __name__ == "__main__":
    main()
