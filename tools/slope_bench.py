"""Slope-method TPU benchmarks of the deploy model's pieces.

The tunneled TPU runtime memoizes identical dispatches, so naive
block_until_ready loops over-report throughput by >10x. Every timing here
runs N iterations inside ONE device program (`fori_loop`) with a real data
dependency between steps, and reports the (2N - N) slope — the same
methodology as bench.py.

Usage:
  python tools/slope_bench.py [batch] [--fused-attn] [--trace DIR]

With --trace, also captures a jax.profiler trace of the forward loop for
tools/trace_rollup.py.
"""

from __future__ import annotations

import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# this box pins JAX_PLATFORMS=axon (TPU), which leaves the CPU backend
# unregistered — but build() inits/fuses weights on CPU (eager init over
# the tunneled TPU is pathologically slow). Register both.
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax
import jax.numpy as jnp

import rep_yolo_tpu.nn.blocks as blocks_lib
from rep_yolo_tpu.models.model import RepYOLO
from rep_yolo_tpu.ops.nms import non_max_suppression

SIZE = 640
ITERS = 5


def build(batch: int):
    blocks_lib.set_conv_precision(jax.lax.Precision.DEFAULT)
    model = RepYOLO.from_config("cfg/rep_yolo.yaml")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), img_size=256)
        deploy, fused = model.fuse(variables)
        fused = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            fused)
    dev = jax.devices()[0]
    fused = jax.device_put(fused, dev)
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, SIZE, SIZE, 3),
                           jnp.bfloat16), dev)
    return deploy, fused, x


def slope(step_fn, fused, x, label: str, batch: int):
    @jax.jit
    def loop(v, x, n):
        def body(_, carry):
            xc, acc = carry
            s = step_fn(v, xc) + acc
            # data dependency that defeats both dispatch memoization and
            # loop-invariant hoisting WITHOUT touching the whole input:
            # a full-tensor `xc + s*1e-24` costs 1.26 ms/iter at b32
            # (78 MB bf16 broadcast-add, round-4 trace) and was billed
            # to every fwd number this tool ever printed
            xc = xc.at[0, 0, 0, 0].add((s * 1e-24).astype(xc.dtype))
            return (xc, s)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    float(loop(fused, x, 1))
    def timed(n):
        t0 = time.perf_counter()
        float(loop(fused, x, n))
        return time.perf_counter() - t0
    t_n = statistics.median(timed(ITERS) for _ in range(3))
    t_2n = statistics.median(timed(2 * ITERS) for _ in range(3))
    dt = (t_2n - t_n) / ITERS
    print(f"{label:32s} {dt * 1e3:8.2f} ms/batch -> {batch / dt:7.0f} img/s",
          flush=True)
    return loop


def main():
    import argparse

    p = argparse.ArgumentParser("slope_bench")
    p.add_argument("batch", nargs="?", type=int, default=128)
    p.add_argument("--fused-attn", action="store_true")
    p.add_argument("--fused-attn-small", action="store_true")
    p.add_argument("--der-fast", default=None,
                   choices=["bf16", "q8", "xla_q8"],
                   help="DER deploy fast path (blocks.set_cmajor_deploy); "
                        "q8 modes calibrate on one random batch first")
    p.add_argument("--der-max-c1", type=int, default=512,
                   help="channel-width gate for the DER fast path "
                        "(c1 <= this); 512 = whole backbone channel-major")
    p.add_argument("--head-pad", action="store_true",
                   help="pad the 1x1 head convs to a full 128-lane tile "
                        "(heads.set_head_pad; exact)")
    p.add_argument("--trace", default=None, metavar="DIR")
    opts = p.parse_args()
    batch = opts.batch
    if opts.head_pad:
        from rep_yolo_tpu.models import heads as heads_lib

        heads_lib.set_head_pad(True)
    if opts.der_fast:
        # surface the q8 region planner's per-layer decisions (one INFO
        # line per traced forward, models/network.py LAST_REGION_PLAN)
        import logging

        logging.basicConfig(level=logging.INFO)
    deploy, fused, x = build(batch)
    if opts.fused_attn:
        blocks_lib.set_fused_attention(True)
    if opts.fused_attn_small:
        blocks_lib.set_fused_attention(True, max_hw=40 * 40)
    if opts.der_fast:
        scales = None
        if opts.der_fast in ("q8", "xla_q8"):
            from rep_yolo_tpu.ops import quant

            xs = jax.device_put(
                jax.random.uniform(jax.random.PRNGKey(2),
                                   (2, SIZE, SIZE, 3), jnp.bfloat16),
                jax.devices()[0])
            scales = quant.calibrate(deploy, fused, [xs])
            print(f"calibrated {len(scales)} convs", flush=True)
        c1_max = opts.der_max_c1
        blocks_lib.set_cmajor_deploy(opts.der_fast, scales,
                                     select=lambda c1, h, w: c1 <= c1_max)
        if opts.der_fast == "q8":
            # match bench.py's q8 serving mode: the dense-grouped
            # rewrite measured a REAL +1.53 ms loss in the q8 graph
            # (BASELINE.md round-5 A/B; it stays on for bf16 modes)
            blocks_lib.set_dense_grouped(0)
            print("dense-grouped rewrite off (q8 mode)", flush=True)

    def fwd(v, xc):
        out = deploy.apply(v, xc, train=False)
        return sum(l.sum().astype(jnp.float32) for l in jax.tree.leaves(out))

    def pred_nms(v, xc):
        pred = deploy.predict(v, xc)
        det = non_max_suppression(pred.astype(jnp.float32), 0.25, 0.45,
                                  max_nms=1024)
        return det.scores.sum()

    def pred_nms_topk(v, xc):
        # serving path: rank raw obj logits, decode only the top-k
        # (exact for nc==1 — heads.decode_topk)
        pred = deploy.predict_topk(v, xc)
        det = non_max_suppression(pred, 0.25, 0.45, max_nms=1024)
        return det.scores.sum()

    def pred_nms_presorted(v, xc):
        # serving fast path: logit-level conf gate + obj ranking upstream,
        # NMS skips its own full-set top_k (presorted contract)
        pred = deploy.predict_topk(v, xc, conf_thres=0.25)
        det = non_max_suppression(pred, 0.25, 0.45, presorted=True)
        return det.scores.sum()

    def pred_nms_approx(v, xc):
        pred = deploy.predict_topk(v, xc, conf_thres=0.25, approx=True)
        det = non_max_suppression(pred, 0.25, 0.45, presorted=True)
        return det.scores.sum()

    loop = slope(fwd, fused, x, "fwd raw maps", batch)
    slope(pred_nms, fused, x, "predict + NMS", batch)
    slope(pred_nms_topk, fused, x, "predict(topk) + NMS", batch)
    slope(pred_nms_presorted, fused, x, "predict(topk,gate) + presorted NMS", batch)
    slope(pred_nms_approx, fused, x, "predict(approx,gate) + presorted NMS", batch)

    if opts.trace:
        with jax.profiler.trace(opts.trace):
            float(loop(fused, x, 3))
        print(f"trace written under {opts.trace} (3 fwd iterations)")


if __name__ == "__main__":
    main()
