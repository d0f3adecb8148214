"""Benchmark: fused-deploy batched 640px inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "images/sec/chip @640px b32 fused inference",
   "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the reference's best published inference number — YOLOv7 TensorRT
FP16 on RTX 3090 at batch 8 = ~588 img/s (reference
deploy/triton-inference-server/README.md:29-41; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 588.0  # TRT-FP16 RTX 3090 (BASELINE.md)
BATCH = 32
SIZE = 640
WARMUP = 3
ITERS = 10


def main():
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.ops.nms import non_max_suppression

    model = RepYOLO.from_config("cfg/rep_yolo.yaml")
    # init/fuse on CPU (tracing the init on the tunneled TPU is pathologically
    # slow), then push fused bf16 params to the TPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), img_size=256)
        deploy, fused = model.fuse(variables)
        # bf16 compute path: cast params and inputs (MXU-native)
        fused = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
            fused)
        jax.block_until_ready(fused)
    fused = jax.device_put(fused, jax.devices()[0])

    def one(v, x):
        pred = deploy.predict(v, x)
        det = non_max_suppression(pred.astype(jnp.float32), 0.25, 0.45,
                                  max_nms=1024)
        return det

    def infer_loop(v, x, n_iters):
        # All iterations inside ONE device program (lax.scan) with a real
        # runtime data dependency between steps, so neither a lazy runtime
        # nor XLA simplification can elide repeated executions.
        def body(carry, _):
            xc, acc = carry
            det = one(v, xc)
            s = det.scores.sum() + acc
            xc = xc + (s * 1e-24).astype(xc.dtype)  # true dependency, ~0
            return (xc, s), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None,
                                   length=n_iters)
        return acc

    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    jax.block_until_ready(jax.jit(one)(fused, x))       # compile single step
    infer_iters = jax.jit(infer_loop, static_argnums=2)
    jax.block_until_ready(infer_iters(fused, x, 2))     # compile loop

    t0 = time.perf_counter()
    jax.block_until_ready(infer_iters(fused, x, ITERS))
    t_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(infer_iters(fused, x, 2 * ITERS))
    t_2n = time.perf_counter() - t0
    # slope between N and 2N iters removes fixed dispatch/transfer overhead
    dt = (t_2n - t_n) / ITERS

    n_chips = max(1, len(jax.devices()))
    img_s_chip = BATCH / dt / n_chips
    print(json.dumps({
        "metric": "images/sec/chip @640px b32 fused inference (incl. NMS)",
        "value": round(img_s_chip, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_chip / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
