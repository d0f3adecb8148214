"""Benchmark: fused-deploy batched 640px inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "images/sec/chip @640px ... fused inference",
   "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the reference's best published inference number — YOLOv7 TensorRT
FP16 on RTX 3090 at batch 8 = ~588 img/s (reference
deploy/triton-inference-server/README.md:29-41; see BASELINE.md).

Hang-proofing (round-2 post-mortem): the axon TPU plugin can either
*raise* through any backend init (`jax.devices("cpu")` included, since
JAX_PLATFORMS is pinned to axon by sitecustomize) or *block forever*
inside make_c_api_client when the tunnel is wedged — BENCH_r02 was rc=1
with no JSON. So this file is split in two:

- the parent process (default) never imports jax. It probes the TPU in a
  short-timeout subprocess, runs the real benchmark in another bounded
  subprocess, and relays its JSON line. On ANY failure — probe timeout,
  crash, mid-run tunnel drop, missing output — it still prints one JSON
  line with an explicit "error" field and exits 0.
- the child (RY_BENCH_INNER=1) runs the actual measurement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_S = 588.0  # TRT-FP16 RTX 3090 @ batch 8 (BASELINE.md)
BATCH = 128   # throughput sweet spot on v5e: the model's thin-channel
              # stem is launch-latency-bound, so large batches amortize
              # (b32: ~434, b64: ~565, b128: ~840 img/s)
SIZE = 640
WARMUP = 3
ITERS = 10

PROBE_TIMEOUT_S = 150     # backend init is normally a few seconds
BENCH_TIMEOUT_S = 2100    # full run is ~5-10 min incl. compiles

METRIC = (f"images/sec/chip @640px b{BATCH} fused inference "
          f"(incl. NMS); b32 = north-star target config")


def _emit(value: float, vs: float, extra: dict | None = None) -> None:
    rec = {"metric": METRIC, "value": value, "unit": "img/s/chip",
           "vs_baseline": vs}
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    sys.stdout.flush()


def _emit_error(msg: str) -> None:
    _emit(0.0, 0.0, {"error": msg})


def _probe_backend() -> tuple[bool, str]:
    """Check the default JAX backend in a throwaway subprocess so a wedged
    tunnel hangs the child, not us. Returns (ok, platform-or-error)."""
    code = ("import jax; ds = jax.devices(); "
            "print('PLATFORM=' + ds[0].platform + ' N=' + str(len(ds)))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=PROBE_TIMEOUT_S,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return False, (f"backend probe hung >{PROBE_TIMEOUT_S}s "
                       "(TPU tunnel wedged: axon make_c_api_client blocks)")
    if p.returncode != 0:
        tail = (p.stderr or "").strip().splitlines()[-3:]
        return False, "backend probe failed: " + " | ".join(tail)
    out = (p.stdout or "").strip().splitlines()
    info = out[-1] if out else ""
    return True, info


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    ok, info = _probe_backend()
    if not ok:
        _emit_error(info)
        return
    if "PLATFORM=cpu" in info:
        _emit_error("no TPU backend (default platform is cpu); refusing a "
                    "640px b128 CPU run — " + info)
        return
    # the box pins JAX_PLATFORMS=axon, which makes the CPU backend
    # unregistered — but _inner needs it for fast init/fuse. "axon,cpu"
    # keeps the TPU as default AND registers cpu (verified on this box).
    env = dict(os.environ, RY_BENCH_INNER="1", JAX_PLATFORMS="axon,cpu")
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True,
                           timeout=BENCH_TIMEOUT_S, env=env, cwd=here)
    except subprocess.TimeoutExpired:
        _emit_error(f"benchmark subprocess exceeded {BENCH_TIMEOUT_S}s "
                    "(probable mid-run tunnel drop)")
        return
    for line in reversed((p.stdout or "").strip().splitlines()):
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(rec, dict) and "metric" in rec:
            print(line)
            sys.stdout.flush()
            return
    tail = (p.stderr or "").strip().splitlines()[-4:]
    _emit_error(f"benchmark subprocess rc={p.returncode} after "
                f"{time.time() - t0:.0f}s with no JSON; stderr: "
                + " | ".join(tail))


def _nullcontext():
    from contextlib import nullcontext
    return nullcontext()


def _inner() -> None:
    import jax
    import jax.numpy as jnp

    import rep_yolo_tpu.nn.blocks as blocks_lib
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.ops.nms import non_max_suppression

    # serving path: native one-pass bf16 MXU convs (tests pin HIGHEST for
    # f32 golden parity; the bf16 perf path doesn't need it)
    blocks_lib.set_conv_precision(jax.lax.Precision.DEFAULT)

    model = RepYOLO.from_config("cfg/rep_yolo.yaml")
    # init/fuse on CPU (tracing the init on the tunneled TPU is pathologically
    # slow), then push fused bf16 params to the TPU
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None  # cpu backend unregistered: init on the default backend
    with jax.default_device(cpu) if cpu is not None else _nullcontext():
        variables = model.init(jax.random.PRNGKey(0), img_size=256)
        deploy, fused = model.fuse(variables)
        # bf16 compute path: cast params and inputs (MXU-native)
        fused = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
            fused)
        jax.block_until_ready(fused)
    # multi-chip: replicate params, shard the batch on a data mesh so the
    # per-chip figure reflects actual sharded execution (single chip: no-op)
    from rep_yolo_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    mesh = make_mesh()
    fused = jax.device_put(fused, replicated(mesh))
    x_sharding = batch_sharding(mesh)

    def one(v, x):
        # serving decode: logit-level conf gate + top-k on raw objectness
        # (exact for nc==1), decode only the selected rows, NMS skips its
        # own full-set top_k (presorted contract). Measured b32 q8:
        # +1.59 ms over the bare fwd vs +2.11 for the exact full decode
        # (BASELINE.md round-4); identical detections.
        pred = deploy.predict_topk(v, x, k=1024, conf_thres=0.25)
        det = non_max_suppression(pred, 0.25, 0.45, presorted=True)
        return det

    n_chips = max(1, len(jax.devices()))
    if n_chips > 1:
        # per-shard execution so the Pallas NMS grid stays per-chip
        from functools import partial

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        one = partial(shard_map, mesh=mesh, in_specs=(P(), P("data")),
                      out_specs=P("data"), check_rep=False)(one)

    def make_infer_loop():
        # fresh jit per DER-fast-path mode: the mode is a trace-time
        # global, and jit caches are not keyed on it
        @jax.jit
        def infer_loop(v, x, n_iters):
            # All iterations inside ONE device program (fori_loop with a
            # *dynamic* bound, so every iteration count reuses one
            # executable) with a true data dependency between steps, so
            # neither a lazy runtime nor XLA simplification can elide
            # repeated executions.
            def body(_, carry):
                xc, acc = carry
                det = one(v, xc)
                s = det.scores.sum() + acc
                # single-element perturbation: keeps the iteration-to-
                # iteration data dependency (no memoization, no loop-
                # invariant hoisting) without a full-tensor add — the
                # old `xc + s*1e-24` broadcast-add cost 1.26 ms/iter at
                # b32 / ~5 ms at b128 (round-4 trace) and was billed to
                # the model in every number this harness ever reported
                xc = xc.at[0, 0, 0, 0].add((s * 1e-24).astype(xc.dtype))
                return (xc, s)

            _, acc = jax.lax.fori_loop(0, n_iters, body,
                                       (x, jnp.float32(0.0)))
            return acc
        return infer_loop

    import statistics

    def measure(per_chip_batch: int, infer_loop) -> float:
        batch = per_chip_batch * n_chips   # keep per-chip batch constant
        x = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(1),
                               (batch, SIZE, SIZE, 3), jnp.bfloat16),
            x_sharding)
        float(infer_loop(fused, x, 1))  # compile + one real iteration

        def timed(n):
            t0 = time.perf_counter()
            float(infer_loop(fused, x, n))  # D2H read forces execution
            return time.perf_counter() - t0

        # slope between N and 2N removes fixed dispatch/transfer
        # overhead; median of 3 repeats rejects tunnel jitter
        t_n = statistics.median(timed(ITERS) for _ in range(3))
        t_2n = statistics.median(timed(2 * ITERS) for _ in range(3))
        dt = max((t_2n - t_n) / ITERS, 1e-9)
        return batch / dt / n_chips

    # operating points: b128 (throughput sweet spot) and b32 (the
    # north-star target config, BASELINE.json). b128 runs XLA bf16 (the
    # int8 region loses there: measured again round 5 with the WHOLE
    # graph in-region — 705 img/s q8 vs 837-845 bf16; the flat kernels'
    # cost is batch-proportional while XLA's big-batch bf16 convs
    # amortize lane underfill — BASELINE.md round-5 tombstone); b32
    # additionally runs the calibrated int8-resident Pallas fast path,
    # which wins at small batch — the same engine-per-operating-point
    # split TRT serving does.
    loop_bf16 = make_infer_loop()
    img_s_b128 = measure(BATCH, loop_bf16)
    img_s_b32 = measure(32, loop_bf16)
    b32_mode = "bf16"
    try:
        from rep_yolo_tpu.ops import quant

        cal = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(2),
                               (2, SIZE, SIZE, 3), jnp.bfloat16),
            jax.devices()[0])
        scales = quant.calibrate(deploy, fused, [cal])
        blocks_lib.set_cmajor_deploy("q8", scales)
        # absorbed-projection fused axial attention: wins alongside the
        # q8 region at b32 (BASELINE.md round-4; it LOSES in the b128
        # all-XLA bf16 graph, so it is scoped to this mode)
        blocks_lib.set_fused_attention(True)
        # the dense-grouped rewrite LOSES in the q8 graph (+1.53 ms
        # b32, REAL; it WINS at b128 bf16, so it stays on there —
        # BASELINE.md round-5 A/B)
        blocks_lib.set_dense_grouped(0)
        img_s_b32_q8 = measure(32, make_infer_loop())
        if img_s_b32_q8 > img_s_b32:
            img_s_b32, b32_mode = img_s_b32_q8, "q8"
    except Exception as e:   # never lose the bf16 numbers to a q8 failure
        b32_mode = f"bf16 (q8 failed: {type(e).__name__})"
    finally:
        blocks_lib.set_cmajor_deploy(None)
        blocks_lib.set_fused_attention(False)
        blocks_lib.set_dense_grouped(64)
    _emit(round(img_s_b128, 1), round(img_s_b128 / BASELINE_IMG_S, 3),
          {"b32_img_s": round(img_s_b32, 1),
           "b32_vs_baseline": round(img_s_b32 / BASELINE_IMG_S, 3),
           "b32_mode": b32_mode})


if __name__ == "__main__":
    if os.environ.get("RY_BENCH_INNER") == "1":
        _inner()
    else:
        main()
