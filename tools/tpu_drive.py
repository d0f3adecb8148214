"""Manual end-to-end drive of the fused detect flow on the real TPU.
Init/fuse on CPU (fast trace), transfer fused params to TPU, jit the
forward+NMS there. Usage: python tools/tpu_drive.py [size] [batch]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

t_start = time.time()


def log(msg):
    print(f"[{time.time()-t_start:6.0f}s] {msg}", flush=True)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.ops.nms import non_max_suppression, detections_to_numpy

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    log(f"devices: tpu={tpu}, cpu={cpu}")

    m = RepYOLO.from_config("cfg/rep_yolo.yaml")
    log("config parsed, strides derived")
    with jax.default_device(cpu):
        v = m.init(jax.random.PRNGKey(0), img_size=min(size, 256))
        log("init done (cpu)")
        deploy, fused = m.fuse(v)
        fused = jax.tree.map(lambda x: x, fused)  # materialize
        jax.block_until_ready(fused)
        log("fused (cpu)")

    fused = jax.device_put(fused, tpu)
    jax.block_until_ready(fused)
    log("params on tpu")

    @jax.jit
    def detect(variables, x):
        pred = deploy.predict(variables, x)
        return non_max_suppression(pred, 0.25, 0.45, max_nms=512)

    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3)), tpu)
    log("input on tpu; compiling...")
    det = jax.block_until_ready(detect(fused, x))
    log("first detect done")
    outs = detections_to_numpy(det)
    log(f"per-image detections: {[o.shape for o in outs]}")
    t0 = time.time()
    for _ in range(10):
        det = detect(fused, x)
    jax.block_until_ready(det)
    dt = (time.time() - t0) / 10
    log(f"steady-state: {dt*1000:.1f} ms / {batch}-image batch @{size}px "
        f"= {batch/dt:.0f} img/s")
    row = outs[0][0] if len(outs[0]) else "none above conf"
    log(f"sample det row: {row}")


if __name__ == "__main__":
    main()
