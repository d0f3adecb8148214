"""Model-serving HTTP server — TPU-native replacement for the reference's
Triton deployment (reference deploy/triton-inference-server/: TRT engine +
gRPC client). Here the "engine" is the jit-compiled fused forward + Pallas
NMS on the TPU; dynamic batching is a size-bucketed padding scheme (pad the
request batch up to the compiled batch shape, mask the tail), so every
request reuses one cached executable exactly like a TRT engine with a
dynamic-batch profile.

Protocol (stdlib-only, JSON/binary hybrid):
  POST /v1/infer  body: raw float32 NHWC tensor; headers:
      X-Shape: "B,H,W,3" (H=W=the served size)
  -> JSON {detections: [[x1,y1,x2,y2,conf,cls], ...] per image, ms: float}
  GET /v1/health -> {"status": "ok", "device": ...}

Run:  python deploy/server.py --cfg cfg/rep_yolo.yaml --img-size 640 \
          --max-batch 8 [--ckpt weights]
"""

from __future__ import annotations

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

STATE = {}


def build_engine(cfg: str, ckpt: str | None, img_size: int, max_batch: int,
                 conf: float, iou: float):
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.ops.nms import non_max_suppression

    model = RepYOLO.from_config(cfg)
    # init/fuse on CPU (eager dispatch to a tunneled device is slow),
    # then ship the fused params to the serving device
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), img_size=256)
        if ckpt:
            from rep_yolo_tpu.train.checkpoint import load_checkpoint

            variables = load_checkpoint(ckpt, variables)
        deploy, fused = model.fuse(variables)
    fused = jax.device_put(fused, jax.devices()[0])

    @jax.jit
    def infer(v, x):
        if model.cfg.nc == 1:
            # serving fast path (exact for nc==1): logit-level conf gate
            # + obj-ranked top-k decode, NMS takes the rows presorted
            # (measured -0.5 ms/batch at b32 q8, BASELINE.md round-4)
            pred = deploy.predict_topk(v, x, k=1024, conf_thres=conf)
            return non_max_suppression(pred, conf, iou, presorted=True)
        pred = deploy.predict(v, x)
        return non_max_suppression(pred.astype(jnp.float32), conf, iou,
                                   max_nms=1024, nc=model.cfg.nc)

    # warm the executable at the served batch shape (TRT-engine analog)
    x0 = jnp.zeros((max_batch, img_size, img_size, 3), jnp.float32)
    jax.block_until_ready(infer(fused, x0).scores)
    return infer, fused, model


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/v1/health":
            self._json(200, {"status": "ok",
                             "device": str(jax.devices()[0]),
                             "img_size": STATE["img_size"],
                             "max_batch": STATE["max_batch"]})
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/v1/infer":
            return self._json(404, {"error": "not found"})
        try:
            shape = tuple(int(v) for v in
                          self.headers.get("X-Shape", "").split(","))
            n = int(np.prod(shape)) * 4
            raw = self.rfile.read(int(self.headers["Content-Length"]))
            assert len(raw) == n, f"body {len(raw)} != {n}"
            x = np.frombuffer(raw, np.float32).reshape(shape)
            B = shape[0]
            mb, S = STATE["max_batch"], STATE["img_size"]
            assert B <= mb, f"batch {B} > max {mb}"
            assert shape[1] == S and shape[2] == S, \
                f"served size is {S}, got {shape[1:3]}"
            if B < mb:   # pad to the compiled batch (dynamic-batch analog)
                x = np.concatenate(
                    [x, np.zeros((mb - B, *shape[1:]), np.float32)])
            t0 = time.perf_counter()
            det = STATE["infer"](STATE["vars"], jnp.asarray(x))
            jax.block_until_ready(det.scores)
            ms = (time.perf_counter() - t0) * 1e3
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            classes = np.asarray(det.classes)
            valid = np.asarray(det.valid)
            out = []
            for i in range(B):
                m = valid[i]
                rows = np.concatenate(
                    [boxes[i][m], scores[i][m, None],
                     classes[i][m, None].astype(np.float32)], 1)
                out.append(rows.tolist())
            self._json(200, {"detections": out, "ms": ms})
        except Exception as e:  # noqa: BLE001 - report to client
            self._json(400, {"error": str(e)})


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)

    infer, fused, model = build_engine(args.cfg, args.ckpt, args.img_size,
                                       args.max_batch, args.conf, args.iou)
    STATE.update(infer=infer, vars=fused, img_size=args.img_size,
                 max_batch=args.max_batch)
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (size {args.img_size}, "
          f"max batch {args.max_batch})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
