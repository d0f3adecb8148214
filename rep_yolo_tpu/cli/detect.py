"""Detection CLI — the reference detect.py equivalent (reference
detect.py:18-166): load weights -> fuse -> letterbox -> jitted forward +
on-device NMS -> scale back -> save annotated images / label txts.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("rep-yolo-tpu detect")
    p.add_argument("--weights", default=None,
                   help="checkpoint path (train state); random init if unset")
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--source", required=True, help="image file or dir")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="test-time augmentation: 3 scales x flips, merged "
                        "before NMS (reference detect.py:90, "
                        "models/yolo.py:569-585)")
    p.add_argument("--no-fuse", action="store_true",
                   help="run the train-mode multi-branch forward")
    p.add_argument("--fast", default=None, choices=["int8"],
                   help="serving fast path: 'int8' calibrates on the first "
                        "frame and runs the backbone DER blocks through the "
                        "int8-resident Pallas kernels (the TPU analog of the "
                        "reference's TRT int8 engines, "
                        "deploy/triton-inference-server/README.md:13-24)")
    p.add_argument("--project", default="runs/detect")
    p.add_argument("--name", default="exp")
    return p.parse_args(argv)


def enable_int8_fast_path(model, variables, sample_inputs) -> None:
    """Calibrate + enable the int8 DER fast path (trace-time global).

    `sample_inputs`: one or more model-input batches (letterboxed, 0-1
    NHWC) used for activation-scale calibration. Must run BEFORE the
    first traced forward of the function being served (jit caches are
    not keyed on the toggle).
    """
    import rep_yolo_tpu.nn.blocks as blocks_lib
    from rep_yolo_tpu.ops import quant

    batches = sample_inputs if isinstance(sample_inputs, list) \
        else [sample_inputs]
    scales = quant.calibrate(model, variables, batches)
    blocks_lib.set_cmajor_deploy("q8", scales)


def load_model_and_vars(args):
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.train.checkpoint import load_checkpoint
    from rep_yolo_tpu.train.trainer import create_train_state

    model = RepYOLO.from_config(args.cfg, nc=args.nc)
    # init + fuse eagerly on CPU (tunneled-device eager dispatch is slow);
    # the jitted forward runs on the default device afterwards
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0),
                               img_size=args.img_size)
        if args.weights:
            state = create_train_state(variables, jax.random.PRNGKey(0))
            state = load_checkpoint(args.weights, state)
            variables = state.ema.variables  # EMA weights (reference
            #                          detect uses the stripped EMA ckpt)
        if args.no_fuse:
            out = model, variables
        else:
            out = model.fuse(variables)
    model_out, vars_out = out
    return model_out, jax.device_put(vars_out, jax.devices()[0])


def main(argv=None):
    args = parse_args(argv)
    import cv2

    from rep_yolo_tpu.data.augment import letterbox_batch
    from rep_yolo_tpu.data.datasets import discover_images
    from rep_yolo_tpu.ops.nms import non_max_suppression, detections_to_numpy
    from rep_yolo_tpu.utils.general import check_img_size, increment_path

    out_dir = increment_path(Path(args.project) / args.name)
    out_dir.mkdir(parents=True, exist_ok=True)
    size = check_img_size(args.img_size, 32)

    model, variables = load_model_and_vars(args)

    predict = model.predict_tta if args.augment else model.predict

    @jax.jit
    def run(images, hw):
        imgs, ratio, pad = letterbox_batch(images, hw, size)
        pred = predict(variables, imgs)
        det = non_max_suppression(pred, args.conf_thres, args.iou_thres,
                                  max_nms=1024, nc=model.cfg.nc)
        return det, ratio, pad

    frames = _frame_source(args.source)
    t_sum = 0.0
    n_frames = 0
    writer = None
    for f, img0, fps in frames:
        is_video = fps is not None
        n_frames += 1
        rgb = cv2.cvtColor(img0, cv2.COLOR_BGR2RGB)
        h0, w0 = rgb.shape[:2]
        r0 = size / max(h0, w0)
        rs = cv2.resize(rgb, (int(w0 * r0), int(h0 * r0))) if r0 != 1 else rgb
        h, w = rs.shape[:2]
        canvas = np.full((size, size, 3), 114, np.uint8)
        canvas[:h, :w] = rs

        if args.fast == "int8" and n_frames == 1 and not args.no_fuse:
            # calibrate activation scales on the first real frame, before
            # `run`'s first trace (the toggle is trace-time)
            cal, _, _ = letterbox_batch(jnp.asarray(canvas[None]),
                                        jnp.asarray([[h, w]], jnp.float32),
                                        size)
            enable_int8_fast_path(model, variables, cal)

        t0 = time.perf_counter()
        det, ratio, pad = run(jnp.asarray(canvas[None]),
                              jnp.asarray([[h, w]], jnp.float32))
        det = jax.block_until_ready(det)
        t_sum += time.perf_counter() - t0
        d = detections_to_numpy(det)[0]
        r = float(np.asarray(ratio)[0])
        pw, ph = np.asarray(pad)[0]
        if d.shape[0]:
            d[:, [0, 2]] = ((d[:, [0, 2]] - pw) / r / r0).clip(0, w0)
            d[:, [1, 3]] = ((d[:, [1, 3]] - ph) / r / r0).clip(0, h0)

        name = Path(f).name
        print(f"{name}: {d.shape[0]} detections")
        for row in d:
            x1, y1, x2, y2, conf, cls = row
            cv2.rectangle(img0, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
            cv2.putText(img0, f"{int(cls)} {conf:.2f}",
                        (int(x1), int(y1) - 4), cv2.FONT_HERSHEY_SIMPLEX,
                        0.6, (0, 255, 0), 1)
        if is_video:
            if writer is None:
                writer = cv2.VideoWriter(
                    str(out_dir / (Path(f).stem + ".mp4")),
                    cv2.VideoWriter_fourcc(*"mp4v"), fps,
                    (img0.shape[1], img0.shape[0]))
            writer.write(img0)
        else:
            cv2.imwrite(str(out_dir / name), img0)
        if args.save_txt:
            with open(out_dir / (Path(f).stem + ".txt"), "a") as fh:
                for row in d:
                    x1, y1, x2, y2, conf, cls = row
                    xc = (x1 + x2) / 2 / w0
                    yc = (y1 + y2) / 2 / h0
                    bw = (x2 - x1) / w0
                    bh = (y2 - y1) / h0
                    fh.write(f"{int(cls)} {xc:.6f} {yc:.6f} "
                             f"{bw:.6f} {bh:.6f} {conf:.4f}\n")
    if writer is not None:
        writer.release()
    n = max(n_frames, 1)
    print(f"done: {n_frames} frames, {1000 * t_sum / n:.1f} ms/frame "
          f"(incl. first-compile). results -> {out_dir}")
    return out_dir


VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}


def _frame_source(source: str):
    """Yield (name, BGR frame, is_video) from an image file / dir, a video
    file, a webcam index, or a stream URL (reference LoadImages /
    LoadWebcam / LoadStreams, utils/datasets.py:128-351)."""
    import cv2

    from rep_yolo_tpu.data.datasets import discover_images

    def video_frames(cap, name):
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            # constant name per source: the writer derives its filename
            # and the label txt appends per frame
            yield name, frame, fps
        cap.release()

    if source.isdigit():                      # webcam index
        yield from video_frames(cv2.VideoCapture(int(source)),
                                f"webcam{source}")
        return
    if source.startswith(("rtsp://", "http://", "https://")):
        yield from video_frames(cv2.VideoCapture(source), "stream")
        return
    src = Path(source)
    if src.is_file() and src.suffix.lower() in VID_EXTS:
        yield from video_frames(cv2.VideoCapture(str(src)), src.stem)
        return
    files = [str(src)] if src.is_file() else discover_images(src)
    for f in files:
        img = cv2.imread(f)
        assert img is not None, f"cannot read {f}"
        yield f, img, None


if __name__ == "__main__":
    main()
