"""Slope-method benchmark + profiler trace of the full training step.

Same methodology as tools/slope_bench.py (N-vs-2N fori_loop slope with a
real data dependency — the tunneled runtime memoizes identical
dispatches), but for the jitted production train step from
trainer.make_train_step (OTA loss, 3-group SGD, EMA; the reference
train.py:349-390 inner loop).

Usage:
  python tools/train_bench.py [batch] [--img 640] [--classic] [--remat]
      [--no-bf16] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# register the CPU backend alongside the pinned axon TPU (init on CPU)
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax
import jax.numpy as jnp

ITERS = 4


def main():
    p = argparse.ArgumentParser("train_bench")
    p.add_argument("batch", nargs="?", type=int, default=8)
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--classic", action="store_true",
                   help="classic ComputeLoss instead of simOTA")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat-hw", type=int, default=0,
                   help="scope remat to blocks with input H*W >= this "
                        "(0 = all; e.g. 25600 = 160x160+ maps only)")
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--rbg", action="store_true",
                   help="hardware RBG PRNG instead of threefry for the "
                        "in-step RNG (dropout + augmentation): the "
                        "counter-based threefry lowers to long VPU "
                        "op chains; TPU RBG is a native instruction. "
                        "Stream differs (random is random — no "
                        "reference-parity contract on dropout masks)")
    p.add_argument("--max-labels", type=int, default=120)
    p.add_argument("--augment", action="store_true",
                   help="include the on-device augmentation pipeline "
                        "(mosaic+affine+HSV...) in the step, as "
                        "cli/train does by default")
    p.add_argument("--accum", action="store_true",
                   help="gradient-accumulation step variant (nominal "
                        "batch 64), as cli/train does by default")
    p.add_argument("--wgrad", action="store_true",
                   help="Pallas weight-gradient backward for thin 3x3 "
                        "convs (nn.blocks.set_pallas_wgrad)")
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml",
                   help="model config (e.g. cfg/rep_yolo_p6_aux.yaml "
                        "for the 1280px aux-head north-star config)")
    p.add_argument("--aux", action="store_true",
                   help="aux-OTA loss (IAuxDetect heads, reference "
                        "train_aux.py:300,362)")
    p.add_argument("--trace", default=None, metavar="DIR")
    args = p.parse_args()

    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    if args.wgrad:
        import rep_yolo_tpu.nn.blocks as blocks_lib

        blocks_lib.set_pallas_wgrad(True)

    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.train import optim as optim_lib
    from rep_yolo_tpu.train.hyp import SCRATCH_P5, scale_gains
    from rep_yolo_tpu.train.loss import LossConfig, balance_for
    from rep_yolo_tpu.train.trainer import create_train_state, make_train_step

    model = RepYOLO.from_config(args.cfg, remat=args.remat,
                                remat_min_hw=args.remat_hw)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), img_size=args.img)
        state = create_train_state(variables, jax.random.PRNGKey(1))

    hyp = scale_gains(SCRATCH_P5, model.cfg.nl, model.cfg.nc, args.img)
    loss_cfg = LossConfig(nc=model.cfg.nc, box_gain=hyp["box"],
                          obj_gain=hyp["obj"], cls_gain=hyp["cls"],
                          anchor_t=hyp["anchor_t"],
                          balance=balance_for(model.cfg.nl))
    opt_cfg = optim_lib.OptimConfig(epochs=300, nb=100)
    augment_fn = None
    if args.augment:
        from rep_yolo_tpu.data.augment import AugmentConfig, augment_batch

        aug_cfg = AugmentConfig(
            img_size=args.img, degrees=hyp["degrees"],
            translate=hyp["translate"], scale=hyp["scale"],
            shear=hyp["shear"], perspective=hyp["perspective"],
            hsv_h=hyp["hsv_h"], hsv_s=hyp["hsv_s"], hsv_v=hyp["hsv_v"],
            flipud=hyp["flipud"], fliplr=hyp["fliplr"],
            mosaic=hyp["mosaic"], mixup=hyp["mixup"],
            max_labels=args.max_labels)
        augment_fn = (lambda im, hw_, lb, mk, k:
                      augment_batch(im, hw_, lb, mk, k, aug_cfg))
    step = make_train_step(model, loss_cfg, opt_cfg, args.img,
                           loss_mode=("aux_ota" if args.aux
                                      else "classic" if args.classic
                                      else "ota"),
                           mixed_precision=not args.no_bf16,
                           augment_fn=augment_fn, accumulate=args.accum)

    dev = jax.devices()[0]
    if args.accum:
        with jax.default_device(cpu):
            state = create_train_state(variables, jax.random.PRNGKey(1),
                                       accumulate=True)
    state = jax.device_put(state, dev)
    B, S, M = args.batch, args.img, args.max_labels
    rng = jax.random.PRNGKey(2)
    images = jax.device_put(
        jax.random.uniform(rng, (B, S, S, 3), maxval=255.0), dev)
    hw = jax.device_put(jnp.full((B, 2), S, jnp.float32), dev)
    labels = jnp.zeros((B, M, 5)).at[:, 0].set(
        jnp.asarray([0.0, 0.5, 0.5, 0.25, 0.25]))
    labels = jax.device_put(labels, dev)
    mask = jax.device_put(jnp.zeros((B, M), bool).at[:, 0].set(True), dev)

    accum_t = jnp.int32(8)

    @jax.jit
    def loop(state, images, n):
        def body(_, carry):
            st, im, acc = carry
            if args.accum:
                st, comps = step(st, im, hw, labels, mask, accum_t)
            else:
                st, comps = step(st, im, hw, labels, mask)
            t = comps["total"]
            # single-element data dependency (see bench.py: the full-
            # tensor add billed ~0.3 ms/step at b8 to the harness)
            im = im.at[0, 0, 0, 0].add((t * 1e-24).astype(im.dtype))
            return (st, im, acc + t)

        st, _, acc = jax.lax.fori_loop(0, n, body,
                                       (state, images, jnp.float32(0.0)))
        return st, acc

    t0 = time.perf_counter()
    st, acc = loop(state, images, 1)
    jax.block_until_ready(acc)
    print(f"compile+1st step: {time.perf_counter() - t0:.1f}s "
          f"(loss {float(acc):.4f})", flush=True)

    def timed(n):
        t0 = time.perf_counter()
        _, a = loop(state, images, n)
        jax.block_until_ready(a)
        return time.perf_counter() - t0

    t_n = statistics.median(timed(ITERS) for _ in range(3))
    t_2n = statistics.median(timed(2 * ITERS) for _ in range(3))
    dt = max((t_2n - t_n) / ITERS, 1e-9)
    print(f"train step b{B} @{S}px "
          f"{'aux-ota' if args.aux else 'classic' if args.classic else 'ota'}"
          f"{' remat' if args.remat else ''}"
          f"{' aug' if args.augment else ''}"
          f"{' accum' if args.accum else ''}: "
          f"{dt * 1000:8.2f} ms/step -> {B / dt:7.1f} img/s", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            _, a = loop(state, images, 3)
            jax.block_until_ready(a)
        print(f"trace written under {args.trace} (3 steps)")


if __name__ == "__main__":
    main()
