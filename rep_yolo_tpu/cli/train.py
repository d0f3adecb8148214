"""Training CLI — the reference train.py equivalent (reference
train.py:535-715 arg surface; the epoch loop maps to a jit-sharded step).

Example:
    python -m rep_yolo_tpu.cli.train --data runs/synthetic --epochs 3 \
        --batch-size 8 --img-size 640 --cfg cfg/rep_yolo.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("rep-yolo-tpu train")
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--data", required=True,
                   help="dataset dir (YOLO layout) or 'synthetic[:N]'")
    p.add_argument("--val-data", default=None)
    p.add_argument("--hyp", default="scratch.p5")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--max-labels", type=int, default=120)
    p.add_argument("--adam", action="store_true")
    p.add_argument("--linear-lr", action="store_true")
    p.add_argument("--no-ota", action="store_true",
                   help="use classic ComputeLoss (the reference train.py "
                        "step default) instead of simOTA")
    p.add_argument("--no-accumulate", action="store_true",
                   help="disable gradient accumulation to the nominal "
                        "batch 64 (reference train.py:116-117 accumulates "
                        "round(64/batch) micro-batches per optimizer step, "
                        "ramping 1->accumulate during warmup)")
    p.add_argument("--aux", action="store_true",
                   help="train with auxiliary heads + aux-OTA loss "
                        "(train_aux.py path; use an IAuxDetect cfg)")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--no-autoanchor", action="store_true",
                   help="skip the train-start anchor BPR check / "
                        "re-evolution (reference --noautoanchor; "
                        "check_anchors runs at train.py:285)")
    p.add_argument("--multi-scale", action="store_true",
                   help="train over static size buckets in ~[0.67,1.33]x "
                        "img-size (reference train.py:365-370)")
    p.add_argument("--image-weights", action="store_true",
                   help="resample images per epoch by class-error weights "
                        "(reference train.py:324-335)")
    p.add_argument("--project", default="runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--resume", default=None)
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rbg", action="store_true",
                   help="hardware RBG PRNG for in-step RNG (dropout + "
                        "augmentation) instead of threefry — faster on "
                        "TPU; the random stream differs")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before device "
                        "discovery (multi-process/multi-slice launch; "
                        "coordinator/process env comes from the TPU "
                        "runtime — the WORLD_SIZE/RANK analog of "
                        "reference train.py:578-579,610)")
    p.add_argument("--devices", type=int, default=0,
                   help="data-parallel over this many devices (0 = all "
                        "visible). The batch is sharded over the mesh "
                        "'data' axis; params/optimizer replicated; grad "
                        "all-reduce + cross-chip BN stats come from XLA's "
                        "partitioner (the DDP/SyncBN analog, reference "
                        "train.py:249-292,610-612)")
    p.add_argument("--native-loader", action="store_true",
                   help="force the C++ decode/prefetch loader (default: "
                        "auto — used whenever it builds; sharding, "
                        "--image-weights and --cache-images all ride it)")
    p.add_argument("--no-native-loader", action="store_true",
                   help="force the Python loader")
    p.add_argument("--cache-images", default=None, choices=["ram", "disk"],
                   help="pre-decode images (reference --cache-images): "
                        "'ram' holds resized canvases in memory, 'disk' "
                        "writes decode-free .npy siblings")
    p.add_argument("--workers", type=int, default=0,
                   help="native loader threads (0 = auto)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 compute, f32 "
                        "master params/optimizer/BN stats (the TPU AMP)")
    p.add_argument("--remat", action="store_true",
                   help="per-block rematerialization (jax.checkpoint): "
                        "~2x larger batch per chip for ~25%% step-time "
                        "overhead; param tree unchanged")
    p.add_argument("--wandb", default=None, metavar="PROJECT",
                   help="log to this Weights & Biases project (optional)")
    p.add_argument("--evolve", type=int, default=0, metavar="N",
                   help="hyperparameter evolution for N generations "
                        "(reference train.py:628-715); each generation "
                        "trains --epochs epochs on mutated hyps")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.multihost and not jax.distributed.is_initialized():
        # MUST be the first JAX-touching call in the process:
        # jax.distributed.initialize() raises once any XLA backend exists,
        # and even jax.process_count() initializes one (the DDP
        # init_process_group analog, reference train.py:610).
        # On TPU pods the args auto-detect; for manual launches the
        # reference-style env (WORLD_SIZE/RANK/MASTER_ADDR/MASTER_PORT,
        # reference train.py:578-579) supplies them explicitly.
        kw = {}
        if os.environ.get("WORLD_SIZE"):
            kw = dict(
                coordinator_address=(os.environ.get("MASTER_ADDR",
                                                    "127.0.0.1") + ":" +
                                     os.environ.get("MASTER_PORT", "12355")),
                num_processes=int(os.environ["WORLD_SIZE"]),
                process_id=int(os.environ.get("RANK", "0")))
        jax.distributed.initialize(**kw)
    if args.evolve:
        from rep_yolo_tpu.train.evolve import evolve
        from rep_yolo_tpu.train.hyp import load_hyp

        base = load_hyp(args.hyp)
        gen_counter = [0]

        def train_once(hyp):
            gen_counter[0] += 1
            res = _run_training(args, hyp,
                                name=f"{args.name}_g{gen_counter[0]}")
            return (res.mp, res.mr, res.map50, res.map)

        best = evolve(train_once, base, generations=args.evolve,
                      out_dir=Path(args.project) / "evolve", seed=args.seed)
        print("best evolved hyp:", json.dumps(best, indent=2))
        return best
    return _run_training(args, None, name=args.name, return_dir=True)


def _run_training(args, hyp_override=None, name="exp", return_dir=False):
    if getattr(args, "rbg", False):
        jax.config.update("jax_default_prng_impl", "rbg")
    from rep_yolo_tpu.data.augment import AugmentConfig, augment_batch
    from rep_yolo_tpu.data.datasets import (DetectionDataset, Loader,
                                            make_synthetic_dataset)
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.parallel.mesh import (barrier, make_mesh,
                                            replicate_host_tree)
    from rep_yolo_tpu.train import optim as optim_lib
    from rep_yolo_tpu.train.checkpoint import save_checkpoint
    from rep_yolo_tpu.train.evaluate import evaluate
    from rep_yolo_tpu.train.hyp import load_hyp, scale_gains
    from rep_yolo_tpu.train.loss import LossConfig
    from rep_yolo_tpu.train import trainer as trainer_lib
    from rep_yolo_tpu.train.trainer import create_train_state, make_train_step
    from rep_yolo_tpu.utils.general import increment_path

    # host-side artifacts (run dir, logs, checkpoints, eval, plots) are
    # process-0-only in multi-process runs — the rank-0 gating of
    # reference train.py:267,419 (the train step itself is a single
    # global program on every process)
    is_main = jax.process_index() == 0

    if args.resume:
        # continue IN the resumed run's directory (a fresh increment would
        # orphan the old run's last.json and loop any resume daemon forever)
        out_dir = Path(args.resume).parent
        out_dir.mkdir(parents=True, exist_ok=True)
    elif is_main:
        out_dir = increment_path(Path(args.project) / name)
        out_dir.mkdir(parents=True, exist_ok=True)
    else:
        # non-main processes never write artifacts; give them a scratch
        # dir so synthetic-data roots etc. stay per-process
        out_dir = Path(args.project) / f"{name}_proc{jax.process_index()}"
        out_dir.mkdir(parents=True, exist_ok=True)
    if is_main:
        (out_dir / "opt.json").write_text(json.dumps(vars(args), indent=2))

    # data: a YOLO-layout dir, 'synthetic[:N]', or a reference-style
    # dataset YAML (train/val paths + nc + names, data/*.yaml)
    val_path = args.val_data
    if args.data.endswith((".yaml", ".yml")):
        from rep_yolo_tpu.data.datasets import load_dataset_spec

        spec = load_dataset_spec(args.data)
        args.nc = spec["nc"]
        if val_path is None and spec["val"]:
            val_path = spec["val"]
        ds = DetectionDataset.from_path(spec["train"], args.img_size,
                                        args.nc, args.max_labels)
    elif args.data.startswith("synthetic"):
        n = int(args.data.split(":")[1]) if ":" in args.data else 64
        ds = make_synthetic_dataset(n, args.img_size, args.nc,
                                    args.max_labels, seed=args.seed,
                                    root=out_dir / "synthetic")
    else:
        ds = DetectionDataset.from_path(args.data, args.img_size, args.nc,
                                        args.max_labels)
    if val_path and str(val_path).startswith("synthetic"):
        n = int(str(val_path).split(":")[1]) if ":" in str(val_path) else 64
        # different seed -> truly held-out images
        val_ds = make_synthetic_dataset(n, args.img_size, args.nc,
                                        args.max_labels,
                                        seed=args.seed + 1,
                                        root=out_dir / "synthetic_val")
    else:
        val_ds = (DetectionDataset.from_path(val_path, args.img_size,
                                             args.nc, args.max_labels)
                  if val_path else ds)
    if args.cache_images:
        ds.cache_images(args.cache_images)
        if val_ds is not ds:
            val_ds.cache_images(args.cache_images)
    # device mesh (DP): single-device is the 1-element degenerate mesh.
    # Multi-host: each process loads its shard of the global batch
    # (Loader shard_index/num_shards replaces DistributedSampler,
    # reference utils/datasets.py:82).
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = args.devices or len(jax.devices())
    devices = jax.devices()[:n_dev]
    assert len(devices) == n_dev, (
        f"--devices {n_dev} but only {len(jax.devices())} visible")
    assert args.batch_size % n_dev == 0, (
        f"--batch-size {args.batch_size} must be divisible by "
        f"{n_dev} devices (reference train.py:611)")
    mesh = make_mesh(devices)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    if n_dev > 1:
        print(f"data-parallel over {n_dev} devices: "
              f"{args.batch_size // n_dev} imgs/device")

    n_proc = jax.process_count()
    local_bs = args.batch_size // n_proc
    # loader: the C++ decode/prefetch loader by default when it builds.
    # Sharding, --image-weights and --cache-images all ride it (the epoch
    # order is computed host-side and handed to the prefetcher; cached
    # datasets serve by gather) — no silent fallback paths.
    use_native = not args.no_native_loader
    if use_native and not args.native_loader:
        from rep_yolo_tpu.data import native_loader as _nl

        use_native = _nl.available()
        if not use_native:
            print("loader: python (native loader unavailable: "
                  f"{_nl.build_error()})")
    if use_native:
        from rep_yolo_tpu.data.native_loader import NativeLoader

        loader = NativeLoader(ds, local_bs, shuffle=True,
                              seed=args.seed,
                              n_threads=args.workers or None,
                              shard_index=jax.process_index(),
                              num_shards=n_proc)
        print("loader: native (C++ decode/prefetch"
              + (f", {n_proc}-way sharded" if n_proc > 1 else "")
              + (", cached" if args.cache_images else "") + ")")
    else:
        loader = Loader(ds, local_bs, shuffle=True, seed=args.seed,
                        shard_index=jax.process_index(), num_shards=n_proc)
        if args.no_native_loader:
            print("loader: python (--no-native-loader)")
    nb = len(loader)
    print(f"train: {len(ds)} images, {nb} batches/epoch")

    # model — init eagerly on CPU: op-by-op dispatch to a remote/tunneled
    # accelerator is pathologically slow, and the state is device_put to
    # the mesh right after anyway
    model = RepYOLO.from_config(args.cfg, nc=args.nc, remat=args.remat)
    # local_devices, not devices: in multi-process runs jax.devices() is
    # the GLOBAL list and [0] may be another process's (non-addressable)
    # device — init results there cannot even be read back
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(jax.random.PRNGKey(args.seed),
                               img_size=args.img_size)

    # hyp / loss / optim
    hyp = load_hyp(hyp_override if hyp_override is not None else args.hyp)
    ghyp = scale_gains(hyp, model.cfg.nl, model.cfg.nc, args.img_size)
    from rep_yolo_tpu.train.loss import balance_for

    if not args.no_autoanchor and not args.resume:
        # anchor fit check + re-evolution at train start (reference
        # train.py:285 -> utils/autoanchor.py:23-59): if the best possible
        # recall of the configured anchors on this dataset is < 0.98,
        # evolve a better set and rebuild the decode/loss anchor grids
        from rep_yolo_tpu.utils.autoanchor import check_anchors

        bpr, new_anchors = check_anchors(ds, model.anchors_px,
                                         img_size=args.img_size,
                                         thr=hyp["anchor_t"],
                                         seed=args.seed)
        if new_anchors is None:
            print(f"autoanchor: BPR {bpr:.4f} — anchors are a good fit")
        else:
            model = model.with_anchors(new_anchors)
            print(f"autoanchor: BPR {bpr:.4f} < 0.98 — evolved new "
                  f"anchors: {model.anchors_px.reshape(-1, 2).tolist()}")
        if is_main:
            (out_dir / "anchors.json").write_text(json.dumps(
                {"bpr": bpr, "anchors_px": model.anchors_px.tolist()}))

    loss_cfg = LossConfig(
        nc=model.cfg.nc, box_gain=ghyp["box"], obj_gain=ghyp["obj"],
        cls_gain=ghyp["cls"], cls_pw=hyp["cls_pw"], obj_pw=hyp["obj_pw"],
        anchor_t=hyp["anchor_t"], fl_gamma=hyp["fl_gamma"],
        label_smoothing=hyp.get("label_smoothing", 0.0),
        balance=balance_for(model.cfg.nl))
    opt_cfg = optim_lib.OptimConfig(
        lr0=hyp["lr0"], lrf=hyp["lrf"], momentum=hyp["momentum"],
        weight_decay=optim_lib.scaled_weight_decay(hyp["weight_decay"],
                                                   args.batch_size),
        warmup_epochs=hyp["warmup_epochs"],
        warmup_momentum=hyp["warmup_momentum"],
        warmup_bias_lr=hyp["warmup_bias_lr"], epochs=args.epochs, nb=nb,
        linear_lr=args.linear_lr, adam=args.adam)

    aug_cfg = AugmentConfig(
        img_size=args.img_size, degrees=hyp["degrees"],
        translate=hyp["translate"], scale=hyp["scale"], shear=hyp["shear"],
        perspective=hyp["perspective"], hsv_h=hyp["hsv_h"],
        hsv_s=hyp["hsv_s"], hsv_v=hyp["hsv_v"], flipud=hyp["flipud"],
        fliplr=hyp["fliplr"], mosaic=hyp["mosaic"],
        mosaic9=hyp.get("mosaic9", 0.2), mixup=hyp["mixup"],
        paste_in=hyp.get("paste_in", 0.0), cutout=hyp.get("cutout", 0.0),
        max_labels=args.max_labels)
    augment_fn = None if args.no_augment else (
        lambda im, hw, lb, mk, k: augment_batch(im, hw, lb, mk, k, aug_cfg))

    loss_mode = ("aux_ota" if args.aux
                 else ("classic" if args.no_ota else "ota"))
    accum_final = (1 if args.no_accumulate
                   else optim_lib.accumulate_steps(args.batch_size))
    use_accum = accum_final > 1
    step_shardings = (repl, shard, shard, shard, shard) + (
        (repl,) if use_accum else ())
    if args.multi_scale:
        from rep_yolo_tpu.train.trainer import make_multiscale_train_steps

        steps = make_multiscale_train_steps(
            model, loss_cfg, opt_cfg, args.img_size,
            augment_fn=augment_fn, loss_mode=loss_mode,
            mixed_precision=args.bf16, accumulate=use_accum)
        # donation is unsafe across programs of different shapes: the state
        # buffers are shared by every bucket's executable
        steps = {s: jax.jit(f, in_shardings=step_shardings,
                            out_shardings=(repl, repl))
                 for s, f in steps.items()}
        sizes = list(steps)
        ms_rng = np.random.default_rng(args.seed + 7)

        def step_fn(state, *batch):
            return steps[ms_rng.choice(sizes)](state, *batch)
    else:
        step_fn = make_train_step(model, loss_cfg, opt_cfg, args.img_size,
                                  augment_fn=augment_fn, loss_mode=loss_mode,
                                  mixed_precision=args.bf16,
                                  accumulate=use_accum)
        step_fn = jax.jit(step_fn, in_shardings=step_shardings,
                          out_shardings=(repl, repl), donate_argnums=(0,))

    state = create_train_state(variables, jax.random.PRNGKey(args.seed + 1),
                               accumulate=use_accum)
    state = replicate_host_tree(state, mesh)

    if n_proc > 1:
        # multi-host: assemble each global batch from per-process shards
        def put_batch(x):
            return jax.make_array_from_process_local_data(
                shard, np.asarray(x))
    else:
        def put_batch(x):
            # numpy -> sharded put directly (jnp.asarray first would
            # eagerly land the array on the default device and transfer
            # a second time on the reshard)
            return jax.device_put(np.asarray(x), shard)

    start_epoch = 0
    if args.resume:
        # restore full TrainState + epoch pointer (reference train.py:216-241)
        from rep_yolo_tpu.train.checkpoint import load_checkpoint

        state = replicate_host_tree(
            jax.tree.map(np.asarray, load_checkpoint(args.resume, state)),
            mesh)
        meta_path = Path(args.resume).with_suffix(".json")
        if meta_path.exists():
            start_epoch = json.loads(meta_path.read_text()).get("epoch", -1) + 1
        print(f"resumed {args.resume} at epoch {start_epoch}")

    from rep_yolo_tpu.utils.logger import RunLogger

    logger = RunLogger(out_dir, wandb_project=args.wandb) if is_main else None
    if logger:
        logger.log_config("hyp", hyp)

    if args.image_weights:
        from rep_yolo_tpu.utils.general import (labels_to_class_weights,
                                                labels_to_image_weights)

        class_w = labels_to_class_weights(ds.labels, model.cfg.nc)

    best_fitness = 0.0
    res = None  # last eval result (stays None if no epoch evals ran)
    maps = np.zeros(model.cfg.nc)  # per-class mAP for image-weight updates
    results_file = out_dir / "results.txt"
    if not args.resume and is_main:
        # pre-training snapshot (reference train.py:319 init.pt)
        save_checkpoint(out_dir / "init", state, meta=dict(epoch=-1))
    # align processes before the first step collective: gloo/ICI context
    # init tolerates only ~30s of skew, and per-process init time varies
    barrier("ry_train_start")
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        mloss = np.zeros(4)
        count = 0
        if args.image_weights:
            # class error weights -> per-image weights (reference :326-330)
            cw = class_w * (1 - maps) ** 2 / model.cfg.nc
            iw = labels_to_image_weights(ds.labels, model.cfg.nc, cw)
            batches = loader.epoch(epoch, image_weights=iw)
        else:
            batches = loader.epoch(epoch)
        def prepare(ib):
            i, batch = ib
            if epoch == start_epoch and i < 3 and is_main:
                # first-batches visual check (reference train.py:401-403):
                # raw loader canvases with labels rescaled from
                # content-normalized to canvas coords (augmentation runs
                # on device inside the step, so this shows the loader's
                # geometry, which is what label bugs corrupt)
                try:
                    from rep_yolo_tpu.utils.plots import plot_images

                    imgs_np = np.asarray(batch["images"])
                    hw_np = np.asarray(batch["hw"], np.float32)
                    lb = np.array(batch["labels"], np.float32)
                    sh, sw = imgs_np.shape[1], imgs_np.shape[2]
                    lb[..., 1] *= hw_np[:, 1:2] / sw
                    lb[..., 3] *= hw_np[:, 1:2] / sw
                    lb[..., 2] *= hw_np[:, 0:1] / sh
                    lb[..., 4] *= hw_np[:, 0:1] / sh
                    plot_images(imgs_np, lb, np.asarray(batch["mask"]),
                                out_dir / f"train_batch{i}.jpg")
                except Exception as e:
                    print(f"train-batch plot skipped: {e}")
            inputs = (put_batch(batch["images"]), put_batch(batch["hw"]),
                      put_batch(batch["labels"]), put_batch(batch["mask"]))
            if use_accum:
                # warmup ramp 1 -> accum_final (reference train.py:357)
                tgt = trainer_lib.accum_target_for(epoch * nb + i,
                                                   opt_cfg.nw, accum_final)
                inputs += (jax.device_put(np.int32(tgt), repl),)
            return inputs

        # one-slot H2D prefetch: upload batch k+1 while the device runs
        # step k (the reference gets this overlap from CUDA streams +
        # DataLoader workers; here a thread hides the host->device copy)
        import queue as _queue
        import threading as _threading

        q: "_queue.Queue" = _queue.Queue(maxsize=2)

        def _feed():
            for ib in enumerate(batches):
                q.put(prepare(ib))
            q.put(None)

        _t = _threading.Thread(target=_feed, daemon=True)
        _t.start()
        while (inputs := q.get()) is not None:
            state, comps = step_fn(state, *inputs)
            # one blocking transfer for all four components (separate
            # float() calls each pay a device round trip)
            vals = jax.device_get(comps)
            mloss += np.asarray([vals[k] for k in
                                 ("box", "obj", "cls", "total")])
            count += 1
        _t.join()
        mloss /= max(count, 1)
        line = (f"epoch {epoch}/{args.epochs - 1} "
                f"box {mloss[0]:.4f} obj {mloss[1]:.4f} cls {mloss[2]:.4f} "
                f"total {mloss[3]:.4f} ({time.time() - t0:.1f}s)")
        print(line)
        if is_main:
            with open(results_file, "a") as f:
                f.write(line + "\n")
            logger.log_scalars(epoch, {"train/box": mloss[0],
                                       "train/obj": mloss[1],
                                       "train/cls": mloss[2],
                                       "train/total": mloss[3]})

        if is_main and ((epoch + 1) % args.eval_every == 0
                        or epoch == args.epochs - 1):
            final = epoch == args.epochs - 1
            ema_vars = state.ema.variables
            if n_proc > 1:
                # rank-0-only eval is a process-LOCAL computation: globally
                # replicated arrays can't feed a local jit, so pull the
                # (replicated, hence addressable) EMA weights to host and
                # let evaluate() re-place them on local devices
                ema_vars = jax.device_get(ema_vars)
            res = evaluate(model, ema_vars, val_ds,
                           batch_size=args.batch_size,
                           img_size=args.img_size,
                           plots_dir=out_dir if final else None)
            print(f"  eval: P {res.mp:.3f} R {res.mr:.3f} "
                  f"mAP50 {res.map50:.3f} mAP {res.map:.3f}")
            for c, d in res.per_class.items():
                if 0 <= c < len(maps):
                    maps[c] = d.get("ap", 0.0)
            logger.log_scalars(epoch, {"val/P": res.mp, "val/R": res.mr,
                                       "val/mAP50": res.map50,
                                       "val/mAP": res.map,
                                       "val/fitness": res.fitness})
            if res.fitness > best_fitness:
                best_fitness = res.fitness
                save_checkpoint(out_dir / "best", state,
                                meta=dict(epoch=epoch, fitness=res.fitness))
                if epoch >= 200:
                    # late-best snapshot (reference train.py:477-479)
                    save_checkpoint(out_dir / f"best_{epoch:03d}", state,
                                    meta=dict(epoch=epoch,
                                              fitness=res.fitness))
        # cadence (reference train.py:461-483): last every epoch; epoch
        # snapshots at 0, every 25, and the final 5 epochs
        fit = res.fitness if res is not None else 0.0
        if is_main:
            save_checkpoint(out_dir / "last", state,
                            meta=dict(epoch=epoch, fitness=fit))
            if (epoch == 0 or (epoch + 1) % 25 == 0
                    or epoch >= args.epochs - 5):
                save_checkpoint(out_dir / f"epoch_{epoch:03d}", state,
                                meta=dict(epoch=epoch, fitness=fit))
        # re-align after rank-0-only eval/checkpoint host work, so no
        # process waits inside a step collective past its rendezvous
        barrier(f"ry_epoch_{epoch}")
    if logger:
        logger.close()
    if is_main:
        try:
            # end-of-run summary plots (reference train.py:519 plot_results;
            # plot_labels at train start, train.py:295-300 — done here once)
            from rep_yolo_tpu.utils.plots import plot_labels, plot_results

            plot_results(results_file, out_dir / "results.png")
            plot_labels(ds.labels, out_dir, nc=model.cfg.nc)
        except Exception as e:
            print(f"summary plots skipped: {e}")
    print(f"done. results in {out_dir}")
    return out_dir if return_dir else res


if __name__ == "__main__":
    main()
