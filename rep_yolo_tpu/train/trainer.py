"""Training state and the jit-sharded train step.

The reference's epoch/batch loop (reference train.py:320-416) maps to a
single jitted `train_step` over a data-sharded mesh:

- forward in train mode (BN batch stats update; with the batch sharded on
  the mesh's data axis the batch-mean IS the global mean — XLA inserts the
  cross-chip reductions, subsuming SyncBatchNorm, reference train.py:253);
- simOTA or classic loss (train.py:375 uses the classic ComputeLoss in the
  step; train_aux.py:362 uses OTA — both provided);
- SGD(nesterov)/3-group update with warmup + one-cycle schedules;
- EMA update (reference train.py:390).

Gradient accumulation (reference train.py:116-117,385) is expressed by
micro-batching outside or by scaling the per-chip batch; weight decay is
pre-scaled accordingly (optim.scaled_weight_decay).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rep_yolo_tpu.train import optim as optim_lib
from rep_yolo_tpu.train.ema import EMAState, init_ema, update_ema
from rep_yolo_tpu.train.loss import (LossConfig, compute_loss,
                                     compute_loss_ota, compute_loss_aux_ota)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt: optim_lib.OptState
    ema: EMAState
    rng: jax.Array
    # gradient accumulation (reference train.py:385-390): running grad sum
    # + micro-batch count since the last optimizer apply. Empty dict when
    # accumulation is off (accumulate == 1) so the pytree stays lean.
    acc: Any = {}
    acc_n: jax.Array | int = 0


def create_train_state(variables: dict, rng: jax.Array,
                       accumulate: bool = False) -> TrainState:
    """`accumulate` is accepted for API stability but the acc fields are
    ALWAYS materialized (zeros + int32 counter): a flag-dependent pytree
    structure breaks --resume across the accumulation boundary (a
    checkpoint saved with accumulation on could not restore into a
    --no-accumulate template and vice versa). The non-accumulating step
    passes them through untouched, and with donation XLA aliases them —
    no copy, just one params-sized zeros tree in the state."""
    del accumulate
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt=optim_lib.init_state(variables["params"]),
        ema=init_ema({"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {})}),
        rng=rng,
        acc=jax.tree.map(jnp.zeros_like, variables["params"]),
        acc_n=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, loss_cfg: LossConfig, opt_cfg: optim_lib.OptimConfig,
                    img_size: int, use_ota: bool = True,
                    augment_fn=None, loss_mode: str | None = None,
                    resize_to: int | None = None,
                    mixed_precision: bool = False,
                    accumulate: bool = False,
                    fast_dropout: bool = True):
    """Build the jit-able train step.

    model: RepYOLO; augment_fn: optional on-device augmentation
    (images, hw, labels, mask, key) -> Batch applied inside the step.
    The input contract is the loader's in BOTH cases: images are 0-255
    canvases (content top-left at hw), labels xywh normalized to the
    content; without augment_fn an identity normalization (/255 + label
    rescale to canvas coords) runs instead (reference train.py:351).
    loss_mode: 'ota' | 'classic' | 'aux_ota' (overrides use_ota).
    resize_to: multi-scale bucket — after augmentation the batch is
    resized on device to this square size (labels are normalized, so
    they are untouched). One compiled program per bucket replaces the
    reference's per-step dynamic interpolate (reference train.py:365-370).
    mixed_precision: bf16 forward/backward with f32 master params,
    optimizer state, BN stats, and loss math — the TPU-native analog of
    the reference's CUDA AMP (reference train.py:312,373; no loss
    scaling needed: bf16 shares f32's exponent range).
    accumulate: gradient accumulation (reference train.py:116-117,385):
    the step takes an extra trailing int32 `accum_target` arg, sums
    grads into state.acc, and applies the optimizer + EMA only every
    `accum_target` micro-batches (on the SUM, like torch — effective lr
    scales with the accumulate count, which the reference's batch-scaled
    weight decay assumes). `accum_target` is traced, so the host can
    ramp it 1 -> nbs/total_batch during warmup (reference train.py:357)
    within ONE compiled program. The optimizer step counter advances
    every micro-batch either way, so warmup/cosine schedules stay keyed
    to the batch iteration `ni` like the reference's.
    """
    anchors_grid = jnp.asarray(model.anchors_grid)
    strides = model.strides
    # param->group ids are derived inside apply_updates at trace time
    # (pure path-based mapping; traced once per compiled step)
    mode = loss_mode or ("ota" if use_ota else "classic")
    loss_size = resize_to or img_size

    def loss_fn(params, batch_stats, images, labels, mask, rng):
        if mixed_precision:
            # bf16 compute params (differentiable cast: grads land on the
            # f32 masters), bf16 activations; loss math stays f32 below
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
            images = images.astype(jnp.bfloat16)
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.net.apply(
            variables, images, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        if mixed_precision:
            preds = [p.astype(jnp.float32) for p in preds]
        if mode == "aux_ota":
            loss, comps = compute_loss_aux_ota(
                preds, labels, mask, anchors_grid, strides, loss_size,
                loss_cfg)
        elif mode == "ota":
            loss, comps = compute_loss_ota(
                preds, labels, mask, anchors_grid, strides, loss_size,
                loss_cfg)
        else:
            loss, comps = compute_loss(preds, labels, mask, anchors_grid,
                                       loss_cfg)
        return loss, (comps, mutated["batch_stats"])

    def _fwd_bwd(state: TrainState, images, hw, labels, mask):
        rng, k_aug, k_drop = jax.random.split(state.rng, 3)
        if fast_dropout and jax.random.key_impl(k_drop) != "rbg":
            # dropout mask bits from the TPU hardware RNG (rbg) instead
            # of threefry: the 24 per-stage dropout masks cost 6.5 ms of
            # the l1 block alone at b8 (train-step trace, BASELINE.md).
            # rbg's weaker splitting guarantees are irrelevant for
            # dropout; the augment stream stays threefry. (No-op when
            # the key is already rbg — e.g. the global --rbg flag.)
            k_drop = jax.random.wrap_key_data(
                jnp.tile(jax.random.key_data(
                    jax.random.wrap_key_data(k_drop)), 2), impl="rbg")
        if augment_fn is not None:
            batch = augment_fn(images, hw, labels, mask, k_aug)
            images, labels, mask = batch.images, batch.labels, batch.mask
        else:
            # same input contract as the augment path: 0-255 canvases with
            # content-normalized labels in, 0-1 images with
            # canvas-normalized labels out (reference train.py:351)
            from rep_yolo_tpu.data.augment import identity_batch

            images, labels = identity_batch(images, hw, labels)
        if resize_to is not None and resize_to != images.shape[1]:
            b = images.shape[0]
            images = jax.image.resize(
                images, (b, resize_to, resize_to, images.shape[-1]),
                "bilinear")
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (comps, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, labels, mask, k_drop)
        return rng, comps, new_stats, grads

    def train_step(state: TrainState, images, hw, labels, mask):
        rng, comps, new_stats, grads = _fwd_bwd(state, images, hw, labels,
                                                mask)
        new_params, new_opt = optim_lib.apply_updates(
            state.params, grads, state.opt, opt_cfg)
        new_ema = update_ema(state.ema, {"params": new_params,
                                         "batch_stats": new_stats})
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt=new_opt, ema=new_ema, rng=rng,
                          acc=state.acc, acc_n=state.acc_n), comps

    def train_step_accum(state: TrainState, images, hw, labels, mask,
                         accum_target):
        rng, comps, new_stats, grads = _fwd_bwd(state, images, hw, labels,
                                                mask)
        acc = jax.tree.map(jnp.add, state.acc, grads)
        n = state.acc_n + 1
        do_apply = n >= accum_target

        def apply_branch(_):
            new_params, new_opt = optim_lib.apply_updates(
                state.params, acc, state.opt, opt_cfg)
            new_ema = update_ema(state.ema, {"params": new_params,
                                             "batch_stats": new_stats})
            return (new_params, new_opt, new_ema,
                    jax.tree.map(jnp.zeros_like, acc),
                    jnp.zeros((), jnp.int32))

        def skip_branch(_):
            # keep the step counter == batch iteration ni so warmup /
            # one-cycle schedules match the reference's ni-keyed interp
            opt2 = state.opt._replace(step=state.opt.step + 1)
            return state.params, opt2, state.ema, acc, n

        new_params, new_opt, new_ema, new_acc, new_n = jax.lax.cond(
            do_apply, apply_branch, skip_branch, None)
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt=new_opt, ema=new_ema, rng=rng,
                          acc=new_acc, acc_n=new_n), comps

    return train_step_accum if accumulate else train_step


def accum_target_for(ni: int, nw: int, final: int) -> int:
    """Warmup accumulate ramp (reference train.py:357): interp 1 -> final
    over the nw warmup iterations, then `final`."""
    if final <= 1 or ni >= nw:
        return max(final, 1)
    return max(1, round(1 + (final - 1) * ni / max(nw, 1)))


def multiscale_sizes(img_size: int, gs: int = 32,
                     factors=(0.67, 0.83, 1.0, 1.17, 1.33)) -> tuple[int, ...]:
    """Static multi-scale buckets snapped to the stride (the TPU-friendly
    version of the reference's per-step random resize over
    [0.5, 1.5]*imgsz, reference train.py:365-370 — each bucket is one
    compiled program instead of a fresh shape per step)."""
    sizes = sorted({max(gs, int(round(img_size * f / gs)) * gs)
                    for f in factors})
    return tuple(sizes)


def make_multiscale_train_steps(model, loss_cfg: LossConfig,
                                opt_cfg: optim_lib.OptimConfig,
                                img_size: int, sizes=None, **kw) -> dict:
    """One train step per size bucket; the caller samples a bucket per
    batch (host RNG) and dispatches — reference train.py:365-370."""
    sizes = sizes or multiscale_sizes(img_size, int(max(model.strides)))
    return {s: make_train_step(model, loss_cfg, opt_cfg, img_size,
                               resize_to=s, **kw)
            for s in sizes}
