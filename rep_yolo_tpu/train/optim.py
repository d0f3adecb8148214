"""Optimizer: 3-group SGD(nesterov)/Adam with YOLO warmup + one-cycle.

Reproduces the reference's optimizer construction (reference
train.py:115-208) as pure pytree math:

- group 0: BN scales + implicit (ia/im) params — lr, no weight decay;
- group 1: conv/linear kernels + BiFPN weights — lr, weight decay
  (scaled by total_batch*accumulate/nbs, reference train.py:118);
- group 2: all biases (conv + BN) — separate warmup lr ramp;
- frozen: attention `gamma` params. Reference quirk reproduced: bare
  nn.Parameters like CrissCrossAttention.gamma are picked up by NO group
  in the reference's module walk (train.py:122-190), so they are never
  stepped and stay at their zero init. We give them zero lr.

Schedules (reference train.py:202-208, 354-362):
- one_cycle cosine lf(e) = ((1-cos(e*pi/E))/2)*(lrf-1)+1, or linear;
- warmup over nw = max(3 epochs, 1000 iters): per-group lr interp from
  {0, 0, warmup_bias_lr} to lr0*lf(epoch); momentum from 0.8 to 0.937;
- gradient accumulation count ramps 1 -> nbs/total_batch.

The SGD update matches torch.optim.SGD(nesterov=True) exactly:
    g = grad + wd * p;  buf = m * buf + g;  step = g + m * buf.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Param group assignment
# ---------------------------------------------------------------------------

G_BN_IMPLICIT = 0   # no decay
G_KERNEL = 1        # decay
G_BIAS = 2          # bias warmup
G_FROZEN = 3        # never stepped (reference gamma quirk)


def group_of(path: tuple[str, ...]) -> int:
    """Map a param path (key strings) to its optimizer group."""
    leaf = path[-1]
    if leaf == "gamma":
        return G_FROZEN
    if leaf.startswith(("ia_", "im_")):
        return G_BN_IMPLICIT
    if leaf == "scale":               # BN gamma
        return G_BN_IMPLICIT
    if leaf == "kernel" or leaf == "w":  # conv kernels, BiFPN weights
        return G_KERNEL
    if leaf == "bias":
        return G_BIAS
    return G_BN_IMPLICIT


def group_tree(params) -> Any:
    """Pytree of int group ids, same structure as params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: group_of(tuple(p.key for p in path)), params)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

def one_cycle_factor(epoch: jax.Array, epochs: int, lrf: float) -> jax.Array:
    """Cosine 1 -> lrf over `epochs` (reference utils/general.py:186-188)."""
    return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1


def linear_factor(epoch: jax.Array, epochs: int, lrf: float) -> jax.Array:
    return (1 - epoch / (epochs - 1)) * (1.0 - lrf) + lrf


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr0: float = 0.01
    lrf: float = 0.1
    momentum: float = 0.937
    weight_decay: float = 0.0005     # already batch-scaled by caller
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    epochs: int = 300
    nb: int = 100                    # batches per epoch
    linear_lr: bool = False
    adam: bool = False
    warmup_floor: int = 1000         # min warmup iters (reference train.py:307)

    @property
    def nw(self) -> int:
        """Warmup iterations (reference train.py:307)."""
        return max(round(self.warmup_epochs * self.nb), self.warmup_floor)


def schedule(cfg: OptimConfig, step: jax.Array):
    """Per-step (group_lrs (4,), momentum). `step` is the global iteration
    counter ni (reference train.py:352)."""
    epoch = step / cfg.nb
    lf = (linear_factor(epoch, cfg.epochs, cfg.lrf) if cfg.linear_lr
          else one_cycle_factor(epoch, cfg.epochs, cfg.lrf))
    target = cfg.lr0 * lf
    frac = jnp.clip(step / max(cfg.nw, 1), 0.0, 1.0)
    lr_std = frac * target                 # groups 0/1 warm from 0
    lr_bias = cfg.warmup_bias_lr + frac * (target - cfg.warmup_bias_lr)
    lr_std = jnp.where(step >= cfg.nw, target, lr_std)
    lr_bias = jnp.where(step >= cfg.nw, target, lr_bias)
    mom = jnp.where(step >= cfg.nw, cfg.momentum,
                    cfg.warmup_momentum + frac * (cfg.momentum
                                                  - cfg.warmup_momentum))
    lrs = jnp.stack([lr_std, lr_std, lr_bias, jnp.zeros_like(lr_std)])
    return lrs, mom


# ---------------------------------------------------------------------------
# SGD / Adam state + update
# ---------------------------------------------------------------------------

class OptState(NamedTuple):
    step: jax.Array       # int32 global iteration
    momentum: Any         # pytree like params (SGD buf / Adam m)
    second: Any           # Adam v (zeros for SGD)


def init_state(params) -> OptState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return OptState(step=jnp.zeros((), jnp.int32), momentum=zeros,
                    second=jax.tree.map(jnp.zeros_like, params))


def apply_updates(params, grads, state: OptState, cfg: OptimConfig,
                  groups=None) -> tuple[Any, OptState]:
    """One optimizer step. `groups`: pytree of group ids (precompute with
    group_tree). Returns (new_params, new_state)."""
    if groups is None:
        groups = group_tree(params)
    lrs, mom = schedule(cfg, state.step)

    if cfg.adam:
        t = state.step + 1
        b1, b2, eps = cfg.momentum, 0.999, 1e-8

        def upd(p, g, m, v, gid):
            lr = lrs[gid]
            wd = jnp.where(gid == G_KERNEL, cfg.weight_decay, 0.0)
            g = g + wd * p
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            mhat = m2 / (1 - b1 ** t)
            vhat = v2 / (1 - b2 ** t)
            return p - lr * mhat / (jnp.sqrt(vhat) + eps), m2, v2

        out = jax.tree.map(upd, params, grads, state.momentum, state.second,
                           groups)
    else:
        def upd(p, g, buf, v, gid):
            lr = lrs[gid]
            wd = jnp.where(gid == G_KERNEL, cfg.weight_decay, 0.0)
            g = g + wd * p
            buf2 = mom * buf + g
            step_dir = g + mom * buf2        # nesterov
            return p - lr * step_dir, buf2, v

        out = jax.tree.map(upd, params, grads, state.momentum, state.second,
                           groups)

    is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
    new_m = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
    new_v = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
    return new_params, OptState(step=state.step + 1, momentum=new_m,
                                second=new_v)


def accumulate_steps(cfg_total_batch: int, nbs: int = 64) -> int:
    """Gradient accumulation count (reference train.py:116-117)."""
    return max(round(nbs / cfg_total_batch), 1)


def scaled_weight_decay(wd: float, total_batch: int, nbs: int = 64) -> float:
    """Weight decay scaled by effective batch (reference train.py:118)."""
    accumulate = accumulate_steps(total_batch, nbs)
    return wd * total_batch * accumulate / nbs
