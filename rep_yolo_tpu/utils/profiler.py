"""Tracing / profiling utilities.

TPU-native counterparts of the reference's profiling surface
(SURVEY §5.1):

- `profile_fn` — micro-benchmark a jitted callable with proper warmup and
  `block_until_ready` timing (replaces `time_synchronized` +
  `utils/torch_utils.py:96-132 profile()`; on TPU the sync is
  block_until_ready, not cuda.synchronize).
- `per_layer_profile` — per-layer latency/params along the routed graph
  (reference `forward_once` profile mode, models/yolo.py:602-611): each
  layer becomes its own jitted program over the saved intermediate.
- `model_info` — param count + estimated FLOPs via XLA's compiled cost
  analysis (replaces thop, reference utils/torch_utils.py:204-225).
- `trace` — context manager around jax.profiler for device traces
  (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def profile_fn(fn: Callable, *args, n: int = 10, warmup: int = 3) -> dict:
    """Median wall time of `fn(*args)` with device sync. Returns stats dict."""
    jitted = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = jitted(*args)
    jax.block_until_ready(out)
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(jitted(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {"median_ms": float(np.median(times) * 1e3),
            "mean_ms": float(times.mean() * 1e3),
            "min_ms": float(times.min() * 1e3), "n": n}


def _count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def model_info(model, variables: dict, img_size: int = 640) -> dict:
    """Params + FLOPs via XLA cost analysis (reference model.info(),
    models/yolo.py:718-727 / utils/torch_utils.py:204-225)."""
    n_params = _count_params(variables.get("params", variables))
    x = jnp.zeros((1, img_size, img_size, model.cfg.ch_in), jnp.float32)

    flops = None
    try:
        lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)
                          ).lower(variables, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else None
    except Exception:
        pass
    return {"params": n_params, "params_m": n_params / 1e6,
            "flops": flops,
            "gflops": flops / 1e9 if flops else None,
            "img_size": img_size}


def per_layer_profile(model, variables: dict, img_size: int = 256,
                      n: int = 5) -> list[dict]:
    """Per-layer latency walk (reference models/yolo.py:602-611): rebuild
    each layer module, jit it over the real intermediate, time it."""
    from rep_yolo_tpu.models.network import build_module, _FUNCTIONAL
    from rep_yolo_tpu.nn import blocks as B
    from rep_yolo_tpu.nn import zoo as Z

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    x = jnp.zeros((1, img_size, img_size, model.cfg.ch_in), jnp.float32)

    rows = []
    saved: dict[int, jax.Array] = {}
    y = x
    for spec in model.cfg.layers:
        if len(spec.f) == 1:
            inp = y if spec.f[0] in (spec.i - 1, -1) else saved[spec.f[0]]
        else:
            inp = [y if j == spec.i - 1 else saved[j] for j in spec.f]

        nme = spec.name
        if nme in _FUNCTIONAL:
            def run(v, t):
                if nme == "Concat":
                    return jnp.concatenate(t, axis=-1)
                if nme in ("ADD", "Shortcut"):
                    return t[0] + t[1]
                if nme == "Chuncat":
                    return Z.chuncat(t)
                if nme == "Foldcut":
                    return Z.foldcut(t)
                if nme == "Contract":
                    return Z.contract(t, spec.args[0] if spec.args else 2)
                if nme == "Expand":
                    return Z.expand(t, spec.args[0] if spec.args else 2)
                if nme == "ReOrg":
                    return B.ReOrg()(t)
                if nme == "MP":
                    return B.max_pool(t, 2, 2)
                if nme == "SP":
                    k = spec.args[0] if spec.args else 3
                    s = spec.args[1] if len(spec.args) > 1 else 1
                    return B.max_pool(t, k, s, k // 2)
                return B.upsample2x_nearest(t)
            layer_vars = {}
            n_params = 0
        else:
            mod = build_module(spec, model.deploy)
            key = f"l{spec.i}"
            layer_vars = {"params": params.get(key, {})}
            if key in stats:
                layer_vars["batch_stats"] = stats[key]
            n_params = _count_params(layer_vars["params"])

            def run(v, t, _mod=mod):
                return _mod.apply(v, t, False)

        stats_t = profile_fn(run, layer_vars, inp, n=n, warmup=2)
        y = jax.jit(run)(layer_vars, inp)
        rows.append({"i": spec.i, "name": nme, "params": n_params,
                     "median_ms": stats_t["median_ms"],
                     "out_shape": tuple(np.asarray(y).shape)
                     if not isinstance(y, (list, tuple)) else "head"})
        if spec.save:
            saved[spec.i] = y
    return rows


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Device trace via jax.profiler (open with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
