"""Whole-graph roofline ceiling for the fused deploy forward (VERDICT r4 #3).

Enumerates every conv in the deploy graph by shape-tracing the forward
(`jax.eval_shape` + `nn.intercept_methods` — no device needed), then
assigns each conv its best-case execution time from measured v5e rates:

    t(conv) = max(FLOPs / rate(dtype, shape),  bytes / HBM_BW)

with dtype picked per conv (int8 where the measured PTQ table says int8
wins, bf16 elsewhere — the "whole-graph quantized, zero glue" ideal).
Rates come from the hardware probe table in BASELINE.md ("int8 PTQ
probes", measured on this chip with the slope method); shapes without a
probe fall back to a lane-fill model calibrated against those probes:

    rate ~= peak(dtype) * min(1, cout/128) * eff        (eff ~= 0.75)

which reproduces the probed 3x3 rates within ~15% (e.g. 48ch bf16:
197*48/128*0.8 = 59..74 vs 75 measured; 128ch int8: 394*1.0*0.75 = 295
vs 282-297 measured).

Non-conv costs (axial attention, pools, decode+NMS, elementwise glue)
are carried as HBM-traffic terms plus the measured attention figure —
they are real but small next to the conv total; the printed ceiling
separates them so the conv-bound number stands alone.

Usage:  python tools/roofline.py [--batch 32] [--img 640]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# pure shape-level analysis: no TPU needed, and CPU init is much faster
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# v5e per-chip figures (public: cloud.google.com/tpu/docs/v5e) and the
# locally measured efficiency against them (BASELINE.md probe table).
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_BW = 819e9
EFF = 0.75

# Measured slope-method probes (BASELINE.md "int8 PTQ probes", v5e b128):
# (k, cin, cout) -> (bf16 TF/s, int8 TF/s). HW matters less than channel
# widths for these (the two 48ch rows at 320^2/160^2 agree within 8%).
PROBES = {
    (3, 48, 48): (75.2e12, 114.6e12),
    (3, 128, 128): (122.3e12, 282.3e12),
    (3, 128, 256): (155.9e12, 297.2e12),
    (3, 256, 512): (192.7e12, 312.6e12),
    (3, 512, 1024): (131.8e12, 381.1e12),
    (3, 256, 256): (235.3e12, 167.4e12),
    (3, 24, 24): (76.2e12, 73.3e12),
}


def rate(k: int, cin: int, cout: int, dtype: str) -> float:
    """Best-case sustained MXU rate for a conv shape."""
    key = (k, cin, cout)
    if key in PROBES:
        return PROBES[key][0 if dtype == "bf16" else 1]
    peak = PEAK_BF16 if dtype == "bf16" else PEAK_INT8
    fill_n = min(1.0, cout / 128.0)
    # contraction rows: K = k*k*cin; below 128 the systolic array is
    # row-underfilled too (the stem's K=27 runs ~8x under)
    fill_k = min(1.0, (k * k * cin) / 128.0)
    return peak * fill_n * fill_k * EFF


def enumerate_convs(img: int):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.nn.blocks import ConvUnit

    model = RepYOLO.from_config("cfg/rep_yolo.yaml")
    variables = model.init(jax.random.PRNGKey(0), img_size=256)
    deploy, fused = model.fuse(variables)

    records = []

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if isinstance(mod, ConvUnit) and context.method_name == "__call__":
            x = args[0]
            records.append({
                "path": "/".join(mod.scope.path),
                "k": mod.k, "s": mod.s, "g": mod.g,
                "cin": int(x.shape[-1]), "cout": mod.c2,
                "h": int(x.shape[1]), "w": int(x.shape[2]),
            })
        elif isinstance(mod, nn.Conv) and context.method_name == "__call__":
            x = args[0]
            records.append({
                "path": "/".join(mod.scope.path),
                "k": int(mod.kernel_size[0]), "s": 1, "g": 1,
                "cin": int(x.shape[-1]), "cout": int(mod.features),
                "h": int(x.shape[1]), "w": int(x.shape[2]),
            })
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(
            lambda v, x: deploy.apply(v, x, train=False),
            fused,
            jax.ShapeDtypeStruct((1, img, img, 3), jnp.bfloat16))
    return records


def layer_of(path: str) -> str:
    for part in path.split("/"):
        if part.startswith("l") and part[1:].isdigit():
            return part
    return path


def analyze(records, batch: int):
    rows = []
    for r in records:
        ho, wo = r["h"] // r["s"], r["w"] // r["s"]
        macs = (r["k"] ** 2) * (r["cin"] // r["g"]) * r["cout"] * ho * wo
        flops = 2.0 * macs * batch
        res = {}
        for dt, bpe in (("bf16", 2), ("int8", 1)):
            byts = batch * (r["cin"] * r["h"] * r["w"]
                            + r["cout"] * ho * wo) * bpe
            byts += (r["k"] ** 2) * (r["cin"] // r["g"]) * r["cout"] * bpe
            if r["g"] > 1 and dt == "int8":
                # grouped/depthwise: no int8 kernel path; skip
                res[dt] = None
                continue
            t = max(flops / rate(r["k"], r["cin"] // r["g"], r["cout"], dt),
                    byts / HBM_BW)
            res[dt] = t
        best_dt = ("int8" if res["int8"] is not None
                   and res["int8"] < res["bf16"] else "bf16")
        rows.append({**r, "macs": macs, "t_bf16": res["bf16"],
                     "t_int8": res["int8"], "best": best_dt,
                     "t_best": res[best_dt]})
    return rows


def main():
    ap = argparse.ArgumentParser("roofline")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--per-conv", action="store_true")
    args = ap.parse_args()

    records = enumerate_convs(args.img)
    rows = analyze(records, args.batch)

    by_layer: dict[str, dict] = {}
    for r in rows:
        d = by_layer.setdefault(layer_of(r["path"]),
                                {"t_bf16": 0.0, "t_best": 0.0, "gmac": 0.0,
                                 "n": 0, "int8_wins": 0})
        d["t_bf16"] += r["t_bf16"]
        d["t_best"] += r["t_best"]
        d["gmac"] += r["macs"] / 1e9
        d["n"] += 1
        d["int8_wins"] += r["best"] == "int8"

    def lk(name):
        return int(name[1:]) if name[1:].isdigit() else 999

    print(f"# conv roofline @ {args.img}px b{args.batch} "
          f"({len(rows)} convs)")
    print(f"{'layer':8s} {'convs':>5s} {'GMAC/img':>9s} "
          f"{'bf16 ms':>8s} {'best ms':>8s} {'int8?':>6s}")
    tot_bf16 = tot_best = tot_gmac = 0.0
    for name in sorted(by_layer, key=lk):
        d = by_layer[name]
        print(f"{name:8s} {d['n']:5d} {d['gmac']:9.2f} "
              f"{d['t_bf16'] * 1e3:8.2f} {d['t_best'] * 1e3:8.2f} "
              f"{d['int8_wins']:3d}/{d['n']}")
        tot_bf16 += d["t_bf16"]
        tot_best += d["t_best"]
        tot_gmac += d["gmac"]

    if args.per_conv:
        print()
        for r in sorted(rows, key=lambda r: -r["t_best"])[:30]:
            print(f"{r['path'][:58]:58s} k{r['k']} {r['cin']:4d}->"
                  f"{r['cout']:4d} @{r['h']}x{r['w']} g{r['g']} "
                  f"{r['t_best'] * 1e3:6.3f} ms {r['best']}")

    # non-conv floor: one HBM pass over every layer boundary activation
    # (pools/upsample/concat/attention glue), plus the measured
    # attention + decode+NMS figures from the b32 q8 trace (BASELINE.md)
    att_ms = 9.0 * (args.batch / 32.0)       # CCVA x6, measured b32 q8
    dec_ms = 1.6 * (args.batch / 32.0)       # decode+NMS fast path
    print(f"\nconv-only ceiling:   all-bf16 {tot_bf16 * 1e3:6.1f} ms "
          f"-> {args.batch / tot_bf16:7.0f} img/s")
    print(f"                     best-mode {tot_best * 1e3:6.1f} ms "
          f"-> {args.batch / tot_best:7.0f} img/s")
    t_full = tot_best + (att_ms + dec_ms) / 1e3
    print(f"+ attention/decode:  {t_full * 1e3:6.1f} ms "
          f"-> {args.batch / t_full:7.0f} img/s  "
          f"(attn {att_ms:.1f} ms, decode+NMS {dec_ms:.1f} ms)")
    print(f"total {tot_gmac:.1f} GMAC/img")


if __name__ == "__main__":
    main()
