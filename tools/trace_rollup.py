"""Roll up a JAX profiler xplane trace into per-layer / per-op device time.

The TPU runtime memoizes identical dispatches, so naive `block_until_ready`
timing loops lie; capture a trace of a data-dependent `fori_loop` instead
(see tools/slope_bench.py) and aggregate device time here.

Usage:
  python tools/trace_rollup.py <trace.xplane.pb>          # per-layer rollup
  python tools/trace_rollup.py <trace.xplane.pb> l21 l27  # per-op detail

Parses the xplane proto directly (the tensorboard profile plugin wheel in
this image is incompatible with its TF build).
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict


def _load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    plane = next(p for p in space.planes if "TPU" in p.name)
    line = next(l for l in plane.lines if l.name == "XLA Ops")
    return plane, line


def _stats(plane, md):
    return {plane.stat_metadata[s.metadata_id].name: s.str_value
            for s in md.stats}


def rollup(path: str, iters: int = 3) -> None:
    plane, line = _load(path)
    agg, cat_agg = defaultdict(float), defaultdict(float)
    for ev in line.events:
        md = plane.event_metadata[ev.metadata_id]
        if md.name.startswith("%while."):
            continue  # parent wrapper event
        st = _stats(plane, md)
        src = st.get("tf_op", "")
        m = re.search(r"/(l\d+)/", src)
        key = m.group(1) if m else "other:" + (src.split("/")[-1][:30]
                                               or md.name.split(".")[0])
        agg[key] += ev.duration_ps / 1e9
        cat_agg[st.get("hlo_category", "?")] += ev.duration_ps / 1e9
    tot = sum(agg.values())
    print(f"total: {tot:.1f} ms -> {tot / iters:.1f} ms/iter (assuming "
          f"{iters} loop iterations)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {k:40s} {v / iters:8.2f} ms/iter {v / tot * 100:5.1f}%")
    print("\nby HLO category:")
    for k, v in sorted(cat_agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {k:30s} {v / iters:8.2f} ms/iter {v / tot * 100:5.1f}%")


def detail(path: str, layers: list[str], iters: int = 3) -> None:
    plane, line = _load(path)
    want = set(layers)
    agg, meta = defaultdict(float), {}
    for ev in line.events:
        md = plane.event_metadata[ev.metadata_id]
        st = _stats(plane, md)
        m = re.search(r"/(l\d+)/(.*?):", st.get("tf_op", ""))
        if not m or m.group(1) not in want:
            continue
        key = (m.group(1), m.group(2), md.name.split(" = ")[0])
        agg[key] += ev.duration_ps / 1e9
        meta[key] = (md.name[:140], st.get("hlo_category", ""))
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        nm, cat = meta[k]
        print(f"{v / iters:7.3f} ms/it {k[0]:5s} {cat:22s} {k[1][:70]}")
        print(f"          {nm}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    if len(sys.argv) == 2:
        rollup(sys.argv[1])
    else:
        detail(sys.argv[1], sys.argv[2:])
