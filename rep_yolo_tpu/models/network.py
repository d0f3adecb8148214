"""Routed network executor: ModelConfig plan -> flax module.

The plan (from ``config.parse_config``) is resolved before trace time;
``DetectionNet.__call__`` is a straight-line program over saved outputs —
the TPU-first replacement for the reference's per-step module graph walk
(reference models/yolo.py:589-619).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rep_yolo_tpu.models.config import LayerSpec, ModelConfig
from rep_yolo_tpu.models import heads as heads_lib
from rep_yolo_tpu.nn import blocks as B
from rep_yolo_tpu.nn import orepa as O
from rep_yolo_tpu.nn import transformer as T
from rep_yolo_tpu.nn import zoo as Z

_LOG = logging.getLogger(__name__)

# Trace-time record of the last q8 region plan: {layer index: decision
# string}. Written once per traced deploy forward when the channel-major
# q8 region is enabled — the observable answer to "which layers actually
# entered the region and why did it end where it did" (a silently
# shrunken region is a 10%+ perf regression with no functional symptom).
LAST_REGION_PLAN: dict[int, str] = {}

# Functional (parameter-free) ops handled inline by the executor.
_FUNCTIONAL = {"Concat", "ADD", "Shortcut", "MP", "SP", "nn.Upsample",
               "Upsample", "Chuncat", "Foldcut", "Contract", "Expand",
               "ReOrg"}

# CSP wrapper name -> (variant, inner kind) (reference models/common.py
# 318-438, 668-756: <Inner>CSP<V> subclasses of BottleneckCSP<V>).
_CSP_MAP = {}
for _inner in ("Bottleneck", "RepBottleneck", "Res", "RepRes", "ResX",
               "RepResX", "Ghost"):
    for _v in "ABC":
        _CSP_MAP[f"{_inner}CSP{_v}"] = (_v, _inner)


def build_module(spec: LayerSpec, deploy: bool,
                 cm_out: float | str | None = None) -> nn.Module:
    """Instantiate the flax module for a plan row. Name = `l{i}` for stable
    param paths across train/deploy variants. ``cm_out`` threads the flat
    int8 region's output-scale target into the block types that support
    the flat path (ignored by the rest)."""
    name = f"l{spec.i}"
    a = spec.args
    n = spec.name
    if n == "Conv":
        return B.ConvBnAct(*a, deploy=deploy, cm_out=cm_out, name=name)
    if n == "DWConv":
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        return B.ConvBnAct(a[0], k, s, g=B.dw_groups(spec.c1, a[0]),
                           deploy=deploy, name=name)
    if n == "GhostConv":
        return B.GhostConv(*a, deploy=deploy, name=name)
    if n == "RepConv":
        return B.RepConv(spec.c1, *a, deploy=deploy, cm_out=cm_out, name=name)
    if n == "RepS_Block":
        # yaml args: [c2, k, s, p]; num_conv_branches pinned to the
        # reference default for the Rep-YOLO cfg (models/common.py:3387).
        c2, k = a[0], a[1]
        s = a[2] if len(a) > 2 else 1
        p = a[3] if len(a) > 3 else 0
        return B.RepSBlock(spec.c1, c2, k, s, p, num_conv_branches=1,
                           deploy=deploy, name=name)
    if n == "DER_Block":
        c2 = a[0]
        nbs = a[1] if len(a) > 1 else 2
        ncb = a[2] if len(a) > 2 else 1
        return B.DERBlock(spec.c1, c2, nbs, ncb, deploy=deploy, name=name)
    if n == "SPPCSPC":
        return B.SPPCSPC(a[0], n=a[1], deploy=deploy, cm_out=cm_out, name=name)
    if n == "SPP":
        return B.SPP(a[0], tuple(a[1]) if len(a) > 1 else (5, 9, 13),
                     deploy=deploy, name=name)
    if n == "SPPF":
        return B.SPPF(a[0], a[1] if len(a) > 1 else 5, deploy=deploy, name=name)
    if n == "GSConv":
        return B.GSConv(*a, deploy=deploy, cm_out=cm_out, name=name)
    if n == "VoVGSCSP":
        return B.VoVGSCSP(a[0], deploy=deploy, cm_out=cm_out, name=name)
    if n == "CA":
        return B.CA(*a, name=name)
    if n == "CCVA":
        return B.CCVA(a[0], deploy=deploy, name=name)
    if n == "CrissCrossAttention":
        return B.CrissCrossAttention(a[0], deploy=deploy, name=name)
    if n == "VerticalAttention":
        return B.VerticalAttention(a[0], deploy=deploy, name=name)
    if n == "C3":
        return B.C3(a[0], n=a[1], deploy=deploy, name=name)
    if n == "Bottleneck":
        return B.Bottleneck(a[0], deploy=deploy, name=name)
    if n == "DownC":
        return B.DownC(a[0], n=a[1], k=a[2] if len(a) > 2 else 2,
                       deploy=deploy, name=name)
    if n == "Stem":
        return B.Stem(a[0], deploy=deploy, name=name)
    if n == "Focus":
        return B.Focus(*a, deploy=deploy, name=name)
    if n in ("BiFPN_Concat2", "BiFPN_Concat3"):
        return B.BiFPNConcat(a[0], name=name)
    # --- extended zoo (SURVEY §2.2) ---
    if n in _CSP_MAP:
        variant, inner = _CSP_MAP[n]
        cls = {"A": Z.CSPA, "B": Z.CSPB, "C": Z.CSPC}[variant]
        return cls(a[0], n=a[1], inner=inner, deploy=deploy, name=name)
    if n == "RobustConv":
        return Z.RobustConv(a[0], *(a[1:3]), deploy=deploy, name=name)
    if n == "RobustConv2":
        return Z.RobustConv2(a[0], *(a[1:3]), deploy=deploy, name=name)
    if n == "CrossConv":
        return Z.CrossConv(a[0], *(a[1:5]), deploy=deploy, name=name)
    if n == "MixConv2d":
        return Z.MixConv2d(a[0], tuple(a[1]) if len(a) > 1 else (1, 3),
                           a[2] if len(a) > 2 else 1, name=name)
    if n == "Sum":
        return Z.Sum(a[0], weight=a[1], name=name)
    if n == "SpConv2d":
        return Z.SpConv2d(a[0], *(a[1:4]), name=name)
    if n == "stem":
        return Z.EffStem(a[0], *(a[1:3]), name=name)
    if n == "DropPath":
        return Z.DropPath(a[0], name=name)
    if n == "Res":
        return Z.Res(a[0], deploy=deploy, name=name)
    if n == "ResX":
        return Z.Res(a[0], g=32, deploy=deploy, name=name)
    if n == "Ghost":
        return Z.Ghost(a[0], *(a[1:3]), deploy=deploy, name=name)
    if n == "RepBottleneck":
        return Z.RepBottleneck(a[0], deploy=deploy, name=name)
    if n == "RepRes":
        return Z.RepRes(a[0], deploy=deploy, name=name)
    if n == "RepResX":
        return Z.RepRes(a[0], g=32, deploy=deploy, name=name)
    if n == "GhostSPPCSPC":
        return Z.GhostSPPCSPC(a[0], n=a[1], deploy=deploy, name=name)
    if n == "GhostStem":
        return Z.GhostStem(a[0], deploy=deploy, name=name)
    if n == "SPPFCSPC":
        return Z.SPPFCSPC(a[0], k=a[1] if len(a) > 1 else 5,
                          deploy=deploy, name=name)
    if n == "ASPP":
        return Z.ASPP(a[0], name=name)
    if n == "CBAMC3":
        return Z.CBAMC3(a[0], n=a[1], deploy=deploy, name=name)
    if n == "InvertedResidual":
        return Z.InvertedResidual(a[0], s=a[1] if len(a) > 1 else 1,
                                  expand_ratio=a[2] if len(a) > 2 else 6,
                                  name=name)
    if n == "Classify":
        return Z.Classify(a[0], name=name)
    if n == "TransformerBlock":
        return T.TransformerBlock(a[0], a[1], a[2], deploy=deploy, name=name)
    if n == "SwinTransformerBlock":
        return T.SwinTransformerBlock(a[0], a[1], a[2],
                                      ws=a[3] if len(a) > 3 else 8,
                                      deploy=deploy, name=name)
    if n == "SwinTransformer2Block":
        return T.SwinTransformerBlock(a[0], a[1], a[2],
                                      ws=a[3] if len(a) > 3 else 7, v2=True,
                                      deploy=deploy, name=name)
    if n == "SwinTransformerBlock_Vertical":
        return T.SwinTransformerBlockVertical(a[0], a[1], a[2],
                                              ws=a[3] if len(a) > 3 else 7,
                                              deploy=deploy, name=name)
    if n == "C3STR":
        return T.C3STR(a[0], n=a[1], deploy=deploy, name=name)
    if n.startswith("STCSP") or n.startswith("ST2CSP"):
        variant = n[-1]
        return T._STCSP(a[0], n=a[1], variant=variant,
                        v2=n.startswith("ST2"), deploy=deploy, name=name)
    if n == "RepConv_OREPA":
        return O.RepConvOREPA(spec.c1, a[0], deploy=deploy, name=name)
    if n == "OREPA_3x3_RepConv":
        return O.OREPA3x3RepConv(a[0], a[1] if len(a) > 1 else 3,
                                 a[2] if len(a) > 2 else 1,
                                 deploy=deploy, name=name)
    if n == "VoVGSCSPC":
        return B.VoVGSCSP(a[0], cheap=True, deploy=deploy, name=name)
    if n == "GSBottleneck":
        return B.GSBottleneck(a[0], deploy=deploy, name=name)
    if n == "GSBottleneckC":
        return B.GSBottleneck(a[0], cheap=True, deploy=deploy, name=name)
    if n == "Detect":
        return heads_lib.Detect(nc=a[0], anchors=a[1], ch=a[2], name=name)
    if n == "IDetect":
        return heads_lib.IDetect(nc=a[0], anchors=a[1], ch=a[2], deploy=deploy,
                                 name=name)
    if n == "IAuxDetect":
        return heads_lib.IAuxDetect(nc=a[0], anchors=a[1], ch=a[2],
                                    deploy=deploy, name=name)
    if n == "IBin":
        return heads_lib.IBin(nc=a[0], anchors=a[1], ch=a[2],
                              bin_count=a[3] if len(a) > 3 else 21,
                              deploy=deploy, name=name)
    if n == "IKeypoint":
        return heads_lib.IKeypoint(nc=a[0], anchors=a[1], ch=a[2],
                                   nkpt=a[3] if len(a) > 3 else 17,
                                   deploy=deploy, name=name)
    raise ValueError(f"no builder for module {n!r}")


def _module_call(mod: nn.Module, x, train: bool):
    return mod(x, train)


def _remat_wanted(inp, min_hw: int) -> bool:
    """Scoped remat predicate: True when any input map's spatial extent
    (H*W for NHWC arrays) reaches ``min_hw`` pixels (0 = always)."""
    if not min_hw:
        return True
    xs = inp if isinstance(inp, (list, tuple)) else [inp]
    hw = max((x.shape[1] * x.shape[2] for x in xs
              if hasattr(x, "shape") and len(x.shape) == 4), default=0)
    return hw >= min_hw


class DetectionNet(nn.Module):
    """The full detection network. Input NHWC float image batch in [0,1];
    output: list of raw head maps (B, H_l, W_l, na, no) per level
    (2*nl maps for IAuxDetect in train mode).

    ``remat=True`` wraps every parametric block in `nn.remat`
    (jax.checkpoint): the backward pass recomputes block internals from
    layer-boundary activations instead of storing them — the TPU-native
    memory/FLOPs trade that replaces CUDA activation offloading. At
    640px the flagship model trains at ~4x the batch per chip (b32
    OOMs 15.75G HBM by 34G without it). Param tree is unchanged (remat
    is a lifted transform), so checkpoints are interchangeable.

    ``remat_min_hw`` scopes the trade: only blocks whose input spatial
    extent (H*W) is at least this many pixels are wrapped. Activation
    memory is dominated by the early high-resolution stages (at P6/1280
    the l0-l4 maps are 640^2/320^2 while the deep/neck maps are <=
    160^2, a 16-64x smaller footprint per channel) — rematting the deep
    blocks buys almost no memory but pays their full recompute FLOPs.
    0 = remat everything (the round-4 behavior).
    """

    cfg: ModelConfig
    deploy: bool = False
    remat: bool = False
    remat_min_hw: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        saved: dict[int, jax.Array] = {}
        y = x
        # --- channel-major q8 region planning (trace time) -------------
        # When the DER q8 fast path is on, consecutive DER->MP->DER spans
        # exchange flat (B, C, H*W) int8 directly: each DER emits int8 at
        # its successor's calibrated st1 scale (cm_out_scale), the MP
        # pools int8 channel-major (max commutes with the positive
        # scale), and the successor consumes it without the per-block
        # quantize+transpose glue (which measured larger than the kernel
        # wins it wrapped — BASELINE.md round-3). `cm` maps layer index
        # -> (scale, h, w, target) for outputs currently held as flat
        # int8, where `target` is the layer index of the DER block whose
        # st1 calibration scale the tensor is quantized at — consumption
        # matches on this identity, never on float equality of scales.
        # `nhwc_cache` holds lazily-dequantized NHWC views for
        # non-region consumers (FPN taps). `plan` records every
        # enter/exit decision (published as LAST_REGION_PLAN).
        q8_region = (self.deploy and not train
                     and B.CMAJOR_DEPLOY == "q8" and bool(B.CMAJOR_SCALES))
        cm: dict[int, tuple[float, int, int, int]] = {}
        nhwc_cache: dict[int, jax.Array] = {}
        plan: dict[int, str] = {}
        pooled: set[int] = set()   # DERs whose cv1 fused the trailing MP
        neck = q8_region and B.NECK_Q8
        if q8_region:
            from rep_yolo_tpu.ops.pallas import neck_flat as nf

            cons: dict[int, list] = {}
            for sp in self.cfg.layers:
                for j in sp.f:
                    jj = sp.i - 1 if j == -1 else j
                    cons.setdefault(jj, []).append(sp.i)

            # ---- flat int8 NECK region planning (round 5) ----------
            # Post-backbone spans (SPPCSPC -> GSConv/VoVGSCSP FPN/PAN ->
            # sandwich Convs -> RepConv heads -> IDetect convs) run on
            # the flat kernels; the CA/CCVA/ADD attention sandwiches
            # stay bf16 islands (region exits before, re-enters after
            # with one cheap deep-shape quantize). Activations flow as
            # neck_flat.FlatT (int8 + static scale metadata); concats
            # stay unmaterialized lists consumed as accumulating dot
            # sections by the 1x1 kernels.
            _FLAT_ENTRY = {"Conv": "conv", "GSConv": "cv1/conv",
                           "VoVGSCSP": "cv1/conv", "SPPCSPC": "cv1/conv",
                           "RepConv": "rbr_reparam"}
            _FLAT_PASS = {"MP", "Upsample", "nn.Upsample", "Concat"}

            def fsc(key: str):
                s = B.CMAJOR_SCALES.get(key)
                return float(s) if s is not None and s > 0.0 else None

            def _req_keys(sp) -> list[str]:
                pfx, n2, a = f"l{sp.i}", sp.name, sp.args
                if n2 == "Conv":
                    return [f"{pfx}/conv"]
                if n2 == "GSConv":
                    return [f"{pfx}/cv1/conv", f"{pfx}/cv2/conv"]
                if n2 == "VoVGSCSP":
                    ks = [f"{pfx}/cv1/conv", f"{pfx}/cv2/conv",
                          f"{pfx}/cv3/conv"]
                    for r in range(a[1] if len(a) > 1 else 1):
                        g = f"{pfx}/gsb_{r}"
                        ks += [f"{g}/gs1/cv1/conv", f"{g}/gs1/cv2/conv",
                               f"{g}/gs2/cv1/conv", f"{g}/gs2/cv2/conv",
                               f"{g}/shortcut/conv"]
                    return ks
                if n2 == "SPPCSPC":
                    return [f"{pfx}/cv{j}/conv" for j in range(1, 8)]
                if n2 == "RepConv":
                    return [f"{pfx}/rbr_reparam"]
                return []

            def flat_ok(sp) -> bool:
                n2, a = sp.name, sp.args
                if not neck or n2 not in _FLAT_ENTRY:
                    return False
                if n2 == "Conv":
                    k = a[1] if len(a) > 1 else 1
                    st = a[2] if len(a) > 2 else 1
                    if k not in (1, 3) or st != 1:
                        return False
                elif n2 == "GSConv":
                    k = a[1] if len(a) > 1 else 1
                    st = a[2] if len(a) > 2 else 1
                    if (k, st) not in ((1, 1), (3, 1), (3, 2)):
                        return False
                elif n2 == "RepConv":
                    if (a[1] if len(a) > 1 else 3) != 3 \
                            or (a[2] if len(a) > 2 else 1) != 1:
                        return False
                return all(fsc(k_) is not None for k_ in _req_keys(sp))

            def chase_scale(i: int, depth: int = 0):
                """Scale to emit layer i's flat output at: the entry
                scale of its first flat consumer, chasing through the
                scale-preserving pass-through ops."""
                if depth > 8:
                    return None
                for k in cons.get(i, []):
                    sp2 = self.cfg.layers[k]
                    n2 = sp2.name
                    if n2 in _FLAT_PASS:
                        s = chase_scale(sp2.i, depth + 1)
                        if s is not None:
                            return s
                    elif n2 == "IDetect":
                        srcs = [sp2.i - 1 if j == -1 else j
                                for j in sp2.f]
                        s = fsc(f"l{sp2.i}/m_{srcs.index(i)}")
                        if s is not None:
                            return s
                    elif flat_ok(sp2):
                        s = fsc(f"l{sp2.i}/{_FLAT_ENTRY[n2]}")
                        if s is not None:
                            return s
                return None

            def st1_scale(i: int):
                suffix = f"l{i}/stage1/reparam_conv"
                for k, v in B.CMAJOR_SCALES.items():
                    # anchored: "l1/..." must not match "l11/..."
                    if ((k == suffix or k.endswith("/" + suffix))
                            and v > 0.0):
                        return float(v)
                return None

            def der_cm_ok(sp, h: int, w: int) -> bool:
                if sp.name != "DER_Block" or not isinstance(sp.c1, int):
                    return False
                if not B._CMAJOR_SELECT(sp.c1, h, w):
                    return False
                if st1_scale(sp.i) is None:
                    # gate-selected but uncalibrated: without this
                    # warning the region silently ends here
                    _LOG.warning(
                        "q8 region: DER l%d (c1=%d @%dx%d) passes the "
                        "select gate but has no st1 calibration scale — "
                        "layer exits the region", sp.i, sp.c1, h, w)
                    return False
                return True

            def cm_out_scale(i: int, h: int, w: int):
                """(scale, target layer, mp index | None) to emit layer
                i's int8 output at: the st1 scale of a cm-capable DER
                successor (directly, mp=None, or through one MP, mp=its
                layer index), else None (exit the region in NHWC bf16)."""
                for k in cons.get(i, []):
                    sp = self.cfg.layers[k]
                    if sp.name == "MP":
                        for k2 in cons.get(k, []):
                            sp2 = self.cfg.layers[k2]
                            if der_cm_ok(sp2, h // 2, w // 2):
                                return st1_scale(sp2.i), sp2.i, k
                    elif der_cm_ok(sp, h, w):
                        return st1_scale(sp.i), sp.i, None
                return None

        def to_nhwc(j: int, t: jax.Array) -> jax.Array:
            """Dequantize + relayout a region tensor for an NHWC consumer."""
            if j in nhwc_cache:
                return nhwc_cache[j]
            s, h, w, _ = cm[j]
            bsz, c = t.shape[0], t.shape[1]
            out = (t.astype(jnp.bfloat16) * jnp.bfloat16(s))
            out = jnp.transpose(out.reshape(bsz, c, h, w), (0, 2, 3, 1))
            nhwc_cache[j] = out
            return out

        for spec in self.cfg.layers:
            # Gather inputs (region tensors are converted lazily unless
            # the consumer participates in the region — DER/MP below,
            # or the flat neck region's own ops).
            cm_consumer = q8_region and spec.name in ("DER_Block", "MP")
            flat_keep = (neck and (spec.name in _FLAT_PASS
                                   or spec.name == "IDetect"
                                   or flat_ok(spec)))

            def fetch(j):
                t = y if j in (spec.i - 1, -1) else saved[j]
                if q8_region and j in cm and not cm_consumer:
                    return to_nhwc(j, t)
                if q8_region and nf.is_flat(t) and not flat_keep:
                    if j not in nhwc_cache:
                        nhwc_cache[j] = nf.flat_to_nhwc(t)
                    return nhwc_cache[j]
                return t

            if len(spec.f) == 1:
                inp = fetch(spec.f[0])
            else:
                inp = [fetch(j) for j in spec.f]

            n = spec.name
            if n == "Concat":
                if neck and all(nf.is_flat(t) for t in inp):
                    # unmaterialized: a flat list consumed as per-section
                    # accumulating dots by the 1x1 conv kernels
                    y = []
                    for t in inp:
                        y.extend(t if isinstance(t, (list, tuple)) else [t])
                    plan[spec.i] = "in-region concat (unmaterialized)"
                else:
                    inp = [nf.flat_to_nhwc(t) if q8_region and nf.is_flat(t)
                           else t for t in inp]
                    y = jnp.concatenate(inp, axis=-1)
            elif n == "ADD":
                y = inp[0] + inp[1]  # broadcasts CA's (B,1,1,C) quirk output
            elif n == "Shortcut":
                y = inp[0] + inp[1]
            elif n == "Chuncat":
                y = Z.chuncat(inp)
            elif n == "Foldcut":
                y = Z.foldcut(inp)
            elif n == "Contract":
                y = Z.contract(inp, spec.args[0] if spec.args else 2)
            elif n == "Expand":
                y = Z.expand(inp, spec.args[0] if spec.args else 2)
            elif n == "ReOrg":
                y = B.ReOrg()(inp)
            elif n == "MP":
                j = spec.i - 1 if spec.f[0] == -1 else spec.f[0]
                if neck and isinstance(inp, nf.FlatT):
                    # neck-region MP: pool the flat int8 (scale-preserving)
                    from rep_yolo_tpu.ops.pallas import pool_flat
                    from rep_yolo_tpu.ops.pallas.conv_flat import \
                        max_pool_cm

                    t = inp
                    bsz, c = t.data.shape[0], t.c
                    if pool_flat.supports(c, t.h, t.w):
                        d = pool_flat.max_pool2_flat(t.data, t.h, t.w)
                        plan[spec.i] = "in-region flat int8 pool (neck)"
                    else:
                        d = max_pool_cm(t.data.reshape(bsz, c, t.h, t.w))
                        d = d.reshape(bsz, c, (t.h // 2) * (t.w // 2))
                        plan[spec.i] = "in-region pool via max_pool_cm (neck)"
                    y = nf.FlatT(d, t.scale, t.h // 2, t.w // 2,
                                 perm=t.perm)
                elif q8_region and j in pooled:
                    # the producing DER's cv1 already emitted the pooled
                    # map (cm_pool fusion) — this MP is an identity
                    y = inp
                    cm[spec.i] = cm[j]
                    plan[spec.i] = "MP fused into producer cv1 epilogue"
                elif q8_region and j in cm:
                    # pool the flat int8 in channel-major (max commutes
                    # with the positive dequant scale); stays in-region
                    from rep_yolo_tpu.ops.pallas.conv_flat import \
                        max_pool_cm
                    from rep_yolo_tpu.ops.pallas import pool_flat

                    s, h, w, tgt = cm[j]
                    bsz, c = inp.shape[0], inp.shape[1]
                    if pool_flat.supports(c, h, w):
                        # lane-resident pool: no layout flip around the
                        # XLA reshape+max (2.56 ms copy at b32 l1)
                        y = pool_flat.max_pool2_flat(inp, h, w)
                        plan[spec.i] = "in-region flat int8 pool"
                    else:
                        y = max_pool_cm(inp.reshape(bsz, c, h, w))
                        y = y.reshape(bsz, c, (h // 2) * (w // 2))
                        plan[spec.i] = ("in-region pool via max_pool_cm "
                                        f"(pool_flat unsupported for "
                                        f"C={c} {h}x{w}: relayout cost)")
                    cm[spec.i] = (s, h // 2, w // 2, tgt)
                else:
                    y = self._max_pool2(spec, inp, train)
            elif n == "SP":
                k = spec.args[0] if spec.args else 3
                s = spec.args[1] if len(spec.args) > 1 else 1
                y = B.max_pool(inp, k, s, k // 2)
            elif n in ("nn.Upsample", "Upsample"):
                if neck and isinstance(inp, nf.FlatT):
                    y = nf.FlatT(nf.upsample2x_flat(inp.data, inp.h, inp.w),
                                 inp.scale, inp.h * 2, inp.w * 2,
                                 perm=inp.perm)
                    plan[spec.i] = "in-region flat upsample"
                else:
                    y = B.upsample2x_nearest(inp)
            elif (n == "RepS_Block" and q8_region
                    and isinstance(spec.c1, int) and spec.c1 <= 4
                    and (spec.args[1] if len(spec.args) > 1 else 3) == 3
                    and (spec.args[2] if len(spec.args) > 2 else 1) == 2):
                # thin stride-2 stem: enter the region HERE — the block
                # emits flat int8 at its DER successor's st1 scale (the
                # NHWC stem exit otherwise costs ~5 ms of b32 copies)
                h2, w2 = inp.shape[1] // 2, inp.shape[2] // 2
                out = cm_out_scale(spec.i, h2, w2)
                out_s = out[0] if out is not None else None
                p_ = spec.args[3] if len(spec.args) > 3 else 0
                mod = B.RepSBlock(spec.c1, spec.args[0], 3, 2, p_,
                                  num_conv_branches=1, deploy=True,
                                  cm_out_scale=out_s, name=f"l{spec.i}")
                y = mod(inp, train)
                if out_s is not None and y.dtype == jnp.int8:
                    cm[spec.i] = (out_s, h2, w2, out[1])
                    plan[spec.i] = ("region entry: fused flat int8 s2d "
                                    f"stem -> int8 @ st1(l{out[1]})")
                elif out_s is not None:
                    plan[spec.i] = ("stem fast path declined (stem conv "
                                    "uncalibrated): NHWC bf16")
                    _LOG.warning("q8 region: stem l%d has a cm successor "
                                 "but its own input scale is missing — "
                                 "region starts later", spec.i)
                else:
                    plan[spec.i] = "stem: no cm-capable successor"
            elif n == "DER_Block" and q8_region:
                j = spec.i - 1 if spec.f[0] == -1 else spec.f[0]
                if j in cm:
                    _, h, w = cm[j][:3]
                else:
                    h, w = inp.shape[1], inp.shape[2]
                # consume int8 directly only when the producer emitted it
                # FOR this block (cm target identity — an exact match on
                # which st1 scale the planner quantized at, not a float
                # comparison of scale values); anything else — gate
                # mismatch, competing successors — exits the region
                ok = der_cm_ok(spec, h, w)
                use_cm = j in cm and ok and cm[j][3] == spec.i
                if j in cm and not use_cm:
                    inp = to_nhwc(j, inp)
                out = cm_out_scale(spec.i, h, w) if ok else None
                out_s = out[0] if out is not None else None
                # fold a sole-consumer trailing MP into cv1's epilogue
                # (bit-exact; kills the pool kernel's HBM round-trip and
                # 3/4 of cv1's output write)
                from rep_yolo_tpu.ops.pallas.conv_flat import pool_fusible
                fuse_pool = (B.CMAJOR_POOL_FUSE
                             and out is not None and out[2] is not None
                             and set(cons.get(spec.i, ())) == {out[2]}
                             and pool_fusible(h, w))
                c2 = spec.args[0]
                nbs = spec.args[1] if len(spec.args) > 1 else 2
                ncb = spec.args[2] if len(spec.args) > 2 else 1
                mod = B.DERBlock(spec.c1, c2, nbs, ncb, deploy=True,
                                 cm_in=use_cm, cm_hw=(h, w),
                                 cm_out_scale=out_s, cm_pool=fuse_pool,
                                 name=f"l{spec.i}")
                y = mod(inp, train)
                # register only if the fast path actually emitted int8
                # (it declines when any of the block's 13 conv scales is
                # missing and falls back to the NHWC stage path)
                if out_s is not None and y.dtype == jnp.int8:
                    if fuse_pool:
                        cm[spec.i] = (out_s, h // 2, w // 2, out[1])
                        pooled.add(spec.i)
                    else:
                        cm[spec.i] = (out_s, h, w, out[1])
                    plan[spec.i] = (
                        f"in-region DER (c1={spec.c1} @{h}x{w}, "
                        f"{'int8 in' if use_cm else 'NHWC in'}) -> "
                        f"int8 @ st1(l{out[1]})"
                        + (f" (MP l{out[2]} fused into cv1)"
                           if fuse_pool else ""))
                else:
                    if ok and out_s is not None:
                        # gate+successor said int8 but _fast_deploy
                        # declined (one of the 13 conv scales missing)
                        _LOG.warning(
                            "q8 region: DER l%d was planned in-region "
                            "but its fast path declined (incomplete "
                            "calibration) — exits in NHWC bf16", spec.i)
                    plan[spec.i] = (
                        f"DER (c1={spec.c1} @{h}x{w}, "
                        f"{'int8 in' if use_cm else 'NHWC in'}) -> "
                        + ("NHWC bf16 out (no cm successor)" if ok
                           else ("NHWC out (select gate or calibration "
                                 "declined)")))
            elif neck and flat_ok(spec):
                out_s = chase_scale(spec.i)
                if nf.is_flat(inp):
                    inp_f = inp
                    entry = ""
                else:
                    se = fsc(f"l{spec.i}/{_FLAT_ENTRY[n]}")
                    inp_f = nf.quantize_to_flat(inp, se, inp.shape[1],
                                                inp.shape[2])
                    entry = "neck entry quantize; "
                mod = build_module(spec, True, cm_out=out_s)
                y = mod(inp_f, train)
                plan[spec.i] = (entry + f"in-region {n} -> "
                                + ("int8" if out_s is not None
                                   else "NHWC exit"))
            else:
                is_head = n in ("Detect", "IDetect", "IAuxDetect", "IBin",
                                "IKeypoint")
                if is_head and not isinstance(inp, list):
                    inp = [inp]   # single-level head
                mod = build_module(spec, self.deploy)
                if self.remat and not is_head and \
                        _remat_wanted(inp, self.remat_min_hw):
                    y = nn.remat(_module_call, static_argnums=(2,))(
                        mod, inp, train)
                else:
                    y = mod(inp, train)

            if spec.save:
                saved[spec.i] = y

        if q8_region:
            # publish the plan (trace-time; one line per traced forward)
            LAST_REGION_PLAN.clear()
            LAST_REGION_PLAN.update(plan)
            _LOG.info(
                "q8 region plan: %s",
                "; ".join(f"l{i}: {d}" for i, d in sorted(plan.items())))
        return y  # the head's output list

    def _max_pool2(self, spec, inp, train: bool):
        """Backbone MP (2x2/s2). When the producing layer is a DER block
        running the channel-major bf16 deploy fast path, pool
        channel-major too: the NHWC<->NCHW transposes around the pool
        are exact inverses of the DER kernels' edge transposes, and
        XLA's algebraic simplifier cancels the pairs — the cm region
        then spans DER->MP->DER with no relayout between (the block-edge
        transposes were ~20 ms of the b32 forward, BASELINE.md)."""
        if self.deploy and not train and B.CMAJOR_DEPLOY:
            j = spec.i - 1 if spec.f[0] == -1 else spec.f[0]
            prod = self.cfg.layers[j]
            if (prod.name == "DER_Block" and isinstance(prod.c1, int)
                    and B._CMAJOR_SELECT(prod.c1, inp.shape[1],
                                         inp.shape[2])):
                from rep_yolo_tpu.ops.pallas.conv_flat import max_pool_cm

                xc = jnp.transpose(inp, (0, 3, 1, 2))
                return jnp.transpose(max_pool_cm(xc), (0, 2, 3, 1))
        return B.max_pool(inp, 2, 2)
