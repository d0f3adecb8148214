"""Model-config DSL: YAML graph -> static, hashable layer plan.

Consumes the same ``[from, number, module, args]`` YAML dialect as the
reference (cfg/training/Rep-YOLO.yaml), replicating ``parse_model``'s
channel-inference rules (reference models/yolo.py:730-836) for the module
set the Rep-YOLO family exercises — but resolving everything *ahead of
trace time* into an immutable plan (module name, static args, routing,
save-list), so the jitted forward is a straight-line routed program with
no Python graph-walk inside jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import yaml


def make_divisible(x: float, divisor: int = 8) -> int:
    """Reference utils/general.py:116-118."""
    return math.ceil(x / divisor) * divisor


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    i: int                      # layer index
    f: tuple[int, ...]          # absolute source layer indices (-1 == input x handled at build)
    name: str                   # module name in the zoo
    args: tuple                 # static args (post channel inference), zoo-specific
    c1: int | tuple[int, ...]   # input channels
    c2: int                     # output channels
    save: bool = False          # whether later layers read this output


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    nc: int
    anchors: tuple              # (nl, na*2) in pixels
    layers: tuple[LayerSpec, ...]
    head_index: int             # index of the detect layer
    ch_in: int = 3

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2


# Modules whose first arg is c2 and get width_multiple applied
# (reference models/yolo.py:746-762; the Swin/ST CSP wrappers and a few
# tail-end zoo blocks fall through the reference's raw `else` branch at
# models/yolo.py:818-819 — here they get the sane c2=args[0] rule instead,
# since the raw branch only 'works' when the YAML repeats ch[f]).
_CSP_FAMILIES = {
    f"{base}CSP{v}"
    for base in ("Bottleneck", "RepBottleneck", "Res", "RepRes", "ResX",
                 "RepResX", "Ghost")
    for v in "ABC"
} | {f"STCSP{v}" for v in "ABC"} | {f"ST2CSP{v}" for v in "ABC"}

_CH_MODULES = {
    "Conv", "DWConv", "GhostConv", "RepConv", "RepConv_OREPA", "DownC",
    "SPP", "SPPF", "SPPCSPC", "GhostSPPCSPC", "SPPFCSPC", "ASPP",
    "Focus", "Stem", "GhostStem", "stem",
    "Bottleneck", "RepBottleneck", "Res", "RepRes", "ResX", "RepResX",
    "Ghost", "C3", "C3STR", "CCVA", "CBAMC3",
    "GSConv", "VoVGSCSP", "VoVGSCSPC", "GSBottleneck", "GSBottleneckC",
    "RobustConv", "RobustConv2", "MixConv2d", "CrossConv",
    "TransformerBlock", "SwinTransformerBlock", "SwinTransformer2Block",
    "SwinTransformerBlock_Vertical", "InvertedResidual", "Classify",
    "SpConv2d", "OREPA_3x3_RepConv",
} | _CSP_FAMILIES
# Of those, modules that take an n-repeats arg inserted at position 2
# (reference models/yolo.py:768-781).
_INSERT_N = {"DownC", "SPPCSPC", "GhostSPPCSPC", "C3", "C3STR",
             "CBAMC3"} | _CSP_FAMILIES
# Raw-channel modules: c1, c2 = ch[f], args[0], no width multiple
# (reference models/yolo.py:788-790).
_REP_MODULES = {"RepS_Block", "DER_Block"}
_HEADS = {"Detect", "IDetect", "IAuxDetect", "IBin", "IKeypoint"}


def _as_tuple(x) -> tuple:
    if isinstance(x, (list, tuple)):
        return tuple(_as_tuple(v) for v in x)
    return x


def parse_config(cfg: str | dict, ch: int = 3, nc: int | None = None,
                 anchors=None) -> ModelConfig:
    """Parse a model YAML (path or dict) into a static ModelConfig."""
    if isinstance(cfg, str):
        with open(cfg) as f:
            d = yaml.safe_load(f)
    else:
        d = dict(cfg)

    if nc is not None:
        d["nc"] = nc
    if anchors is not None:
        d["anchors"] = anchors

    nc = int(d["nc"])
    gd = float(d.get("depth_multiple", 1.0))
    gw = float(d.get("width_multiple", 1.0))
    anchors = _as_tuple(d["anchors"])
    na = len(anchors[0]) // 2
    no = na * (nc + 5)

    rows = list(d["backbone"]) + list(d["head"])
    channels: list[int] = [ch]
    layers: list[LayerSpec] = []
    save: set[int] = set()

    # Token resolution for string args (the reference eval()s them against
    # locals, reference models/yolo.py:738-743).
    tokens = {"nc": nc, "anchors": anchors, "None": None,
              "True": True, "False": False}

    for i, (f, n, name, args) in enumerate(rows):
        args = [tokens.get(a, a) if isinstance(a, str) else a for a in args]
        n = max(round(n * gd), 1) if n > 1 else n

        def ch_at(j: int) -> int:
            return channels[j] if j >= 0 or i == 0 else channels[j]

        # normalize `from` to absolute indices (input at layer 0 uses -1 too;
        # channels[0] is the image channel count before layer 0 appends).
        fs = f if isinstance(f, list) else [f]
        abs_f = tuple(j if j >= 0 else i + j for j in fs)

        if name in _CH_MODULES:
            c1 = channels[f] if isinstance(f, int) else channels[fs[0]]
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c2, *args[1:]]
            if name in _INSERT_N:
                args.insert(1, n)
                n = 1
        elif name in _REP_MODULES:
            c1 = channels[f]
            c2 = args[0]
            args = [c2, *args[1:]]
        elif name == "Concat" or name == "Chuncat":
            c1 = tuple(channels[j] for j in abs_f)
            c2 = sum(c1)
            args = []
        elif name in ("BiFPN_Concat2", "BiFPN_Concat3"):
            c1 = tuple(channels[j] for j in abs_f)
            c2 = sum(c1)
            args = [len(abs_f)]
        elif name in ("ADD", "Shortcut"):
            c1 = tuple(channels[j] for j in abs_f)
            c2 = c1[0]
            args = []
        elif name in _HEADS:
            c1 = tuple(channels[j] for j in abs_f)
            head_anchors = args[1] if len(args) > 1 else anchors
            if isinstance(head_anchors, int):
                head_anchors = tuple(tuple(range(head_anchors * 2))
                                     for _ in abs_f)
            # extra head args survive (IKeypoint nkpt, IBin bin_count)
            args = [nc, _as_tuple(head_anchors), c1, *args[2:]]
            c2 = no
        elif name == "ReOrg":
            c1 = channels[f]
            c2 = c1 * 4
            args = []
        elif name == "Foldcut":
            # (reference models/yolo.py:794-795)
            c1 = channels[f]
            c2 = c1 // 2
            args = []
        elif name == "Contract":
            # (reference models/yolo.py:803-804)
            c1 = channels[f]
            gain = args[0] if args else 2
            c2 = c1 * gain ** 2
            args = [gain]
        elif name == "Expand":
            # (reference models/yolo.py:805-806)
            c1 = channels[f]
            gain = args[0] if args else 2
            c2 = c1 // gain ** 2
            args = [gain]
        elif name == "Sum":
            # (reference models/experimental.py:24; raw else branch)
            c1 = tuple(channels[j] for j in abs_f)
            c2 = c1[0]
            args = [len(abs_f), bool(args[0]) if args else False]
        elif name == "DropPath":
            c1 = channels[f]
            c2 = c1
            args = [float(args[0]) if args else 0.0]
        elif name == "CA":
            # CA falls through parse_model's else-branch: built with raw
            # args, c2 = ch[f] (reference models/yolo.py:819-820).
            c1 = channels[f]
            c2 = c1
            args = [c1, *args[1:]]
        elif name in ("CrissCrossAttention", "VerticalAttention"):
            c1 = channels[f]
            c2 = make_divisible(args[0] * gw, 8) if args[0] != no else args[0]
            args = [c1]
        elif name in ("MP", "SP", "nn.Upsample", "Upsample", "nn.MaxPool2d"):
            c1 = channels[f]
            c2 = c1
            if name in ("nn.Upsample", "Upsample"):
                args = [args[1] if len(args) > 1 else 2]  # scale factor
        else:
            raise ValueError(f"unsupported module {name!r} at layer {i}")

        if n > 1 and name not in _INSERT_N:
            raise ValueError(f"n>1 for non-repeat module {name!r} at layer {i}")

        for j in abs_f:
            if j != i - 1:
                save.add(j)
        layers.append(LayerSpec(i=i, f=abs_f, name=name, args=_as_tuple(args),
                                c1=c1 if isinstance(c1, tuple) else int(c1),
                                c2=int(c2)))
        if i == 0:
            channels = []
        channels.append(c2)

    layers = tuple(dataclasses.replace(l, save=(l.i in save)) for l in layers)
    head_anchors = layers[-1].args[1] if layers[-1].name in _HEADS else anchors
    return ModelConfig(nc=nc, anchors=_as_tuple(head_anchors), layers=layers,
                       head_index=len(layers) - 1, ch_in=ch)
