"""High-level model API: build / init / strides / bias-init / fuse / predict.

TPU-first counterpart of the reference `Model` (reference
models/yolo.py:496-727):

- strides are derived by *abstract evaluation* (`jax.eval_shape`) of a
  256-px forward instead of a real dummy forward (reference :531-536);
- anchor order check + stride normalization (reference
  utils/autoanchor.py:12-21, models/yolo.py:533);
- detect-bias focal-prior init as a pure params rewrite (reference
  models/yolo.py:621-629);
- `fuse()` returns a deploy-mode model + fused variables (reference
  models/yolo.py:681-704) via ``rep_yolo_tpu.nn.fuse``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rep_yolo_tpu.models.config import ModelConfig, parse_config
from rep_yolo_tpu.models.network import DetectionNet
from rep_yolo_tpu.models import heads as heads_lib
from rep_yolo_tpu.nn.fuse import fuse_variables


@dataclasses.dataclass
class RepYOLO:
    """A built detection model: static config + flax net + derived geometry."""

    cfg: ModelConfig
    net: DetectionNet
    strides: tuple[float, ...]          # per detect level
    anchors_px: np.ndarray              # (nl, na, 2) pixel anchors (decode)
    anchors_grid: np.ndarray            # (nl, na, 2) stride-normalized (loss)
    deploy: bool = False

    # -- construction ------------------------------------------------------

    @classmethod
    def from_config(cls, cfg: str | dict | ModelConfig, ch: int = 3,
                    nc: int | None = None, anchors=None,
                    deploy: bool = False, remat: bool = False,
                    remat_min_hw: int = 0) -> "RepYOLO":
        """remat: per-block rematerialization for training memory
        (see DetectionNet docstring); no effect on the param tree.
        remat_min_hw: scope remat to blocks whose input maps have at
        least this many pixels (0 = all blocks)."""
        if not isinstance(cfg, ModelConfig):
            cfg = parse_config(cfg, ch=ch, nc=nc, anchors=anchors)
        net = DetectionNet(cfg=cfg, deploy=deploy, remat=remat,
                           remat_min_hw=remat_min_hw)
        strides = _derive_strides(net, cfg)
        anchors_px = np.asarray(cfg.anchors, dtype=np.float32).reshape(
            cfg.nl, cfg.na, 2)
        anchors_px, strides = _check_anchor_order(anchors_px, strides)
        anchors_grid = anchors_px / np.asarray(strides, np.float32)[:, None, None]
        return cls(cfg=cfg, net=net, strides=tuple(strides),
                   anchors_px=anchors_px, anchors_grid=anchors_grid,
                   deploy=deploy)

    def with_anchors(self, anchors_px: np.ndarray) -> "RepYOLO":
        """New model view with replaced pixel anchors (the autoanchor
        result, reference utils/autoanchor.py:54-57 assigning evolved
        anchors back onto the Detect module): reshape the area-sorted
        (nl*na, 2) set into per-level groups, re-check order against the
        strides (reference check_anchor_order, utils/autoanchor.py:12),
        and recompute the stride-normalized grid the loss uses. Params
        are untouched — anchors are decode/loss constants, not weights."""
        a = np.asarray(anchors_px, np.float32).reshape(
            self.cfg.nl, self.cfg.na, 2)
        a, strides = _check_anchor_order(a, list(self.strides))
        grid = a / np.asarray(strides, np.float32)[:, None, None]
        return dataclasses.replace(self, anchors_px=a, anchors_grid=grid,
                                   strides=tuple(strides))

    def init(self, rng: jax.Array, img_size: int = 640,
             batch: int = 1) -> dict:
        """Initialize variables ({'params', 'batch_stats'}) and apply the
        detect-bias prior."""
        x = jnp.zeros((batch, img_size, img_size, self.cfg.ch_in), jnp.float32)
        variables = self.net.init({"params": rng}, x, train=False)
        variables = dict(variables)
        variables["params"] = initialize_detect_biases(
            variables["params"], self.cfg, self.strides)
        return variables

    # -- forward -----------------------------------------------------------

    def apply(self, variables: dict, x: jax.Array, *, train: bool = False,
              rngs: dict | None = None, mutable=False):
        """Raw forward: returns the list of head maps (B,H,W,na,no)."""
        return self.net.apply(variables, x, train=train, rngs=rngs,
                              mutable=mutable)

    @property
    def head_spec(self):
        return self.cfg.layers[self.cfg.head_index]

    def predict(self, variables: dict, x: jax.Array) -> jax.Array:
        """Decoded inference: (B, N, no) pixel-space predictions. Dispatches
        the decode on the head type (Detect/IDetect/IAuxDetect standard,
        IBin binned-wh, IKeypoint det+keypoints)."""
        maps = self.net.apply(variables, x, train=False)
        maps = maps[: self.cfg.nl]  # lead heads only (IAuxDetect parity)
        spec = self.head_spec
        anchors = jnp.asarray(self.anchors_px)
        if spec.name == "IBin":
            bin_count = spec.args[3] if len(spec.args) > 3 else 21
            outs = [heads_lib.decode_level_bin(p, anchors[i], self.strides[i],
                                               bin_count=bin_count,
                                               nc=self.cfg.nc)
                    for i, p in enumerate(maps)]
            return jnp.concatenate(outs, axis=1)
        if spec.name == "IKeypoint":
            nkpt = spec.args[3] if len(spec.args) > 3 else 17
            outs = [heads_lib.decode_level_kpt(p, anchors[i], self.strides[i],
                                               nc=self.cfg.nc, nkpt=nkpt)
                    for i, p in enumerate(maps)]
            return jnp.concatenate(outs, axis=1)
        return heads_lib.decode_predictions(maps, anchors, self.strides)

    def predict_topk(self, variables: dict, x: jax.Array,
                     k: int = 1024, conf_thres: float | None = None,
                     approx: bool = False) -> jax.Array:
        """Serving-path inference: (B, k, no) f32 predictions holding the
        top-k candidates by objectness, decoded after selection (see
        heads.decode_topk — exact for nc==1, obj-prefiltered for nc>1).
        With conf_thres the objectness gate is applied at the logit level
        and rows come out score-descending — feed straight into
        non_max_suppression(presorted=True). Standard heads only
        (Detect/IDetect/IAuxDetect lead maps)."""
        spec = self.head_spec
        if spec.name in ("IBin", "IKeypoint"):
            return self.predict(variables, x)   # exotic decode: full path
        maps = self.net.apply(variables, x, train=False)[: self.cfg.nl]
        # anchors stay host-side numpy: decode_topk folds them into a
        # compile-time constant table (a traced array would break that)
        return heads_lib.decode_topk(maps, self.anchors_px, self.strides,
                                     k=k, conf_thres=conf_thres,
                                     approx=approx)

    def predict_tta(self, variables: dict, x: jax.Array) -> jax.Array:
        """Test-time-augmented inference (reference models/yolo.py:569-585):
        3 scales (1.0, 0.83, 0.67) x flips (none, lr, none), decoded preds
        de-scaled/de-flipped and concatenated. Each scale is a separate
        static shape (3 compiled programs), the TPU-friendly equivalent of
        the reference's dynamic resize.
        """
        b, h, w, _ = x.shape
        gs = int(max(self.strides))
        scales = (1.0, 0.83, 0.67)
        flips = (None, "lr", None)
        outs = []
        for s, f in zip(scales, flips):
            nh = max(gs, int(math.ceil(h * s / gs) * gs))
            nw = max(gs, int(math.ceil(w * s / gs) * gs))
            xi = jax.image.resize(x, (b, nh, nw, x.shape[-1]), "bilinear")
            if f == "lr":
                xi = xi[:, :, ::-1]
            yi = self.predict(variables, xi)
            # de-scale boxes back to the original pixel frame
            sx = w / nw
            sy = h / nh
            scale_vec = jnp.asarray([sx, sy, sx, sy], yi.dtype)
            boxes = yi[..., :4] * scale_vec
            if f == "lr":
                boxes = boxes.at[..., 0].set(w - boxes[..., 0])
            outs.append(jnp.concatenate([boxes, yi[..., 4:]], axis=-1))
        return jnp.concatenate(outs, axis=1)

    # -- deploy transform ----------------------------------------------------

    def fuse(self, variables: dict) -> tuple["RepYOLO", dict]:
        """Return (deploy model, fused variables)."""
        fused = fuse_variables(variables)
        model = dataclasses.replace(
            self, net=DetectionNet(cfg=self.cfg, deploy=True), deploy=True)
        return model, fused


def _derive_strides(net: DetectionNet, cfg: ModelConfig,
                    s: int = 256) -> list[float]:
    """Stride per level via abstract eval (no FLOPs, no device)."""
    x = jax.ShapeDtypeStruct((1, s, s, cfg.ch_in), jnp.float32)

    def fwd(x):
        rng = jax.random.PRNGKey(0)
        variables = net.init({"params": rng}, x, train=False)
        return net.apply(variables, x, train=False)

    shapes = jax.eval_shape(fwd, x)
    return [s / shape.shape[1] for shape in shapes[:cfg.nl]]


def _check_anchor_order(anchors_px: np.ndarray, strides: Sequence[float]):
    """Ensure anchor areas ascend/descend with strides; flip anchors if not
    (reference utils/autoanchor.py:12-21 flips the anchor tensor, keeping
    stride order).
    """
    a = anchors_px.prod(-1).mean(-1)  # mean area per level
    da = a[-1] - a[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        anchors_px = anchors_px[::-1].copy()
    return anchors_px, list(strides)


def initialize_detect_biases(params: dict, cfg: ModelConfig,
                             strides: Sequence[float],
                             cf: np.ndarray | None = None) -> dict:
    """Focal-prior init of the detect head conv biases.

    Detect/IDetect/IAuxDetect/IKeypoint (reference models/yolo.py:621-643,
    660-668): obj_bias += log(8/(640/s)^2); cls_bias += log(0.6/(nc-0.99)).
    IBin (reference :645-658): same for obj/cls at their shifted offsets,
    plus log(0.6/(bin_count+1-0.99)) on the bin-classification logits
    (regression channels untouched).
    """
    head_key = f"l{cfg.head_index}"
    head = dict(params[head_key])
    na, nc = cfg.na, cfg.nc
    head_spec = cfg.layers[cfg.head_index]
    if head_spec.name == "IBin":
        bc = head_spec.args[3] if len(head_spec.args) > 3 else 21
        no = nc + 3 + 2 * (bc + 1)
        obj_idx = 2 * bc + 4
    else:
        no = nc + 5
        obj_idx = 4

    def adjust(bias, s):
        b = np.asarray(bias, np.float32).reshape(na, no).copy()
        if head_spec.name == "IBin":
            # bin-logit prior on everything before obj, then restore the
            # x/y and the two regression channels (reference :651-657)
            keep = b[:, (0, 1, 2, bc + 3)].copy()
            b[:, :obj_idx] += math.log(0.6 / (bc + 1 - 0.99))
            b[:, (0, 1, 2, bc + 3)] = keep
        b[:, obj_idx] += math.log(8 / (640 / s) ** 2)
        if cf is None:
            b[:, obj_idx + 1:] += math.log(0.6 / (nc - 0.99))
        else:
            b[:, obj_idx + 1:] += np.log(cf / cf.sum())
        return jnp.asarray(b.reshape(-1))

    i = 0
    while f"m_{i}" in head:
        m = dict(head[f"m_{i}"])
        m["bias"] = adjust(m["bias"], strides[i % len(strides)])
        head[f"m_{i}"] = m
        i += 1
    i = 0
    while f"m2_{i}" in head:
        m = dict(head[f"m2_{i}"])
        m["bias"] = adjust(m["bias"], strides[i % len(strides)])
        head[f"m2_{i}"] = m
        i += 1

    out = dict(params)
    out[head_key] = head
    return out
