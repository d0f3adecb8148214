"""Pallas TPU kernel: batched greedy NMS via fixed-point suppression.

TPU-native replacement for torchvision.ops.nms (the reference's single
native postprocess op, reference utils/general.py:1029). Greedy
score-descending suppression is inherently sequential, so a literal port
(one box per step) wastes the machine. Instead we use the exact
fixed-point characterisation of greedy NMS:

    keep[i] = valid[i] AND no j < i with keep[j] and IoU(i, j) > thr

Build the strictly-triangular boolean "suppresses" matrix
``M[j, i] = (j < i) & ~(IoU(i,j) <= thr)`` once (VPU work, blocked rows,
stored bf16 in VMEM), then iterate

    keep <- valid & ((keep @ M) == 0)

Each sweep is one (1,K)x(K,K) product on the MXU with the matrix resident
in VMEM. The iteration is monotone on suppression-chain depth: after n
sweeps every box whose greedy suppression chain is shorter than n is
final, so the loop converges to exactly the greedy solution; typical
cluttered scenes need < 10 sweeps. The `~(iou <= thr)` form (not
`iou > thr`) reproduces greedy's NaN behaviour for zero-area duplicate
boxes.

One grid step per image; K (the `max_nms` candidate pool) must be a
multiple of 128. VMEM budget ~= K*K bf16 + a few (ROW_BLOCK, K) f32
temporaries, so the kernel accepts K <= 2048 (8 MB matrix); larger pools
fall back to the XLA paths in rep_yolo_tpu/ops/nms.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256
MAX_PALLAS_K = 2048


def _nms_kernel(boxes_ref, valid_ref, keep_ref, m_ref, *, iou_thres: float):
    """One image: boxes_ref (1,4,K) f32, valid_ref (1,1,K) f32 in {0,1},
    keep_ref (1,1,K) f32 out, m_ref (K,K) bf16 scratch."""
    K = boxes_ref.shape[2]
    x1 = boxes_ref[0, 0:1, :]                       # (1,K)
    y1 = boxes_ref[0, 1:2, :]
    x2 = boxes_ref[0, 2:3, :]
    y2 = boxes_ref[0, 3:4, :]
    area = (x2 - x1) * (y2 - y1)                    # (1,K)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    # M[a, b] = 1 iff candidate a (higher score, a < b) suppresses b.
    for rb in range(K // ROW_BLOCK):
        r0 = rb * ROW_BLOCK
        sl = slice(r0, r0 + ROW_BLOCK)
        x1r = jnp.reshape(x1[:, sl], (ROW_BLOCK, 1))
        y1r = jnp.reshape(y1[:, sl], (ROW_BLOCK, 1))
        x2r = jnp.reshape(x2[:, sl], (ROW_BLOCK, 1))
        y2r = jnp.reshape(y2[:, sl], (ROW_BLOCK, 1))
        area_r = jnp.reshape(area[:, sl], (ROW_BLOCK, 1))
        row_ids = r0 + jax.lax.broadcasted_iota(
            jnp.int32, (ROW_BLOCK, 1), 0)

        iw = jnp.maximum(
            jnp.minimum(x2r, x2) - jnp.maximum(x1r, x1), 0.0)
        ih = jnp.maximum(
            jnp.minimum(y2r, y2) - jnp.maximum(y1r, y1), 0.0)
        inter = iw * ih                              # (ROW_BLOCK, K)
        iou = inter / (area_r + area - inter)
        supp = jnp.logical_not(iou <= iou_thres)     # NaN -> suppresses
        supp = jnp.logical_and(supp, row_ids < col_ids)
        m_ref[sl, :] = supp.astype(jnp.bfloat16)

    keep0 = valid_ref[0, 0:1, :]                        # (1,K) f32

    def cond(c):
        _, changed, it = c
        return jnp.logical_and(changed > 0, it < K)

    def body(c):
        keep, _, it = c
        hits = jnp.dot(keep.astype(jnp.bfloat16), m_ref[:, :],
                       preferred_element_type=jnp.float32)  # (1,K)
        new = jnp.where(hits > 0.5, 0.0, keep0)
        changed = jnp.sum(jnp.abs(new - keep)).astype(jnp.int32)
        return new, changed, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.int32(1), jnp.int32(0)))
    keep_ref[0, 0:1, :] = keep


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def nms_keep_pallas(boxes: jax.Array, valid: jax.Array, iou_thres: float,
                    interpret: bool = False) -> jax.Array:
    """Batched greedy-NMS keep mask.

    boxes: (B, K, 4) xyxy, score-descending per image (class offsets
    already applied); valid: (B, K) bool; K % 128 == 0, K <= 2048.
    Returns keep (B, K) bool.
    """
    B, K0, _ = boxes.shape
    # pad K to a ROW_BLOCK multiple: every row of the scratch suppression
    # matrix must be written (unwritten scratch is garbage/NaN, and
    # NaN rows silently disable whole sweeps of the fixed point).
    pad = (-K0) % ROW_BLOCK
    K = K0 + pad
    if K > MAX_PALLAS_K:
        raise ValueError(f"K={K0} (padded {K}) exceeds "
                         f"{MAX_PALLAS_K} for the Pallas NMS kernel")
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (B,4,K)
    valid_f = valid.astype(jnp.float32)[:, None, :]  # (B,1,K)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=float(iou_thres)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, K), jnp.bfloat16)],
        interpret=interpret,
    )(boxes_t, valid_f)
    return keep[:, 0, :K0] > 0.5


def nms_keep_matrix_xla(boxes: jax.Array, valid: jax.Array,
                        iou_thres: float) -> jax.Array:
    """Same fixed-point algorithm in plain XLA (CPU fallback / any K).

    boxes: (B, K, 4) score-desc sorted; valid: (B, K) bool.
    """
    boxes = boxes.astype(jnp.float32)
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    lt = jnp.maximum(boxes[:, :, None, :2], boxes[:, None, :, :2])
    rb = jnp.minimum(boxes[:, :, None, 2:], boxes[:, None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]                       # (B, K, K)
    iou = inter / (area[:, :, None] + area[:, None, :] - inter)
    K = boxes.shape[1]
    ids = jnp.arange(K)
    lower = ids[:, None] < ids[None, :]                   # M[a,b]: a before b
    m = (jnp.logical_not(iou <= iou_thres) & lower).astype(jnp.float32)

    keep0 = valid.astype(jnp.float32)

    def cond(c):
        _, changed, it = c
        return jnp.logical_and(changed, it < K)

    def body(c):
        keep, _, it = c
        hits = jnp.einsum("bk,bkl->bl", keep, m)
        new = jnp.where(hits > 0.5, 0.0, keep0)
        return new, jnp.any(new != keep), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.bool_(True), jnp.int32(0)))
    return keep > 0.5
