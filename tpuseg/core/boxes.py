"""Fixed-shape box geometry primitives.

TPU-native replacement for the reference's dynamic-length box containers
(detectron.jittor ``detectron/structures/bounding_box.py`` ``BoxList`` and
``boxlist_ops.py``; Yolact.jittor ``layers/box_utils.py``). Everything here is
pure ``jnp`` over statically shaped arrays: a set of N boxes is an
``[..., N, 4]`` float array (xyxy unless noted) plus an ``[..., N]`` validity
mask. "Filtering" never changes shapes — it flips mask bits or re-ranks.

All functions are jit-safe and batch-polymorphic over leading dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Format conversion (BoxList.convert in the reference)
# ---------------------------------------------------------------------------


def xyxy_to_xywh(boxes: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


# ---------------------------------------------------------------------------
# Areas / IoU (boxlist_iou, jaccard)
# ---------------------------------------------------------------------------


def area(boxes: jax.Array, to_remove: float = 0.0) -> jax.Array:
    """Area of xyxy boxes; negative extents clamp to zero.

    ``to_remove=1.0`` reproduces detectron's +1-extent convention
    (maskrcnn-benchmark BoxList.area / nms.cu TO_REMOVE=1); the default 0
    is the exclusive-corner form (yolact jaccard, yolo).
    """
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + to_remove, 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + to_remove, 0.0)
    return w * h


def pairwise_intersection(a: jax.Array, b: jax.Array,
                          to_remove: float = 0.0) -> jax.Array:
    """[..., N, 4] x [..., M, 4] -> [..., N, M] intersection areas.

    Broadcasts per coordinate so every [..., N, M] intermediate keeps M as
    the minor axis (full 128-lane tiles); a [..., N, M, 2] form wastes
    126/128 lanes and dominated YOLACT's Fast-NMS wall time on TPU.
    """
    ix = (jnp.minimum(a[..., :, None, 2], b[..., None, :, 2])
          - jnp.maximum(a[..., :, None, 0], b[..., None, :, 0]) + to_remove)
    iy = (jnp.minimum(a[..., :, None, 3], b[..., None, :, 3])
          - jnp.maximum(a[..., :, None, 1], b[..., None, :, 1]) + to_remove)
    return jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)


def iou_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-9,
               to_remove: float = 0.0) -> jax.Array:
    """Pairwise IoU. [..., N, 4] x [..., M, 4] -> [..., N, M].

    Default matches yolact ``jaccard`` (exclusive corners);
    ``to_remove=1.0`` matches detectron ``boxlist_iou`` / nms.cu
    (TO_REMOVE=1 extents) for the Mask R-CNN paths.
    """
    inter = pairwise_intersection(a, b, to_remove)
    union = (area(a, to_remove)[..., :, None]
             + area(b, to_remove)[..., None, :] - inter)
    return inter / jnp.maximum(union, eps)


def iof_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-9,
               transpose: bool = False) -> jax.Array:
    """Intersection over area of ``a`` (for crowd handling). -> [..., N, M];
    ``transpose=True`` returns the same values as [..., M, N] — use it to
    keep the larger side on lanes (a [19248, 16] layout runs on 16 of 128
    TPU lanes; its [16, 19248] transpose fills them)."""
    if transpose:
        inter = pairwise_intersection(b, a)
        return inter / jnp.maximum(area(a)[..., None, :], eps)
    inter = pairwise_intersection(a, b)
    return inter / jnp.maximum(area(a)[..., :, None], eps)


# ---------------------------------------------------------------------------
# Clipping / validity (BoxList.clip_to_image, remove_small_boxes)
# ---------------------------------------------------------------------------


def clip_to_image(boxes: jax.Array, height, width) -> jax.Array:
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jax.Array, min_size: float = 0.0) -> jax.Array:
    """True where a box has both sides > min_size (remove_small_boxes)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > min_size) & (h > min_size)


# ---------------------------------------------------------------------------
# R-CNN box coder (detectron/modeling/box_coder.py semantics)
# ---------------------------------------------------------------------------

BBOX_XFORM_CLIP = 4.135166556742356  # log(1000 / 16), upstream default


def encode_boxes(
    boxes: jax.Array, anchors: jax.Array, weights=(1.0, 1.0, 1.0, 1.0)
) -> jax.Array:
    """Encode target ``boxes`` relative to ``anchors`` as (dx,dy,dw,dh).

    Follows the Faster R-CNN convention with the reference's +1 extents
    (maskrcnn-benchmark BoxCoder.encode uses TO_REMOVE=1).
    """
    wx, wy, ww, wh = weights
    # eps clamp: degenerate boxes (decoded width underflows to 0) can be
    # sampled as NEGATIVES whose encoding is never used in the loss, but an
    # inf here would poison gradients through the 0-masked rows (0 * inf).
    # Positives always have IoU >= 0.5 with a gt, so the clamp never binds
    # on a row that matters (upstream gathers positive rows only).
    ex_w = jnp.maximum(anchors[..., 2] - anchors[..., 0] + 1.0, 1e-6)
    ex_h = jnp.maximum(anchors[..., 3] - anchors[..., 1] + 1.0, 1e-6)
    ex_cx = anchors[..., 0] + 0.5 * ex_w
    ex_cy = anchors[..., 1] + 0.5 * ex_h

    gt_w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + 1.0, 1e-6)
    gt_h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + 1.0, 1e-6)
    gt_cx = boxes[..., 0] + 0.5 * gt_w
    gt_cy = boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    deltas: jax.Array,
    anchors: jax.Array,
    weights=(1.0, 1.0, 1.0, 1.0),
    clip: float = BBOX_XFORM_CLIP,
) -> jax.Array:
    """Apply (dx,dy,dw,dh) deltas to anchors -> xyxy boxes.

    ``deltas`` may have a trailing 4*K dim for class-specific regression; the
    anchor is broadcast over K. Mirrors maskrcnn-benchmark BoxCoder.decode
    (+1 extents, -1 on the output corner).
    """
    wx, wy, ww, wh = weights
    w = anchors[..., 2] - anchors[..., 0] + 1.0
    h = anchors[..., 3] - anchors[..., 1] + 1.0
    cx = anchors[..., 0] + 0.5 * w
    cy = anchors[..., 1] + 0.5 * h

    shp = deltas.shape
    k = shp[-1] // 4
    d = deltas.reshape(shp[:-1] + (k, 4))
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.clip(d[..., 2] / ww, max=clip)
    dh = jnp.clip(d[..., 3] / wh, max=clip)

    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pcx - 0.5 * pw,
            pcy - 0.5 * ph,
            pcx + 0.5 * pw - 1.0,
            pcy + 0.5 * ph - 1.0,
        ],
        axis=-1,
    )
    return out.reshape(shp[:-1] + (4 * k,)) if k > 1 else out[..., 0, :]


# ---------------------------------------------------------------------------
# SSD / YOLACT coder (yolact layers/box_utils.py encode/decode, variances)
# ---------------------------------------------------------------------------


def ssd_decode(
    loc: jax.Array, priors_cxcywh: jax.Array, variances=(0.1, 0.2)
) -> jax.Array:
    """YOLACT/SSD decode: loc deltas vs cxcywh priors -> xyxy boxes.

    Reference: Yolact.jittor ``layers/box_utils.py::decode`` (non-trad path).
    """
    v0, v1 = variances
    cxy = priors_cxcywh[..., :2] + loc[..., :2] * v0 * priors_cxcywh[..., 2:]
    wh = priors_cxcywh[..., 2:] * jnp.exp(loc[..., 2:] * v1)
    return jnp.concatenate([cxy - wh * 0.5, cxy + wh * 0.5], axis=-1)


def ssd_encode(
    matched_xyxy: jax.Array, priors_cxcywh: jax.Array, variances=(0.1, 0.2)
) -> jax.Array:
    """Inverse of ssd_decode (yolact box_utils.encode)."""
    v0, v1 = variances
    g_cxy = (matched_xyxy[..., :2] + matched_xyxy[..., 2:]) * 0.5
    g_wh = matched_xyxy[..., 2:] - matched_xyxy[..., :2]
    d_cxy = (g_cxy - priors_cxcywh[..., :2]) / (v0 * priors_cxcywh[..., 2:])
    d_wh = jnp.log(jnp.maximum(g_wh / priors_cxcywh[..., 2:], 1e-9)) / v1
    return jnp.concatenate([d_cxy, d_wh], axis=-1)


# ---------------------------------------------------------------------------
# Padded top-k (the universal replacement for "filter by score")
# ---------------------------------------------------------------------------


def masked_topk(scores: jax.Array, valid: jax.Array, k: int,
                approx: bool = False):
    """Top-k over the last axis with invalid entries ranked last.

    Returns (scores_k, indices_k, valid_k). Invalid selected slots (when fewer
    than k valid entries exist) have valid_k=False and score -inf. If k exceeds
    the candidate count N, outputs are padded to k with invalid slots.

    ``approx=True`` uses TPU ``approx_max_k`` (recall ~0.99; exact elsewhere)
    — the right trade for rank-insensitive pre-NMS candidate pools.
    """
    n = scores.shape[-1]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg)
    kk = min(k, n)
    if approx and jax.default_backend() == "tpu":
        top, idx = jax.lax.approx_max_k(
            masked, kk, recall_target=0.99, aggregate_to_topk=True)
        idx = idx.astype(jnp.int32)
    else:
        top, idx = jax.lax.top_k(masked, kk)
    if kk < k:
        pad = [(0, 0)] * (top.ndim - 1) + [(0, k - kk)]
        top = jnp.pad(top, pad, constant_values=neg)
        idx = jnp.pad(idx, pad)
    return top, idx, top > neg


def gather_along_n(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of ``x`` ([..., N, ...rest]) by ``idx`` ([..., K])."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim)), axis=idx.ndim - 1
    )
