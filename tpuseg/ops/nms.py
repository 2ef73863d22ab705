"""Static-shape non-maximum suppression for TPU.

TPU-native replacement for the reference's native NMS ops:
  - detectron.jittor ``detectron/layers/nms.py`` (upstream csrc/cuda/nms.cu)
  - yolo.jittor ``utils/utils.py::non_max_suppression``
  - Yolact.jittor ``layers/functions/detection.py::fast_nms``

Design: boxes are never filtered, only ranked and masked. Every function takes
and returns fixed-shape arrays so the whole detection pipeline stays inside one
jit-compiled program.

Two exact-greedy implementations are provided:
  * :func:`nms_mask_reference` — O(N) sequential ``fori_loop``; the semantic
    golden, used in tests.
  * :func:`nms_mask` — tiled algorithm (same result): boxes are processed in
    tiles of 128; cross-tile suppression is one masked IoU-matrix reduction and
    within-tile suppression converges in a handful of whole-tile matrix
    iterations instead of per-box steps. This is the production path; it maps
    onto the VPU/MXU instead of scalar control flow.

Plus :func:`fast_nms` (YOLACT's loop-free variant — already ideal for TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuseg.core import boxes as box_ops

NEG_INF = -1e10


def _sort_desc(scores, valid):
    masked = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked)
    return masked, order


def nms_mask_reference(
    boxes: jax.Array, scores: jax.Array, iou_threshold: float, valid=None,
    to_remove: float = 0.0,
) -> jax.Array:
    """Exact greedy NMS -> keep mask [N]. Sequential golden implementation."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    masked, order = _sort_desc(scores, valid)
    sboxes = boxes[order]
    svalid = masked[order] > NEG_INF
    iou = box_ops.iou_matrix(sboxes, sboxes, to_remove=to_remove)

    def body(i, alive):
        row = iou[i]
        suppress = (row > iou_threshold) & alive[i] & (jnp.arange(n) > i)
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, n, body, svalid)
    keep_sorted = alive & svalid
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def _self_suppress_tile(adj: jax.Array, valid: jax.Array) -> jax.Array:
    """Exact greedy suppression within one tile.

    ``adj``: [T, T] boolean "i suppresses j" adjacency (IoU>threshold, strict
    upper triangle of score-sorted boxes). ``valid``: [T] initial validity.
    Greedy NMS is the unique fixed point of
        kept(j) = valid(j) and not any_i(adj[i, j] and kept(i))
    (unique because suppression flows strictly down the score order). We
    iterate kept <- F(kept) from kept=valid; after k steps every box of
    suppression-chain depth <= k is final, so at most T iterations — but
    typical chains are short and the loop exits in a few whole-tile matrix
    steps. This replaces the per-box sequential scan with VPU-wide ops.
    """
    t = valid.shape[0]

    def cond(state):
        kept, prev, it = state
        return jnp.logical_and(jnp.any(kept != prev), it < t)

    def body(state):
        kept, _, it = state
        suppressed = jnp.any(adj & kept[:, None], axis=0)
        return valid & ~suppressed, kept, it + 1

    out, _, _ = jax.lax.while_loop(cond, body, (valid, ~valid, 0))
    return out


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "tile", "to_remove"))
def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid=None,
    tile: int = 128,
    to_remove: float = 0.0,
) -> jax.Array:
    """Exact greedy NMS -> keep mask [N]. Tiled TPU-friendly implementation."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    pad = (-n) % tile
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, pad),), constant_values=NEG_INF)
        valid = jnp.pad(valid, ((0, pad),))
    np_ = n + pad
    masked, order = _sort_desc(scores, valid)
    sboxes = boxes[order]
    svalid = masked[order] > NEG_INF

    num_tiles = np_ // tile
    sboxes_t = sboxes.reshape(num_tiles, tile, 4)
    svalid_t = svalid.reshape(num_tiles, tile)

    def outer(i, alive):
        tb = sboxes_t[i]  # [T, 4]
        tv = svalid_t[i]
        # cross-tile: IoU vs ALL boxes, masked to earlier tiles' survivors
        iou_all = box_ops.iou_matrix(tb, sboxes, to_remove=to_remove)  # [T, Np]
        earlier = jnp.arange(np_) < i * tile
        cross_sup = jnp.any(
            (iou_all > iou_threshold) & (alive & earlier)[None, :], axis=1
        )
        tv = tv & ~cross_sup
        # within-tile greedy (strict upper triangle: i suppresses j>i)
        iou_tt = box_ops.iou_matrix(tb, tb, to_remove=to_remove)
        upper = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        )
        adj = (iou_tt > iou_threshold) & upper
        tv = _self_suppress_tile(adj, tv)
        return jax.lax.dynamic_update_slice(alive, tv, (i * tile,))

    alive = jax.lax.fori_loop(0, num_tiles, outer, svalid)
    keep = jnp.zeros((np_,), bool).at[order].set(alive & svalid)
    return keep[:n]


def nms_topk(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    max_out: int,
    valid=None,
    to_remove: float = 0.0,
):
    """NMS then padded top-k: returns (boxes [K,4], scores [K], idx [K], valid [K])."""
    keep = nms_mask(boxes, scores, iou_threshold, valid=valid,
                    to_remove=to_remove)
    sel_scores, idx, sel_valid = box_ops.masked_topk(scores, keep, max_out)
    return boxes[idx], jnp.where(sel_valid, sel_scores, 0.0), idx, sel_valid


def nms_mask_batch(boxes, scores, iou_threshold, valid=None,
                   use_pallas: bool | None = None, to_remove: float = 0.0):
    """Per-image NMS over a batch: [B, N, 4]/[B, N] -> keep [B, N].

    On TPU this is ONE Pallas kernel launch for the whole batch
    (ops/pallas/nms_pl.py); elsewhere a vmap of the jnp tiled NMS.
    """
    from tpuseg.ops import pallas as pallas_pkg

    if use_pallas is None:
        use_pallas = pallas_pkg.pallas_enabled(jax.default_backend() == "tpu")
    if use_pallas:
        from tpuseg.ops.pallas.nms_pl import nms_mask_pallas_batched

        return nms_mask_pallas_batched(boxes, scores, iou_threshold, valid,
                                       interpret=pallas_pkg.pallas_interpret(),
                                       to_remove=to_remove)
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    return jax.vmap(
        lambda b, s, v: nms_mask(b, s, iou_threshold, valid=v,
                                 to_remove=to_remove)
    )(boxes, scores, valid)


def batched_nms_mask_batch(boxes, scores, class_ids, iou_threshold,
                           valid=None, use_pallas: bool | None = None,
                           to_remove: float = 0.0):
    """Class-aware per-image NMS over a batch (coordinate-offset trick)."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = class_ids.astype(boxes.dtype) * (2.0 * max_coord)
    return nms_mask_batch(boxes + offsets[..., None], scores, iou_threshold,
                          valid=valid, use_pallas=use_pallas,
                          to_remove=to_remove)


def batched_nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    class_ids: jax.Array,
    iou_threshold: float,
    valid=None,
    to_remove: float = 0.0,
) -> jax.Array:
    """Class-aware NMS via the coordinate-offset trick (torchvision batched_nms).

    Boxes of different classes are translated to disjoint regions so a single
    class-agnostic NMS never cross-suppresses. Reference semantics:
    detectron's per-class ``boxlist_nms`` loop, collapsed into one kernel.
    """
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = class_ids.astype(boxes.dtype) * (2.0 * max_coord)
    shifted = boxes + offsets[..., None]
    return nms_mask(shifted, scores, iou_threshold, valid=valid,
                    to_remove=to_remove)


def fast_nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    top_k: int = 200,
    second_threshold: bool = False,
    conf_thresh: float = 0.05,
    exact_topk: bool = True,
):
    """YOLACT Fast-NMS (layers/functions/detection.py::fast_nms).

    ``boxes``: [N, 4]; ``scores``: [C, N] per-class scores (no background).
    Returns (boxes [C,K,4], scores [C,K], classes [C,K], keep [C,K]) flattened
    by the caller. Loop-free: per class take top_k, build the IoU matrix, keep
    a box iff no higher-scored same-class box overlaps it above the threshold.

    Candidate selection is EXACT top_k by default (parity with the
    reference's sort); ``exact_topk=False`` opts into TPU ``approx_max_k``
    (recall ~0.99 at rank 200 over ~19k priors — a bench-only speed knob;
    only near-threshold tail candidates can differ).
    """
    c, n = scores.shape
    k = min(top_k, n)
    if exact_topk or jax.default_backend() != "tpu":
        top_scores, idx = jax.lax.top_k(scores, k)  # [C, K]
    else:
        top_scores, idx = jax.lax.approx_max_k(
            scores, k, recall_target=0.99, aggregate_to_topk=True)
        idx = idx.astype(jnp.int32)
    # barrier: without it XLA fuses the gather (and everything upstream of
    # `boxes`) into the K x K IoU computation, recomputing per matrix
    # element — measured 40 ms/batch instead of <1 ms on TPU
    cboxes = jax.lax.optimization_barrier(boxes[idx])  # [C, K, 4]
    iou = box_ops.iou_matrix(cboxes, cboxes)  # [C, K, K]
    upper = (
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    )
    iou = jnp.where(upper[None], iou, 0.0)
    iou_max = jnp.max(iou, axis=-2)  # [C, K] max IoU vs any higher-scored box
    keep = iou_max <= iou_threshold
    if second_threshold:
        keep = keep & (top_scores > conf_thresh)
    classes = jnp.broadcast_to(jnp.arange(c)[:, None], (c, k))
    return cboxes, top_scores, classes, idx, keep
