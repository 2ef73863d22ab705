"""Mask R-CNN training losses (detectron.jittor modeling/{matcher,
balanced_positive_negative_sampler, rpn/loss, roi_heads/*/loss} capability).

Static-shape reformulation of maskrcnn-benchmark's training path:
  * Matcher(hi, lo, allow_low_quality): vectorized argmax matching with
    BELOW_LOW (-1) / BETWEEN (-2) markers and the low-quality forcing.
  * BalancedPositiveNegativeSampler: fixed-size sampling via randomized
    masked top-k (keeps shapes static; the reference's randperm subset).
  * RPN loss: BCE objectness + smooth-L1 (beta 1/9) over 256 sampled
    anchors per image.
  * ROI box loss: 512 sampled proposals (pos fraction 0.25, gt boxes
    appended), CE + class-specific smooth-L1.
  * ROI mask loss: BCE on 28x28 targets sampled from per-gt mask crops
    (the reference rasterizes polygons per proposal on the host; we
    roi-align from fixed-size per-gt bitmask crops on device).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.core import boxes as box_ops

BELOW_LOW = -1
BETWEEN = -2


@dataclass(frozen=True)
class MaskRCNNLossConfig:
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_pos_fraction: float = 0.5
    roi_fg_iou: float = 0.5
    roi_bg_iou: float = 0.5
    roi_batch_per_image: int = 512
    roi_pos_fraction: float = 0.25
    num_classes: int = 81
    box_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    mask_size: int = 28
    gt_mask_crop: int = 112  # per-gt bitmask crop resolution from data layer


def match_targets(
    gt_boxes: jax.Array,  # [G, 4] xyxy (padded)
    gt_valid: jax.Array,  # [G]
    anchors: jax.Array,  # [N, 4]
    high: float,
    low: float,
    allow_low_quality: bool,
    anchor_valid: jax.Array | None = None,  # [N] False = not in the matrix
):
    """Vectorized Matcher. Returns (matched_idx [N] in [0, G), match_label
    [N] in {1 fg, 0 bg, -1 ignore}).

    ``anchor_valid`` excludes anchors from the IoU matrix entirely — for
    padded-canvas anchors that do not exist in the reference's per-image
    anchor grids. Unlike the post-matching straddle/visibility mask
    (which reproduces upstream's discard_cases AFTER low-quality forcing),
    an excluded anchor can neither match nor absorb a gt's forced best —
    the forcing falls to the best real anchor, as upstream."""
    iou = box_ops.iou_matrix(gt_boxes, anchors, to_remove=1.0)  # [G, N]
    # (+1 extents: maskrcnn-benchmark boxlist_iou TO_REMOVE=1)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    if anchor_valid is not None:
        iou = jnp.where(anchor_valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=0)
    best_idx = jnp.argmax(iou, axis=0)
    label = jnp.where(best >= high, 1, jnp.where(best < low, 0, -1))
    if allow_low_quality:
        # for each gt, anchors sharing its max iou become fg; the forced
        # anchor KEEPS its own argmax gt (set_low_quality_matches_ restores
        # all_matches[pred], it does not reassign to the forcing gt)
        gt_best = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou >= gt_best - 1e-7) & (gt_best > 0) & gt_valid[:, None]
        forced = jnp.any(is_best, axis=0)
        label = jnp.where(forced, 1, label)
    label = jnp.where(best < 0, 0, label)  # no valid gt at all -> bg
    return best_idx, label


def balanced_sample(
    label: jax.Array,  # [N] {1, 0, -1}
    key: jax.Array,
    batch_size: int,
    pos_fraction: float,
):
    """Fixed-size balanced sampling -> (sel_idx [B], sel_pos [B], sel_valid [B]).

    Matches BalancedPositiveNegativeSampler: up to B*pf random positives,
    rest random negatives.
    """
    n = label.shape[0]
    kp, kn = jax.random.split(key)
    num_pos_cap = int(batch_size * pos_fraction)
    pos = label == 1
    neg = label == 0
    pos_scores = jax.random.uniform(kp, (n,))
    _, pos_idx, pos_valid = box_ops.masked_topk(pos_scores, pos, num_pos_cap)
    num_pos = jnp.sum(pos_valid)
    neg_scores = jax.random.uniform(kn, (n,))
    _, neg_idx, neg_valid = box_ops.masked_topk(
        neg_scores, neg, batch_size)  # over-sample, trim below
    # keep exactly batch_size - num_pos negatives
    neg_rank = jnp.cumsum(neg_valid) - 1
    neg_keep = neg_valid & (neg_rank < batch_size - num_pos)
    sel_idx = jnp.concatenate([pos_idx, neg_idx])
    sel_pos = jnp.concatenate([pos_valid, jnp.zeros_like(neg_keep)])
    sel_valid = jnp.concatenate([pos_valid, neg_keep])
    # compact to EXACTLY batch_size slots (valid entries number at most
    # batch_size by construction; stable sort keeps positives first).
    # The earlier [batch_size + cap] form made every downstream roi
    # consumer — RoIAlign, box head, mask head — process 25% more rois
    # per train step than the reference's 512.
    order = jnp.argsort(jnp.logical_not(sel_valid), stable=True)[:batch_size]
    return sel_idx[order], sel_pos[order], sel_valid[order]


def smooth_l1(x, t, beta: float = 1.0):
    d = jnp.abs(x - t)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def rpn_loss(
    objectness: jax.Array,  # [B, N] logits
    deltas: jax.Array,  # [B, N, 4]
    anchors: jax.Array,  # [N, 4]
    gt_boxes: jax.Array,  # [B, G, 4]
    gt_valid: jax.Array,  # [B, G]
    key: jax.Array,
    cfg: MaskRCNNLossConfig,
    image_hw: jax.Array | None = None,  # [B, 2] real (h, w) on the canvas
    anchor_inside: jax.Array | None = None,  # [B, N] in real feature extent
):
    """rpn/loss.py RPNLossComputation: sampled BCE + smooth-L1(1/9).

    Anchors not fully inside the real image (STRADDLE_THRESH=0 visibility,
    anchor_generator.py inds_inside) are labelled -1 and never sampled —
    this also excludes every anchor over the zero-padded canvas region,
    which doesn't exist upstream (anchors there are straddling by
    construction since the real image occupies the canvas's top-left).
    ``anchor_inside`` additionally removes padded-canvas anchors from the
    match matrix itself: upstream's per-image grids never contain them, so
    they must not absorb a gt's low-quality forcing away from a real
    anchor (straddling-but-real anchors DO absorb it upstream — matching
    precedes the visibility discard — hence two separate masks).
    """
    b = objectness.shape[0]

    def per_image(obj, dl, gtb, gtv, hw, ins, k):
        midx, label = match_targets(
            gtb, gtv, anchors, cfg.rpn_fg_iou, cfg.rpn_bg_iou, True,
            anchor_valid=ins)
        if hw is not None:
            h = hw[0].astype(anchors.dtype)
            w = hw[1].astype(anchors.dtype)
            visible = (
                (anchors[:, 0] >= 0)
                & (anchors[:, 1] >= 0)
                & (anchors[:, 2] < w)
                & (anchors[:, 3] < h)
            )
            label = jnp.where(visible, label, -1)
        sel_idx, sel_pos, sel_valid = balanced_sample(
            label, k, cfg.rpn_batch_per_image, cfg.rpn_pos_fraction)
        # encode targets for the 256 sampled anchors only (encoding all
        # ~242k anchors per image was pure waste — the loss reads sel_idx)
        tgt = box_ops.encode_boxes(gtb[midx[sel_idx]], anchors[sel_idx])
        # box loss over positives
        l1 = smooth_l1(dl[sel_idx], tgt, beta=1.0 / 9).sum(-1)
        box_l = jnp.sum(jnp.where(sel_pos, l1, 0.0))
        # objectness BCE over sampled
        x = obj[sel_idx]
        t = sel_pos.astype(x.dtype)
        bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
        obj_l = jnp.sum(jnp.where(sel_valid, bce, 0.0))
        return box_l, obj_l, jnp.sum(sel_valid)

    keys = jax.random.split(key, b)
    if image_hw is None:
        box_l, obj_l, n_sampled = jax.vmap(
            lambda o, d, gb, gv, k: per_image(o, d, gb, gv, None, None, k)
        )(objectness, deltas, gt_boxes, gt_valid, keys)
    elif anchor_inside is None:
        box_l, obj_l, n_sampled = jax.vmap(
            lambda o, d, gb, gv, hw, k: per_image(o, d, gb, gv, hw, None, k)
        )(objectness, deltas, gt_boxes, gt_valid, image_hw, keys)
    else:
        box_l, obj_l, n_sampled = jax.vmap(per_image)(
            objectness, deltas, gt_boxes, gt_valid, image_hw, anchor_inside,
            keys)
    total = jnp.maximum(jnp.sum(n_sampled), 1.0)
    return {
        "loss_rpn_box_reg": jnp.sum(box_l) / total,
        "loss_objectness": jnp.sum(obj_l) / total,
    }


def sample_proposals(
    proposals: jax.Array,  # [P, 4]
    prop_valid: jax.Array,  # [P]
    gt_boxes: jax.Array,  # [G, 4]
    gt_classes: jax.Array,  # [G] 0-based
    gt_valid: jax.Array,  # [G]
    key: jax.Array,
    cfg: MaskRCNNLossConfig,
):
    """roi_heads/box_head/loss.py subsample: append gt, match, sample 512."""
    boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    valid = jnp.concatenate([prop_valid, gt_valid])
    midx, label = match_targets(
        gt_boxes, gt_valid, boxes, cfg.roi_fg_iou, cfg.roi_bg_iou, False)
    label = jnp.where(valid, label, -1)
    sel_idx, sel_pos, sel_valid = balanced_sample(
        label, key, cfg.roi_batch_per_image, cfg.roi_pos_fraction)
    sel_boxes = boxes[sel_idx]
    sel_gt = midx[sel_idx]
    cls_target = jnp.where(
        sel_pos, gt_classes[sel_gt] + 1, 0)  # 0 = background
    reg_target = box_ops.encode_boxes(
        gt_boxes[sel_gt], sel_boxes, cfg.box_reg_weights)
    return {
        "boxes": sel_boxes,
        "gt_idx": sel_gt,
        "cls_target": cls_target,
        "reg_target": reg_target,
        "pos": sel_pos,
        "valid": sel_valid,
    }


def box_head_loss(cls_logits, box_deltas, sample, cfg: MaskRCNNLossConfig):
    """CE + class-specific smooth-L1 (normalized by sampled count)."""
    valid = sample["valid"]
    pos = sample["pos"]
    labels = sample["cls_target"]
    logp = jax.nn.log_softmax(cls_logits, -1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    cls_l = jnp.sum(jnp.where(valid, ce, 0.0))
    nc = cfg.num_classes
    d = box_deltas.reshape(-1, nc, 4)
    d_cls = jnp.take_along_axis(
        d, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    l1 = smooth_l1(d_cls, sample["reg_target"], beta=1.0).sum(-1)
    box_l = jnp.sum(jnp.where(pos, l1, 0.0))
    total = jnp.maximum(jnp.sum(valid), 1.0)
    return {"loss_classifier": cls_l / total, "loss_box_reg": box_l / total}


def mask_targets_from_crops(
    rois: jax.Array,  # [S, 4] sampled positive boxes (image coords)
    gt_idx: jax.Array,  # [S]
    gt_boxes: jax.Array,  # [G, 4]
    gt_mask_crops: jax.Array,  # [G, R, R] float 0/1, gt mask in its box frame
    mask_size: int,
):
    """Project gt masks to each roi's 28x28 frame (segmentation_mask
    crop_and_resize semantics, bilinear > 0.5)."""
    from tpuseg.ops.sampling import roi_align

    g, r, _ = gt_mask_crops.shape
    # map roi into its gt's box frame: scale/translate
    gb = gt_boxes[gt_idx]
    scale_x = r / jnp.maximum(gb[:, 2] - gb[:, 0], 1e-4)
    scale_y = r / jnp.maximum(gb[:, 3] - gb[:, 1], 1e-4)
    x1 = (rois[:, 0] - gb[:, 0]) * scale_x
    y1 = (rois[:, 1] - gb[:, 1]) * scale_y
    x2 = (rois[:, 2] - gb[:, 0]) * scale_x
    y2 = (rois[:, 3] - gb[:, 1]) * scale_y
    local = jnp.stack([x1, y1, x2, y2], -1)
    # gt masks on the CHANNEL axis of one feature map: pooling G channels
    # with the separable-matmul path and selecting gt_idx afterwards is
    # value-identical to per-roi 1-channel pooling, but 1-wide-lane gathers
    # are pathological on TPU (this call was 1.8 s of the 2.0 s bs=8 Mask
    # R-CNN train step; now MXU matmuls)
    s = rois.shape[0]
    crops = jnp.transpose(gt_mask_crops, (1, 2, 0))[None]  # [1, R, R, G]
    out = roi_align(
        crops, local, jnp.zeros((s,), jnp.int32), output_size=mask_size,
        spatial_scale=1.0, sampling_ratio=2, aligned=True, group_size=s)
    out = jnp.take_along_axis(
        out, gt_idx[:, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
    return (out > 0.5).astype(jnp.float32)


def mask_head_loss(mask_logits, sample, gt_classes, targets28,
                   cfg: MaskRCNNLossConfig):
    """BCE on the gt-class channel over positive samples.

    mask_logits [S, 28, 28, num_classes]; targets28 [S, 28, 28].
    """
    labels = sample["cls_target"]  # 1-based fg labels
    x = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None], axis=-1)[..., 0]
    return mask_head_loss_selected(x, sample, targets28, cfg)


def mask_head_loss_selected(x, sample, targets28, cfg: MaskRCNNLossConfig):
    """BCE over positives, gt-class channel already selected ([S, 28, 28])."""
    t = targets28
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per = bce.mean(axis=(1, 2))
    pos = sample["pos"]
    total = jnp.maximum(jnp.sum(pos), 1.0)
    return {"loss_mask": jnp.sum(jnp.where(pos, per, 0.0)) / total}
