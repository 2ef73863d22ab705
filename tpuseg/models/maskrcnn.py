"""Mask R-CNN (detectron.jittor GeneralizedRCNN capability, R-50-FPN).

Reference stack (SURVEY.md §2.1, §3.1; maskrcnn-benchmark port): ResNet-50
FrozenBN backbone -> FPN (P2..P6) -> RPN (per-level top-1000, NMS 0.7,
cross-level top-1000) -> RoIAlign 7x7 box head (2FC -> 81-way cls +
class-specific regression; per-class NMS 0.5, <=100 dets) -> RoIAlign 14x14
mask head (4conv + deconv -> 28x28 per-class masks).

TPU-native shape policy: ONE jit program per (canvas, batch) pair.
Images are resized shortest-edge-800 (cap 1333) on device and placed on a
static canvas (800x1344 landscape / 1344x800 portrait — conv zero-padding
makes canvas features bit-identical to the unpadded reference inside the
real image region). Anchors over the padded region are masked to -inf
objectness, which reproduces the reference's per-image anchor grids.
Everything downstream is padded/ranked, never filtered:
  pre-NMS 1000/level -> post-NMS <=1000/level -> 1000 global proposals ->
  80-class decode -> top-2048 class-box candidates -> batched class-aware
  NMS -> 100 detections -> mask head.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import boxes as box_ops
from tpuseg.nn import fpn as fpn_nn
from tpuseg.nn import layers as L
from tpuseg.nn import resnet as resnet_nn
from tpuseg.ops import nms as nms_ops
from tpuseg.ops import sampling


@dataclass(frozen=True)
class MaskRCNNConfig:
    depth: int = 50
    freeze_at: int = 2  # FREEZE_CONV_BODY_AT (stem + layer1)
    # anchors (maskrcnn-benchmark FPN defaults)
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_stride: tuple = (4, 8, 16, 32, 64)
    # rpn test-time
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    fpn_post_nms_top_n: int = 1000
    # train-time proposal budget (maskrcnn-benchmark *_TRAIN knobs)
    rpn_pre_nms_top_n_train: int = 2000
    fpn_post_nms_top_n_train: int = 2000
    # FPN_POST_NMS_PER_BATCH (default True upstream, training only): the
    # post-NMS top-n is taken over the concatenated batch, not per image
    fpn_post_nms_per_batch: bool = False
    # roi box head
    num_classes: int = 81
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 2
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    box_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    pre_final_nms_topk: int = 2048  # static cap on class-box candidates
    approx_topk: bool = False  # approx_max_k option (no gain measured here)
    # mask head; mask_on=False is the Faster R-CNN configuration
    # (MODEL.MASK_ON in the reference's e2e_faster_rcnn_*.yaml family)
    mask_on: bool = True
    mask_resolution: int = 14
    mask_out: int = 28
    fpn_channels: int = 256


# ---------------------------------------------------------------------------
# Anchors (detectron/modeling/rpn/anchor_generator.py semantics)
# ---------------------------------------------------------------------------


def _generate_cell_anchors(size: float, ratios, base: float = None) -> np.ndarray:
    """One stride's A anchors centered at the cell origin (Caffe2 generate_anchors)."""
    # Caffe2 algorithm: base anchor [0, 0, stride-1, stride-1] reshaped by
    # ratio then scaled — reproduced exactly (affects boxes by <1px but
    # matters for weight parity).
    stride = base
    anchor = np.array([1, 1, stride, stride], np.float64) - 1
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    x_ctr = anchor[0] + 0.5 * (w - 1)
    y_ctr = anchor[1] + 0.5 * (h - 1)
    size_ratios = w * h / np.asarray(ratios, np.float64)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios, np.float64))
    anchors = np.stack(
        [
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        ],
        axis=1,
    )
    # scale enumeration
    scale = size / stride
    out = []
    for a in anchors:
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        xc = a[0] + 0.5 * (w - 1)
        yc = a[1] + 0.5 * (h - 1)
        ws = w * scale
        hs = h * scale
        out.append(
            [xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
             xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)]
        )
    return np.asarray(out, np.float64)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def fpn_level_hw(h: int, w: int, stride: int) -> tuple:
    """Feature extent at a pyramid level: successive ceil-halvings (conv
    arithmetic: stem s2 p3 k7, pool s2 p1 k3, stage s2 convs, P6 pool k1 s2
    all reduce by ceil(n/2)) == ceil(n / stride)."""
    return _ceil_div(h, stride), _ceil_div(w, stride)


@functools.lru_cache(maxsize=16)
def make_anchors_np(cfg: MaskRCNNConfig, canvas_h: int, canvas_w: int):
    """Per-level anchors [Hl*Wl*A, 4] over the static canvas."""
    out = []
    for size, stride in zip(cfg.anchor_sizes, cfg.anchor_stride):
        cell = _generate_cell_anchors(size, cfg.anchor_ratios, base=stride)
        hl, wl = fpn_level_hw(canvas_h, canvas_w, stride)
        sx = np.arange(wl) * stride
        sy = np.arange(hl) * stride
        shift_x, shift_y = np.meshgrid(sx, sy)
        shifts = np.stack(
            [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], 1
        )
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return out


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def rpn_head(params: dict, feats: list):
    """Shared RPN head over levels -> per-level (objectness, deltas)."""
    logits, deltas = [], []
    for f in feats:
        t = L.relu(L.conv2d(f, params["conv"], padding=1))
        b = t.shape[0]
        logits.append(L.conv2d(t, params["cls"]).reshape(b, -1))
        deltas.append(L.conv2d(t, params["bbox"]).reshape(b, -1, 4))
    return logits, deltas


def box_head(params: dict, pooled: jax.Array):
    """[N, 7, 7, C] -> (cls_logits [N, 81], box_deltas [N, 81*4])."""
    n = pooled.shape[0]
    x = pooled.reshape(n, -1)
    x = L.relu(L.linear(x, params["fc6"]))
    x = L.relu(L.linear(x, params["fc7"]))
    return L.linear(x, params["cls_score"]), L.linear(x, params["bbox_pred"])


def mask_head(params: dict, pooled: jax.Array, class_sel=None):
    """[N, 14, 14, C] -> [N, 28, 28, num_classes] logits.

    ``class_sel`` [N] int: compute ONLY that class's channel per roi
    ([N, 28, 28]) by gathering the 1x1 predictor kernel column — identical
    to slicing the full output, but the training backward never
    materialises the [N, 28, 28, num_classes] tensor (1.4 GB of the bs=8
    Mask R-CNN train step's HBM overflow) and the predictor matmul shrinks
    num_classes-fold.
    """
    x = pooled
    for i in range(1, 5):
        x = L.relu(L.conv2d(x, params[f"mask_fcn{i}"], padding=1))
    x = L.relu(L.conv_transpose2d(x, params["conv5_mask"], stride=2))
    if class_sel is None:
        return L.conv2d(x, params["mask_fcn_logits"])
    w = params["mask_fcn_logits"]["weight"][0, 0]  # [C, num_classes]
    wsel = jnp.take(w, class_sel, axis=1).T.astype(x.dtype)  # [N, C]
    bsel = params["mask_fcn_logits"]["bias"][class_sel].astype(x.dtype)
    return jnp.einsum("nhwc,nc->nhw", x, wsel) + bsel[:, None, None]


# ---------------------------------------------------------------------------
# RPN proposal generation (rpn/inference.py)
# ---------------------------------------------------------------------------


def anchor_inside_mask(image_hw: jax.Array, stride: int, hl: int, wl: int,
                       num_anchors: int) -> jax.Array:
    """[B, hl*wl*A] validity of anchors whose grid cell lies within the
    real (unpadded) feature extent of each image — reproduces the
    reference's per-image anchor grids on our static padded canvas.
    Shared by RPN proposals and the RetinaNet inference + train paths."""
    b = image_hw.shape[0]
    gy = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 1)
    real_h = -(-image_hw[:, 0] // stride)  # ceil div, [B]
    real_w = -(-image_hw[:, 1] // stride)
    inside = (
        (gy[None] < real_h[:, None, None])
        & (gx[None] < real_w[:, None, None])
    )  # [B, hl, wl]
    return jnp.repeat(inside.reshape(b, -1), num_anchors, axis=1)


def rpn_proposals(
    logits: list,
    deltas: list,
    anchors: list,
    image_hw: jax.Array,  # [B, 2] real (h, w) on the canvas
    cfg: MaskRCNNConfig,
    canvas_hw: tuple,
):
    """-> (proposals [B, P, 4], scores [B, P], valid [B, P]); P = fpn top n."""
    b = logits[0].shape[0]
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for li, (lg, dl, an) in enumerate(zip(logits, deltas, anchors)):
        stride = cfg.anchor_stride[li]
        hl, wl = fpn_level_hw(canvas_hw[0], canvas_hw[1], stride)
        a = an.shape[0] // (hl * wl)
        inside = anchor_inside_mask(image_hw, stride, hl, wl, a)

        k = min(cfg.rpn_pre_nms_top_n, lg.shape[1])
        obj = jax.nn.sigmoid(lg)
        _, idx, top_valid = box_ops.masked_topk(
            lg, inside, k, approx=cfg.approx_topk)

        def per_image(dl_i, idx_i, hw_i):
            boxes = box_ops.decode_boxes(dl_i[idx_i], an[idx_i],
                                         weights=(1.0, 1.0, 1.0, 1.0))
            boxes = box_ops.clip_to_image(boxes, hw_i[0] - 1, hw_i[1] - 1)
            return boxes

        boxes = jax.vmap(per_image)(dl, idx, image_hw)
        # upstream remove_small_boxes uses +1 extents (ws = x2-x1+1 >= min):
        # at the shipped MIN_SIZE=0 every clipped box is kept, incl.
        # degenerate ones — matching boxlist_ops.remove_small_boxes
        w1 = boxes[..., 2] - boxes[..., 0] + 1.0
        h1 = boxes[..., 3] - boxes[..., 1] + 1.0
        valid = top_valid & (w1 >= cfg.rpn_min_size) & (h1 >= cfg.rpn_min_size)
        scores = jnp.take_along_axis(obj, idx, axis=1)

        keep = nms_ops.nms_mask_batch(
            boxes, scores, cfg.rpn_nms_thresh, valid=valid, to_remove=1.0)
        lvl_boxes.append(boxes)
        lvl_scores.append(jnp.where(keep, scores, 0.0))
        lvl_valid.append(keep)
    all_boxes = jnp.concatenate(lvl_boxes, 1)
    all_scores = jnp.concatenate(lvl_scores, 1)
    all_valid = jnp.concatenate(lvl_valid, 1)
    if cfg.fpn_post_nms_per_batch:
        # FPN_POST_NMS_PER_BATCH=True (train default): upstream
        # rpn/inference.py select_over_all_levels takes ONE top-n over the
        # whole concatenated batch. Realised as a batch-wide kth-score gate
        # on the validity mask so shapes stay padded [B, P]; the per-image
        # top-k below then passes everything that survived the gate.
        k = min(cfg.fpn_post_nms_top_n, all_scores.size)
        flat = jnp.where(all_valid, all_scores, -jnp.inf).reshape(-1)
        kth = jax.lax.top_k(flat, k)[0][-1]
        all_valid = all_valid & (all_scores >= kth)
    top_s, idx, valid = box_ops.masked_topk(
        all_scores, all_valid, cfg.fpn_post_nms_top_n
    )
    boxes = jnp.take_along_axis(all_boxes, idx[..., None], axis=1)
    return boxes, top_s, valid


# ---------------------------------------------------------------------------
# FPN pooler (poolers.py LevelMapper + RoIAlign)
# ---------------------------------------------------------------------------


def assign_levels(boxes: jax.Array, k_min=2, k_max=5, canonical_scale=224,
                  canonical_level=4, eps=1e-6):
    # upstream LevelMapper feeds sqrt(BoxList.area()) whose xyxy mode uses
    # TO_REMOVE=1 extents — boxes at a 224*2^k cut point must not drift to
    # a different pyramid level than the reference
    s = jnp.sqrt(box_ops.area(boxes, to_remove=1.0))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + eps))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32) - k_min


def pooled_roi_features(feats: list, boxes: jax.Array, batch_idx: jax.Array,
                        resolution: int, sampling_ratio: int,
                        strides=(4, 8, 16, 32), use_pallas: bool | None = None):
    """Multi-level RoIAlign: each box pooled from its assigned FPN level
    (detectron Pooler semantics). On TPU the Pallas kernel
    (ops/pallas/roi_align_pl.py — 2.5x the XLA gather) is used; elsewhere
    the fused-gather jnp version."""
    from tpuseg.ops.pallas.roi_align_pl import clamp_levels_to_window

    levels = assign_levels(boxes)
    # high-aspect boxes whose extent overflows the Pallas DMA window pool
    # from the next coarser level; applied on BOTH paths so they agree
    levels = clamp_levels_to_window(
        tuple(feats), boxes, levels, tuple(strides))
    from tpuseg.ops import pallas as pallas_pkg

    if use_pallas is None:
        use_pallas = pallas_pkg.pallas_enabled(jax.default_backend() == "tpu")
    if use_pallas:
        from tpuseg.ops.pallas.roi_align_pl import make_differentiable_pooler

        pooler = make_differentiable_pooler(
            resolution, sampling_ratio, tuple(strides),
            interpret=pallas_pkg.pallas_interpret())
        return pooler(tuple(feats), boxes, batch_idx, levels)
    return sampling.multilevel_roi_align(
        tuple(feats), boxes, batch_idx, levels, output_size=resolution,
        sampling_ratio=sampling_ratio, strides=strides)


# ---------------------------------------------------------------------------
# Full inference pipeline
# ---------------------------------------------------------------------------


def backbone_fpn(params: dict, images: jax.Array, cfg: MaskRCNNConfig):
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True, freeze_at=cfg.freeze_at)
    feats = resnet_nn.forward(params["backbone"], images, rcfg)
    pyr = fpn_nn.fpn_forward(params["fpn"], feats, with_p6=True)
    return [pyr["p2"], pyr["p3"], pyr["p4"], pyr["p5"], pyr["p6"]]


def forward_inference(params: dict, images: jax.Array, image_hw: jax.Array,
                      cfg: MaskRCNNConfig):
    """images [B,Hc,Wc,3] preprocessed on static canvas; image_hw [B,2] real
    sizes. -> dict of padded detections incl. 28x28 per-class masks."""
    b, ch, cw, _ = images.shape
    pyramid = backbone_fpn(params, images, cfg)
    logits, deltas = rpn_head(params["rpn"], pyramid)
    anchors = [jnp.asarray(a) for a in make_anchors_np(cfg, ch, cw)]
    proposals, p_scores, p_valid = rpn_proposals(
        logits, deltas, anchors, image_hw, cfg, (ch, cw))

    # ---- box head over B*P rois
    p = proposals.shape[1]
    flat_boxes = proposals.reshape(b * p, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), p)
    pooled = pooled_roi_features(
        pyramid[:4], flat_boxes, flat_bidx, cfg.pooler_resolution,
        cfg.pooler_sampling_ratio)
    cls_logits, box_deltas = box_head(params["box_head"], pooled)
    scores = jax.nn.softmax(cls_logits, -1).reshape(b, p, cfg.num_classes)
    box_deltas = box_deltas.reshape(b, p, cfg.num_classes * 4)

    def per_image_cands(props, props_valid, sc, dl, hw):
        # class-specific decode (skip background col 0)
        decoded = box_ops.decode_boxes(
            dl, props, weights=cfg.box_reg_weights)  # [P, 81*4]
        decoded = decoded.reshape(p, cfg.num_classes, 4)[:, 1:, :]
        decoded = box_ops.clip_to_image(decoded, hw[0] - 1, hw[1] - 1)
        cls_scores = sc[:, 1:]  # [P, 80]
        # upstream PostProcessor clips with remove_empty=False and filters
        # on score only (inference.py filter_results) — no size filter
        cand_valid = props_valid[:, None] & (cls_scores > cfg.score_thresh)
        flat_s = cls_scores.reshape(-1)
        flat_b = decoded.reshape(-1, 4)
        flat_c = jnp.tile(jnp.arange(cfg.num_classes - 1), (p,))
        top_s, sel, sel_valid = box_ops.masked_topk(
            flat_s, cand_valid.reshape(-1), cfg.pre_final_nms_topk,
            approx=cfg.approx_topk)
        # barrier: keep XLA from fusing the 80-class decode into the
        # candidate gather (same pathology as fast_nms — see ops/nms.py)
        flat_b = jax.lax.optimization_barrier(flat_b)
        return flat_b[sel], top_s, flat_c[sel], sel_valid

    cboxes, top_s, cclasses, sel_valid = jax.vmap(per_image_cands)(
        proposals, p_valid, scores, box_deltas, image_hw)
    # class-aware NMS across the batch in one kernel (vmap-free)
    keep = nms_ops.batched_nms_mask_batch(
        cboxes, top_s, cclasses, cfg.nms_thresh, valid=sel_valid,
        to_remove=1.0)

    def per_image_final(cb, ts, cc, kp):
        fin_s, fidx, fvalid = box_ops.masked_topk(
            jnp.where(kp, ts, -jnp.inf), kp, cfg.detections_per_img)
        return cb[fidx], jnp.where(fvalid, fin_s, 0.0), cc[fidx], fvalid

    det_boxes, det_scores, det_classes, det_valid = jax.vmap(
        per_image_final)(cboxes, top_s, cclasses, keep)

    out = {
        "boxes": det_boxes,
        "scores": det_scores,
        "classes": det_classes,  # 0-based (no background)
        "valid": det_valid,
        "proposals": proposals,
        "proposal_valid": p_valid,
    }
    if not cfg.mask_on:  # Faster R-CNN: boxes only
        return out

    # ---- mask head on the detections
    d = cfg.detections_per_img
    flat_det = det_boxes.reshape(b * d, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), d)
    mask_pooled = pooled_roi_features(
        pyramid[:4], flat_det, flat_bidx, cfg.mask_resolution,
        cfg.pooler_sampling_ratio)
    # the detected class is known before the predictor runs, so only that
    # class's channel is computed (identical to slicing the full
    # [B*D, 28, 28, num_classes] output, which would cost num_classes-fold
    # HBM traffic on the hot path)
    cls_idx = det_classes + 1  # logits include background channel
    masks = mask_head(params["mask_head"], mask_pooled,
                      class_sel=cls_idx.reshape(b * d))
    masks = masks.reshape(b, d, cfg.mask_out, cfg.mask_out)
    out["masks"] = jax.nn.sigmoid(masks)  # [B, 100, 28, 28] probabilities
    return out


# ---------------------------------------------------------------------------
# Training forward (GeneralizedRCNN.forward with targets; engine/trainer.py)
# ---------------------------------------------------------------------------


def forward_train_losses(
    params: dict,
    images: jax.Array,  # [B, Hc, Wc, 3] preprocessed canvas
    image_hw: jax.Array,  # [B, 2]
    targets: dict,  # boxes [B,G,4], classes [B,G] (0-based, -1 pad),
    #                 mask_crops [B,G,R,R] float
    key: jax.Array,
    cfg: MaskRCNNConfig,
    loss_cfg=None,
):
    """One training forward -> dict of the reference's five losses."""
    from tpuseg.models import maskrcnn_loss as ML

    if loss_cfg is None:
        loss_cfg = ML.MaskRCNNLossConfig(num_classes=cfg.num_classes)
    b, ch, cw, _ = images.shape
    pyramid = backbone_fpn(params, images, cfg)
    logits, deltas = rpn_head(params["rpn"], pyramid)
    anchors_l = [jnp.asarray(a) for a in make_anchors_np(cfg, ch, cw)]
    anchors = jnp.concatenate(anchors_l, axis=0)
    all_logits = jnp.concatenate(
        [l.astype(jnp.float32) for l in logits], axis=1)
    all_deltas = jnp.concatenate(
        [d.astype(jnp.float32) for d in deltas], axis=1)

    gt_boxes = targets["boxes"]
    gt_classes = targets["classes"]
    gt_valid = gt_classes >= 0

    inside_l = []
    for li, an in enumerate(anchors_l):
        stride = cfg.anchor_stride[li]
        hl, wl = fpn_level_hw(ch, cw, stride)
        inside_l.append(anchor_inside_mask(
            image_hw, stride, hl, wl, an.shape[0] // (hl * wl)))
    inside = jnp.concatenate(inside_l, axis=1)  # [B, N]

    k_rpn, k_roi = jax.random.split(key)
    losses = ML.rpn_loss(
        all_logits, all_deltas, anchors, gt_boxes, gt_valid, k_rpn, loss_cfg,
        image_hw=image_hw, anchor_inside=inside)

    # train-time proposal budget (PRE_NMS_TOP_N_TRAIN / FPN_POST_..._TRAIN)
    from dataclasses import replace as _replace

    train_cfg = _replace(
        cfg,
        rpn_pre_nms_top_n=cfg.rpn_pre_nms_top_n_train,
        fpn_post_nms_top_n=cfg.fpn_post_nms_top_n_train,
        fpn_post_nms_per_batch=True)
    # detach BEFORE proposal generation (upstream rpn.py passes
    # objectness/box_regression .detach()ed into the post-processor):
    # gradients must not be traced into the NMS — the Pallas kernel has no
    # JVP rule, so a late stop_gradient still fails to linearize on TPU
    proposals, p_scores, p_valid = rpn_proposals(
        [jax.lax.stop_gradient(l) for l in logits],
        [jax.lax.stop_gradient(d) for d in deltas],
        anchors_l, image_hw, train_cfg, (ch, cw))

    keys = jax.random.split(k_roi, b)
    sample = jax.vmap(
        lambda p_, pv, gb, gc, gv, k: ML.sample_proposals(
            p_, pv, gb, gc, gv, k, loss_cfg)
    )(proposals, p_valid, gt_boxes, gt_classes, gt_valid, keys)

    s = sample["boxes"].shape[1]
    flat_boxes = sample["boxes"].reshape(b * s, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), s)
    pooled = pooled_roi_features(
        pyramid[:4], flat_boxes, flat_bidx, cfg.pooler_resolution,
        cfg.pooler_sampling_ratio)
    cls_logits, box_deltas = box_head(params["box_head"], pooled)
    flat_sample = {k_: v.reshape((b * s,) + v.shape[2:])
                   for k_, v in sample.items()}
    losses.update(ML.box_head_loss(
        cls_logits.astype(jnp.float32), box_deltas.astype(jnp.float32),
        flat_sample, loss_cfg))

    # mask head on the POSITIVE sampled rois only (skipped in the Faster
    # R-CNN config). Upstream ROIMaskHead trains on positives only
    # (roi_heads/mask_head/mask_head.py::keep_only_positive_boxes);
    # balanced_sample compacts positives into the first
    # roi_batch_per_image * roi_pos_fraction slots, so a static prefix
    # slice covers every positive — value-identical loss at 1/4 the
    # pooling/conv work (the mask branch was 144 ms of the 318 ms bs=8
    # train step on all 512 rois: results/profile_maskrcnn_train.py)
    if cfg.mask_on:
        m = int(loss_cfg.roi_batch_per_image * loss_cfg.roi_pos_fraction)
        mask_boxes = sample["boxes"][:, :m]
        mask_pooled = pooled_roi_features(
            pyramid[:4], mask_boxes.reshape(b * m, 4),
            jnp.repeat(jnp.arange(b), m), cfg.mask_resolution,
            cfg.pooler_sampling_ratio)
        flat_msample = {k_: v[:, :m].reshape((b * m,) + v.shape[2:])
                        for k_, v in sample.items()}
        # gt-class channel only: the loss never reads the other
        # num_classes-1 channels (mask_head docstring)
        mask_x = mask_head(params["mask_head"], mask_pooled,
                           class_sel=flat_msample["cls_target"])

        def per_image_targets(rois, gt_idx, gb, crops):
            return ML.mask_targets_from_crops(
                rois, gt_idx, gb, crops, cfg.mask_out)

        t28 = jax.vmap(per_image_targets)(
            mask_boxes, sample["gt_idx"][:, :m], gt_boxes,
            targets["mask_crops"])
        losses.update(ML.mask_head_loss_selected(
            mask_x.astype(jnp.float32),
            flat_msample,
            t28.reshape(b * m, cfg.mask_out, cfg.mask_out),
            loss_cfg))
    losses["total"] = sum(losses.values())
    return losses


# ---------------------------------------------------------------------------
# Init (shape-compatible with converted detectron weights)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: MaskRCNNConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 32))
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True)
    fc = cfg.fpn_channels
    na = len(cfg.anchor_ratios)
    nc = cfg.num_classes
    pr = cfg.pooler_resolution
    params = {
        "backbone": resnet_nn.init_params(next(keys), rcfg, dtype),
        "fpn": fpn_nn.fpn_init(next(keys), (256, 512, 1024, 2048), fc, dtype),
        "rpn": {
            "conv": L.conv_params(next(keys), 3, 3, fc, fc, dtype=dtype),
            "cls": L.conv_params(next(keys), 1, 1, fc, na, dtype=dtype),
            "bbox": L.conv_params(next(keys), 1, 1, fc, na * 4, dtype=dtype),
        },
        "box_head": {
            "fc6": L.linear_params(next(keys), pr * pr * fc, 1024, dtype=dtype),
            "fc7": L.linear_params(next(keys), 1024, 1024, dtype=dtype),
            "cls_score": L.linear_params(next(keys), 1024, nc, dtype=dtype),
            "bbox_pred": L.linear_params(next(keys), 1024, nc * 4, dtype=dtype),
        },
    }
    if cfg.mask_on:
        params["mask_head"] = {
            **{
                f"mask_fcn{i}": L.conv_params(next(keys), 3, 3, fc, fc, dtype=dtype)
                for i in range(1, 5)
            },
            "conv5_mask": {
                "weight": jax.random.normal(next(keys), (2, 2, fc, fc), dtype) * 0.01,
                "bias": jnp.zeros((fc,), dtype),
            },
            "mask_fcn_logits": L.conv_params(next(keys), 1, 1, fc, nc, dtype=dtype),
        }
    return params
