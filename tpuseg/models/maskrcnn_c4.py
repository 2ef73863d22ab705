"""Mask R-CNN R-50-C4 variant (the config the reference demos first:
``e2e_mask_rcnn_R_50_C4_1x.yaml``, README.md:263-284 — PRE_NMS_TOP_N_TEST
6000 / POST_NMS_TOP_N_TEST 1000 are exactly its quoted values).

Architecture (maskrcnn-benchmark C4 path): ResNet stem+layer1-3 -> C4
(stride 16, 1024ch) -> single-level RPN with 15 anchors/cell (5 sizes x 3
ratios) -> RoIAlign 14x14 -> res5 (layer4) as the box feature extractor ->
global avgpool -> 81-way cls + class-specific regression; the mask head
re-runs res5 on the kept detections and predicts 14x14 masks via
deconv(2048->256) + 1x1 conv (MaskRCNNC4Predictor).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import boxes as box_ops
from tpuseg.models import maskrcnn as M
from tpuseg.nn import layers as L
from tpuseg.nn import resnet as resnet_nn
from tpuseg.ops import nms as nms_ops
from tpuseg.ops import sampling


@dataclass(frozen=True)
class MaskRCNNC4Config:
    depth: int = 50
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_stride: int = 16
    rpn_pre_nms_top_n: int = 6000  # README.md:267
    rpn_post_nms_top_n: int = 1000  # README.md:268
    # C4 train-time RPN budgets (maskrcnn-benchmark defaults.py — the C4
    # yamls don't override them, unlike the FPN 2000/2000)
    rpn_pre_nms_top_n_train: int = 12000
    rpn_post_nms_top_n_train: int = 2000
    rpn_nms_thresh: float = 0.7
    num_classes: int = 81
    pooler_resolution: int = 14
    # 0 = adaptive ceil(roi/out) grid — the upstream default the C4 configs
    # inherit (the reference's C4 yaml sets no POOLER_SAMPLING_RATIO;
    # README.md:263-284); FPN configs override to 2 in yaml
    pooler_sampling_ratio: int = 0
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    box_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    pre_final_nms_topk: int = 2048
    mask_on: bool = True  # False = Faster R-CNN C4 (e2e_faster_rcnn_R_50_C4)
    mask_out: int = 14


@functools.lru_cache(maxsize=8)
def make_anchors_np(cfg: MaskRCNNC4Config, canvas_h: int, canvas_w: int):
    cells = [
        M._generate_cell_anchors(s, cfg.anchor_ratios, base=cfg.anchor_stride)
        for s in cfg.anchor_sizes
    ]  # [size][ratio, 4]
    # RATIO-major cell order (Caffe2 generate_anchors: _ratio_enum then
    # _scale_enum per ratio) so converted checkpoints' 15 RPN head
    # channels pair with the anchors they were trained on
    cell = np.stack(cells, axis=0).transpose(1, 0, 2).reshape(-1, 4)
    hl, wl = M.fpn_level_hw(canvas_h, canvas_w, cfg.anchor_stride)
    sx = np.arange(wl) * cfg.anchor_stride
    sy = np.arange(hl) * cfg.anchor_stride
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], 1)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4).astype(
        np.float32)


def backbone_c4(params: dict, images: jax.Array, cfg: MaskRCNNC4Config):
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True)
    x = L.conv2d(images, params["backbone"]["stem"]["conv"], stride=2,
                 padding=3)
    x = L.relu(L.batch_norm_inference(x, params["backbone"]["stem"]["bn"],
                                      eps=0.0))
    x = L.max_pool2d(x, 3, 2, padding=1)
    for si, name in enumerate(["layer1", "layer2", "layer3"]):
        stride = 1 if si == 0 else 2
        for bi, bp in enumerate(params["backbone"][name]):
            x = resnet_nn.bottleneck(x, bp, stride if bi == 0 else 1, 1, rcfg)
    return x  # C4 [B, H/16, W/16, 1024]


def res5_head(params: dict, pooled: jax.Array, cfg: MaskRCNNC4Config):
    """layer4 on pooled 14x14 rois -> [N, 7, 7, 2048]."""
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True)
    x = pooled
    for bi, bp in enumerate(params["layer4"]):
        x = resnet_nn.bottleneck(x, bp, 2 if bi == 0 else 1, 1, rcfg)
    return x


def _single_level_cfg(cfg: MaskRCNNC4Config, train: bool = False):
    """FPN-shaped config so the C4 path reuses M.rpn_proposals with one
    level. Train mode swaps in the 12000/2000 C4 train budgets."""
    pre = cfg.rpn_pre_nms_top_n_train if train else cfg.rpn_pre_nms_top_n
    post = cfg.rpn_post_nms_top_n_train if train else cfg.rpn_post_nms_top_n
    return M.MaskRCNNConfig(
        rpn_pre_nms_top_n=pre,
        rpn_post_nms_top_n=post,
        rpn_nms_thresh=cfg.rpn_nms_thresh,
        fpn_post_nms_top_n=post,
        fpn_post_nms_per_batch=False,
        anchor_stride=(cfg.anchor_stride,),
        anchor_ratios=tuple([r for _ in cfg.anchor_sizes
                             for r in cfg.anchor_ratios]),
    )


def forward_inference(params: dict, images: jax.Array, image_hw: jax.Array,
                      cfg: MaskRCNNC4Config):
    b, ch, cw, _ = images.shape
    c4 = backbone_c4(params, images, cfg)
    logits, deltas = M.rpn_head(params["rpn"], [c4])
    anchors = jnp.asarray(make_anchors_np(cfg, ch, cw))
    # reuse the FPN proposal machinery with one level
    proposals, p_scores, p_valid = M.rpn_proposals(
        logits, deltas, [anchors], image_hw, _single_level_cfg(cfg),
        (ch, cw))

    p = proposals.shape[1]
    flat_boxes = proposals.reshape(b * p, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), p)
    pooled = sampling.roi_align(
        c4, flat_boxes, flat_bidx, output_size=cfg.pooler_resolution,
        spatial_scale=1.0 / cfg.anchor_stride,
        sampling_ratio=cfg.pooler_sampling_ratio, group_size=p)
    feats = res5_head(params["roi_head"], pooled, cfg)
    x = jnp.mean(feats, axis=(1, 2))  # global avgpool
    cls_logits = L.linear(x, params["box_pred"]["cls_score"])
    box_deltas = L.linear(x, params["box_pred"]["bbox_pred"])
    scores = jax.nn.softmax(
        cls_logits.astype(jnp.float32), -1).reshape(b, p, cfg.num_classes)
    box_deltas = box_deltas.astype(jnp.float32).reshape(
        b, p, cfg.num_classes * 4)

    def per_image(props, props_valid, sc, dl, hw):
        decoded = box_ops.decode_boxes(dl, props, weights=cfg.box_reg_weights)
        decoded = decoded.reshape(p, cfg.num_classes, 4)[:, 1:, :]
        decoded = box_ops.clip_to_image(decoded, hw[0] - 1, hw[1] - 1)
        cls_scores = sc[:, 1:]
        # upstream PostProcessor (shared by C4 and FPN) clips with
        # remove_empty=False and filters on score only
        cand_valid = (props_valid[:, None]
                      & (cls_scores > cfg.score_thresh))
        top_s, sel, sel_valid = box_ops.masked_topk(
            cls_scores.reshape(-1), cand_valid.reshape(-1),
            cfg.pre_final_nms_topk)
        cboxes = decoded.reshape(-1, 4)[sel]
        cclasses = jnp.tile(jnp.arange(cfg.num_classes - 1), (p,))[sel]
        keep = nms_ops.batched_nms_mask(
            cboxes, top_s, cclasses, cfg.nms_thresh, valid=sel_valid,
            to_remove=1.0)
        fin_s, fidx, fvalid = box_ops.masked_topk(
            jnp.where(keep, top_s, -jnp.inf), keep, cfg.detections_per_img)
        return cboxes[fidx], jnp.where(fvalid, fin_s, 0.0), cclasses[fidx], fvalid

    det_boxes, det_scores, det_classes, det_valid = jax.vmap(per_image)(
        proposals, p_valid, scores, box_deltas, image_hw)

    out = {
        "boxes": det_boxes,
        "scores": det_scores,
        "classes": det_classes,
        "valid": det_valid,
        "proposals": proposals,
        "proposal_valid": p_valid,
    }
    if not cfg.mask_on:  # Faster R-CNN C4: boxes only
        return out

    # mask head: res5 again on kept detections, deconv + 1x1
    d = cfg.detections_per_img
    flat_det = det_boxes.reshape(b * d, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), d)
    mpool = sampling.roi_align(
        c4, flat_det, flat_bidx, output_size=cfg.pooler_resolution,
        spatial_scale=1.0 / cfg.anchor_stride,
        sampling_ratio=cfg.pooler_sampling_ratio, group_size=d)
    mfeats = res5_head(params["roi_head"], mpool, cfg)
    x = L.relu(L.conv_transpose2d(mfeats, params["mask_pred"]["conv5_mask"],
                                  stride=2))
    # compute only the detected class's predictor column (identical to
    # slicing the full [B*D, 28, 28, num_classes] logits — see
    # maskrcnn.mask_head class_sel)
    cls_sel = (det_classes + 1).reshape(b * d)
    w = params["mask_pred"]["mask_fcn_logits"]["weight"][0, 0]  # [C, nc]
    wsel = jnp.take(w, cls_sel, axis=1).T.astype(x.dtype)  # [B*D, C]
    bsel = params["mask_pred"]["mask_fcn_logits"]["bias"][cls_sel].astype(
        x.dtype)
    masks = jnp.einsum("nhwc,nc->nhw", x, wsel) + bsel[:, None, None]
    masks = masks.reshape(b, d, cfg.mask_out, cfg.mask_out)
    out["masks"] = jax.nn.sigmoid(masks.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Training forward (the reference's canonical C4 train config,
# README.md:263-284 — MaskRCNNC4Predictor + SHARE_BOX_FEATURE_EXTRACTOR,
# driven by tools/train_net.py README.md:337-341)
# ---------------------------------------------------------------------------


def forward_train_losses(
    params: dict,
    images: jax.Array,  # [B, Hc, Wc, 3] preprocessed canvas
    image_hw: jax.Array,  # [B, 2]
    targets: dict,  # boxes [B,G,4], classes [B,G] (0-based, -1 pad),
    #                 mask_crops [B,G,R,R] float
    key: jax.Array,
    cfg: MaskRCNNC4Config,
    loss_cfg=None,
):
    """C4 training forward -> the reference's five losses.

    Differences from the FPN path (maskrcnn.forward_train_losses):
    single-level RPN with the 12000/2000 C4 train budgets, RoIAlign 14x14
    straight off C4, res5 as the shared box/mask feature extractor
    (SHARE_BOX_FEATURE_EXTRACTOR: True — the mask predictor reuses the box
    head's res5 features instead of pooling again), and 14x14 mask targets
    (ROI_MASK_HEAD.RESOLUTION: 14)."""
    from tpuseg.models import maskrcnn_loss as ML

    if loss_cfg is None:
        loss_cfg = ML.MaskRCNNLossConfig(num_classes=cfg.num_classes,
                                         mask_size=cfg.mask_out)
    b, ch, cw, _ = images.shape
    c4 = backbone_c4(params, images, cfg)
    logits, deltas = M.rpn_head(params["rpn"], [c4])
    anchors = jnp.asarray(make_anchors_np(cfg, ch, cw))
    hl, wl = M.fpn_level_hw(ch, cw, cfg.anchor_stride)
    inside = M.anchor_inside_mask(
        image_hw, cfg.anchor_stride, hl, wl, anchors.shape[0] // (hl * wl))

    gt_boxes = targets["boxes"]
    gt_classes = targets["classes"]
    gt_valid = gt_classes >= 0

    k_rpn, k_roi = jax.random.split(key)
    losses = ML.rpn_loss(
        logits[0].astype(jnp.float32), deltas[0].astype(jnp.float32),
        anchors, gt_boxes, gt_valid, k_rpn, loss_cfg,
        image_hw=image_hw, anchor_inside=inside)

    # proposals detached BEFORE generation (upstream rpn.py passes
    # detach()ed objectness/deltas into the post-processor; see the FPN
    # path for why a late stop_gradient fails under the Pallas NMS)
    proposals, _, p_valid = M.rpn_proposals(
        [jax.lax.stop_gradient(logits[0])],
        [jax.lax.stop_gradient(deltas[0])],
        [anchors], image_hw, _single_level_cfg(cfg, train=True), (ch, cw))

    keys = jax.random.split(k_roi, b)
    sample = jax.vmap(
        lambda p_, pv, gb, gc, gv, k: ML.sample_proposals(
            p_, pv, gb, gc, gv, k, loss_cfg)
    )(proposals, p_valid, gt_boxes, gt_classes, gt_valid, keys)

    s = sample["boxes"].shape[1]
    flat_boxes = sample["boxes"].reshape(b * s, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), s)
    pooled = sampling.roi_align(
        c4, flat_boxes, flat_bidx, output_size=cfg.pooler_resolution,
        spatial_scale=1.0 / cfg.anchor_stride,
        sampling_ratio=cfg.pooler_sampling_ratio, group_size=s)
    feats = res5_head(params["roi_head"], pooled, cfg)  # [B*S, 7, 7, 2048]
    x = jnp.mean(feats, axis=(1, 2))
    cls_logits = L.linear(x, params["box_pred"]["cls_score"])
    box_deltas = L.linear(x, params["box_pred"]["bbox_pred"])
    flat_sample = {k_: v.reshape((b * s,) + v.shape[2:])
                   for k_, v in sample.items()}
    losses.update(ML.box_head_loss(
        cls_logits.astype(jnp.float32), box_deltas.astype(jnp.float32),
        flat_sample, loss_cfg))

    if cfg.mask_on:
        # shared extractor: deconv + class-selected 1x1 on the SAME res5
        # features. The res5 features exist for all S rois (the box head
        # needs them), but the mask predictor only ever contributes
        # through positives, and balanced_sample compacts positives into
        # the first roi_batch_per_image * roi_pos_fraction slots — so the
        # deconv/einsum/targets run on that static prefix only, matching
        # upstream's keep_only_positive_boxes subset (value-identical
        # loss, 4x less mask-predictor work)
        m = int(loss_cfg.roi_batch_per_image * loss_cfg.roi_pos_fraction)
        mfeats = feats.reshape(b, s, *feats.shape[1:])[:, :m].reshape(
            (b * m,) + feats.shape[1:])
        flat_msample = {k_: v[:, :m].reshape((b * m,) + v.shape[2:])
                        for k_, v in sample.items()}
        mx = L.relu(L.conv_transpose2d(
            mfeats, params["mask_pred"]["conv5_mask"], stride=2))
        cls_sel = flat_msample["cls_target"]  # 1-based fg labels (0 = bg)
        w = params["mask_pred"]["mask_fcn_logits"]["weight"][0, 0]  # [C, nc]
        wsel = jnp.take(w, cls_sel, axis=1).T.astype(mx.dtype)
        bsel = params["mask_pred"]["mask_fcn_logits"]["bias"][cls_sel].astype(
            mx.dtype)
        mask_x = (jnp.einsum("nhwc,nc->nhw", mx, wsel)
                  + bsel[:, None, None])  # [B*m, 14, 14]

        def per_image_targets(rois, gt_idx, gb, crops):
            return ML.mask_targets_from_crops(
                rois, gt_idx, gb, crops, cfg.mask_out)

        t14 = jax.vmap(per_image_targets)(
            sample["boxes"][:, :m], sample["gt_idx"][:, :m], gt_boxes,
            targets["mask_crops"])
        losses.update(ML.mask_head_loss_selected(
            mask_x.astype(jnp.float32), flat_msample,
            t14.reshape(b * m, cfg.mask_out, cfg.mask_out), loss_cfg))
    losses["total"] = sum(losses.values())
    return losses


def init_params(key: jax.Array, cfg: MaskRCNNC4Config, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True)
    full = resnet_nn.init_params(next(keys), rcfg, dtype)
    backbone = {k: full[k] for k in ("stem", "layer1", "layer2", "layer3")}
    na = len(cfg.anchor_sizes) * len(cfg.anchor_ratios)
    params = {
        "backbone": backbone,
        "roi_head": {"layer4": full["layer4"]},
        "rpn": {
            "conv": L.conv_params(next(keys), 3, 3, 1024, 1024, dtype=dtype),
            "cls": L.conv_params(next(keys), 1, 1, 1024, na, dtype=dtype),
            "bbox": L.conv_params(next(keys), 1, 1, 1024, na * 4, dtype=dtype),
        },
        "box_pred": {
            "cls_score": L.linear_params(next(keys), 2048, cfg.num_classes,
                                         dtype=dtype),
            "bbox_pred": L.linear_params(next(keys), 2048,
                                         cfg.num_classes * 4, dtype=dtype),
        },
    }
    if cfg.mask_on:
        params["mask_pred"] = {
            "conv5_mask": {
                "weight": jax.random.normal(
                    next(keys), (2, 2, 2048, 256), dtype) * 0.01,
                "bias": jnp.zeros((256,), dtype),
            },
            "mask_fcn_logits": L.conv_params(next(keys), 1, 1, 256,
                                             cfg.num_classes, dtype=dtype),
        }
    return params


def from_torch_state(flat: dict, cfg: MaskRCNNC4Config) -> dict:
    """maskrcnn-benchmark C4 checkpoint names -> param tree."""
    from tpuseg.weights.detectron_map import (_conv, _linear, _strip_module,
                                              map_resnet_body,
                                              map_resnet_stage)

    flat = _strip_module(flat)
    # C4 body carries layer1-3 only; layer4 lives under the roi box head
    backbone = map_resnet_body(flat, cfg.depth, stages=3)
    layer4 = map_resnet_stage(flat, "roi_heads.box.feature_extractor.head.layer4",
                              resnet_nn.STAGE_BLOCKS[cfg.depth][3])
    params = {
        "backbone": backbone,
        "roi_head": {"layer4": layer4},
        "rpn": {
            "conv": _conv(flat, "rpn.head.conv"),
            "cls": _conv(flat, "rpn.head.cls_logits"),
            "bbox": _conv(flat, "rpn.head.bbox_pred"),
        },
        "box_pred": {
            "cls_score": _linear(flat, "roi_heads.box.predictor.cls_score"),
            "bbox_pred": _linear(flat, "roi_heads.box.predictor.bbox_pred"),
        },
    }
    if cfg.mask_on:
        params["mask_pred"] = {
            "conv5_mask": {
                "weight": np.ascontiguousarray(np.asarray(
                    flat["roi_heads.mask.predictor.conv5_mask.weight"],
                    np.float32).transpose(2, 3, 0, 1)),
                "bias": np.asarray(
                    flat["roi_heads.mask.predictor.conv5_mask.bias"],
                    np.float32),
            },
            "mask_fcn_logits": _conv(
                flat, "roi_heads.mask.predictor.mask_fcn_logits"),
        }
    return params
