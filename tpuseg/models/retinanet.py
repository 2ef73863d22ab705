"""RetinaNet (maskrcnn-benchmark's one-stage detector, the consumer of the
SigmoidFocalLoss CUDA op — SURVEY.md §2.1 "SigmoidFocalLoss (RetinaNet
configs)"; upstream ``modeling/rpn/retinanet/`` + ``retinanet_R-50-FPN_1x``).

TPU-native shape policy mirrors models/maskrcnn.py: static canvas, per-level
anchors masked by the real feature extent, rank-never-filter — per-level
top-1000 candidates -> decode -> cross-level concat -> batched class-aware
NMS (0.4) -> top-100 detections. The whole thing is one jit program.

Architecture: ResNet C3-C5 -> FPN P3-P5 + P6/P7 (LastLevelP6P7: stride-2
convs on C5 then relu(P6)) -> shared 4-conv class/box towers -> per-anchor
sigmoid classification (focal loss at train time) + box regression.
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


@dataclass(frozen=True)
class RetinaNetConfig:
    depth: int = 50
    freeze_at: int = 2  # FREEZE_CONV_BODY_AT (stem + layer1)
    # anchors (MODEL.RETINANET defaults): 3 octave scales x 3 ratios = 9/cell
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_stride: tuple = (8, 16, 32, 64, 128)
    octave: float = 2.0
    scales_per_octave: int = 3
    # head
    num_classes: int = 81  # incl. background slot (logits are nc-1 sigmoid)
    num_convs: int = 4
    prior_prob: float = 0.01
    fpn_channels: int = 256
    # inference (RETINANET.PRE_NMS_TOP_N / INFERENCE_TH / NMS_TH,
    # TEST.DETECTIONS_PER_IMG)
    pre_nms_top_n: int = 1000  # per level
    score_thresh: float = 0.05
    nms_thresh: float = 0.4
    detections_per_img: int = 100
    box_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    approx_topk: bool = False
    # train (FG_IOU_THRESHOLD / BG_IOU_THRESHOLD / LOSS_* / BBOX_REG_*)
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    bbox_reg_beta: float = 0.11
    bbox_reg_norm: float = 4.0


def num_anchors_per_cell(cfg: RetinaNetConfig) -> int:
    return cfg.scales_per_octave * len(cfg.anchor_ratios)


@functools.lru_cache(maxsize=16)
def make_anchors_np(cfg: RetinaNetConfig, canvas_h: int, canvas_w: int):
    """Per-level anchors [Hl*Wl*A, 4]; A = scales_per_octave * ratios.

    Sizes at level l are ANCHOR_SIZES[l] * octave**(i/scales_per_octave)
    (make_anchor_generator_retinanet semantics), cells via the same Caffe2
    generate_anchors as the Mask R-CNN path. Cell order is RATIO-MAJOR
    (for each ratio, the octave scales — upstream _ratio_enum then
    _scale_enum), matching the head's trained channel layout.
    """
    out = []
    for size, stride in zip(cfg.anchor_sizes, cfg.anchor_stride):
        cells = [
            M._generate_cell_anchors(
                size * cfg.octave ** (i / cfg.scales_per_octave),
                cfg.anchor_ratios, base=stride)
            for i in range(cfg.scales_per_octave)
        ]  # [scale][ratio, 4]
        cell = np.stack(cells, axis=0).transpose(1, 0, 2).reshape(-1, 4)
        hl, wl = M.fpn_level_hw(canvas_h, canvas_w, stride)
        sx = np.arange(wl) * stride
        sy = np.arange(hl) * stride
        shift_x, shift_y = np.meshgrid(sx, sy)
        shifts = np.stack(
            [shift_x.ravel(), shift_y.ravel(),
             shift_x.ravel(), shift_y.ravel()], 1)
        out.append(
            (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4).astype(
                np.float32))
    return out


# ---------------------------------------------------------------------------
# Backbone: FPN P3-P7 (build_resnet_fpn_p3p7_backbone)
# ---------------------------------------------------------------------------


def backbone_p3p7(params: dict, images: jax.Array, cfg: RetinaNetConfig):
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True, freeze_at=cfg.freeze_at)
    feats = resnet_nn.forward(params["backbone"], images, rcfg)
    # laterals over C3-C5 only (upstream passes in_channels_list[0] = 0)
    inner = [
        L.conv2d(feats[n], params["fpn"]["inner"][i])
        for i, n in enumerate(["c3", "c4", "c5"])
    ]
    last = inner[-1]
    tds = [last]
    for i in range(len(inner) - 2, -1, -1):
        last = inner[i] + L.resize_nearest(
            last, (inner[i].shape[1], inner[i].shape[2]))
        tds.insert(0, last)
    p3, p4, p5 = [
        L.conv2d(tds[i], params["fpn"]["layer"][i], padding=1)
        for i in range(3)
    ]
    # LastLevelP6P7 on C5 (USE_C5 default): p6 = conv s2(C5); p7 = conv
    # s2(relu(p6))
    p6 = L.conv2d(feats["c5"], params["fpn"]["p6"], stride=2, padding=1)
    p7 = L.conv2d(L.relu(p6), params["fpn"]["p7"], stride=2, padding=1)
    return [p3, p4, p5, p6, p7]


def head_forward(params: dict, feats: list, cfg: RetinaNetConfig):
    """Shared towers over levels -> (cls_logits [B,N,C-1], deltas [B,N,4])
    per level."""
    logits, deltas = [], []
    nc = cfg.num_classes - 1
    for f in feats:
        b = f.shape[0]
        c = f
        for conv in params["cls_tower"]:
            c = L.relu(L.conv2d(c, conv, padding=1))
        logits.append(
            L.conv2d(c, params["cls_logits"], padding=1).reshape(b, -1, nc))
        t = f
        for conv in params["bbox_tower"]:
            t = L.relu(L.conv2d(t, conv, padding=1))
        deltas.append(
            L.conv2d(t, params["bbox_pred"], padding=1).reshape(b, -1, 4))
    return logits, deltas


# ---------------------------------------------------------------------------
# Inference (retinanet/inference.py RetinaNetPostProcessor)
# ---------------------------------------------------------------------------


def forward_inference(params: dict, images: jax.Array, image_hw: jax.Array,
                      cfg: RetinaNetConfig):
    """images [B,Hc,Wc,3] (canvas), image_hw [B,2] -> padded detections."""
    b, ch, cw, _ = images.shape
    feats = backbone_p3p7(params, images, cfg)
    logits, deltas = head_forward(params, feats, cfg)
    anchors = [jnp.asarray(a) for a in make_anchors_np(cfg, ch, cw)]
    nc = cfg.num_classes - 1
    a_per_cell = num_anchors_per_cell(cfg)

    lvl_boxes, lvl_scores, lvl_classes, lvl_valid = [], [], [], []
    for li, (lg, dl, an) in enumerate(zip(logits, deltas, anchors)):
        stride = cfg.anchor_stride[li]
        hl, wl = M.fpn_level_hw(ch, cw, stride)
        # mask anchor cells beyond the real (unpadded) feature extent
        inside = M.anchor_inside_mask(image_hw, stride, hl, wl, a_per_cell)

        lg = lg.astype(jnp.float32)
        scores = jax.nn.sigmoid(lg)  # [B, N, nc]
        # two-stage EXACT top-k: first compact anchors by per-anchor max
        # score. Any (anchor, class) pair in the true top-k has its
        # anchor's max >= the pair's score, and at most k-1 pairs (hence
        # anchors) rank above it — so the top-k anchors by max contain
        # every top-k pair. Avoids a [B, N*nc] top-k (12M scores/image at
        # P3) that dominated the level loop on TPU.
        max_s = jnp.max(scores, axis=-1)  # [B, N]
        k = min(cfg.pre_nms_top_n, lg.shape[1])
        _, a_sel, a_valid = box_ops.masked_topk(
            max_s, inside & (max_s > cfg.score_thresh), k,
            approx=cfg.approx_topk)
        sub = jnp.take_along_axis(scores, a_sel[..., None], axis=1)  # [B,K,nc]
        sub_cand = a_valid[..., None] & (sub > cfg.score_thresh)
        top_s, sel, sel_valid = box_ops.masked_topk(
            sub.reshape(b, -1), sub_cand.reshape(b, -1), k)
        a_idx = jnp.take_along_axis(a_sel, sel // nc, axis=1)
        cls_idx = sel % nc

        def per_image(dl_i, aidx_i, hw_i):
            boxes = box_ops.decode_boxes(
                dl_i[aidx_i], an[aidx_i], weights=cfg.box_reg_weights)
            return box_ops.clip_to_image(boxes, hw_i[0] - 1, hw_i[1] - 1)

        boxes = jax.vmap(per_image)(
            dl.astype(jnp.float32), a_idx, image_hw)
        lvl_boxes.append(boxes)
        lvl_scores.append(jnp.where(sel_valid, top_s, 0.0))
        lvl_classes.append(cls_idx)
        lvl_valid.append(sel_valid)

    all_boxes = jnp.concatenate(lvl_boxes, 1)
    all_scores = jnp.concatenate(lvl_scores, 1)
    all_classes = jnp.concatenate(lvl_classes, 1)
    all_valid = jnp.concatenate(lvl_valid, 1)
    # class-aware NMS over all levels (boxlist_ml_nms, NMS_TH 0.4)
    keep = nms_ops.batched_nms_mask_batch(
        all_boxes, all_scores, all_classes, cfg.nms_thresh, valid=all_valid,
        to_remove=1.0)

    def per_image_final(cb, ts, cc, kp):
        fin_s, fidx, fvalid = box_ops.masked_topk(
            jnp.where(kp, ts, -jnp.inf), kp, cfg.detections_per_img)
        return cb[fidx], jnp.where(fvalid, fin_s, 0.0), cc[fidx], fvalid

    det_boxes, det_scores, det_classes, det_valid = jax.vmap(
        per_image_final)(all_boxes, all_scores, all_classes, keep)
    return {
        "boxes": det_boxes,
        "scores": det_scores,
        "classes": det_classes,  # 0-based (no background)
        "valid": det_valid,
    }


# ---------------------------------------------------------------------------
# Training loss (retinanet/loss.py RetinaNetLossComputation)
# ---------------------------------------------------------------------------


def forward_train_losses(params: dict, images: jax.Array,
                         image_hw: jax.Array, targets: dict,
                         cfg: RetinaNetConfig):
    """Focal classification + smooth-L1 regression over all anchors.

    Normalization matches upstream: cls by (num_pos + B), reg by
    (num_pos * bbox_reg_norm).
    """
    from tpuseg.models.maskrcnn_loss import match_targets, smooth_l1
    from tpuseg.ops.losses import sigmoid_focal_loss

    b, ch, cw, _ = images.shape
    feats = backbone_p3p7(params, images, cfg)
    logits, deltas = head_forward(params, feats, cfg)
    per_level = [jnp.asarray(a) for a in make_anchors_np(cfg, ch, cw)]
    anchors = jnp.concatenate(per_level, axis=0)
    all_logits = jnp.concatenate(
        [l.astype(jnp.float32) for l in logits], axis=1)
    all_deltas = jnp.concatenate(
        [d.astype(jnp.float32) for d in deltas], axis=1)

    # anchors whose grid position lies beyond the real (unpadded) feature
    # extent do not exist in the reference (per-image anchor grids) — they
    # must contribute neither background focal terms nor positives, else
    # the loss depends on the static canvas choice. Same masking as
    # rpn_proposals / the inference path.
    inside_lvls = []
    for li, an in enumerate(per_level):
        stride = cfg.anchor_stride[li]
        hl, wl = M.fpn_level_hw(ch, cw, stride)
        a_per = an.shape[0] // (hl * wl)
        inside_lvls.append(M.anchor_inside_mask(image_hw, stride, hl, wl,
                                                a_per))
    inside = jnp.concatenate(inside_lvls, axis=1)  # [B, A]

    gt_boxes = targets["boxes"]
    gt_classes = targets["classes"]  # 0-based fg ids, -1 pad
    gt_valid = gt_classes >= 0

    def per_image(lg, dl, gtb, gtc, gtv, ins):
        midx, label = match_targets(
            gtb, gtv, anchors, cfg.fg_iou, cfg.bg_iou, True,
            anchor_valid=ins)
        # focal targets: 0 bg, 1..nc-1 fg class, <0 ignore (between
        # thresholds; padded-canvas anchors forced to ignore)
        cls_t = jnp.where(label == 1, gtc[midx] + 1,
                          jnp.where(label == 0, 0, -1))
        cls_t = jnp.where(ins, cls_t, -1)
        label = jnp.where(ins, label, -1)
        cls_l = jnp.sum(sigmoid_focal_loss(
            lg, cls_t, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha))
        pos = label == 1
        tgt = box_ops.encode_boxes(gtb[midx], anchors,
                                   weights=cfg.box_reg_weights)
        l1 = smooth_l1(dl, tgt, beta=cfg.bbox_reg_beta).sum(-1)
        reg_l = jnp.sum(jnp.where(pos, l1, 0.0))
        return cls_l, reg_l, jnp.sum(pos)

    cls_l, reg_l, n_pos = jax.vmap(per_image)(
        all_logits, all_deltas, gt_boxes, gt_classes, gt_valid, inside)
    num_pos = jnp.sum(n_pos)
    losses = {
        "loss_retina_cls": jnp.sum(cls_l) / (num_pos + b),
        "loss_retina_reg": jnp.sum(reg_l)
        / jnp.maximum(1.0, num_pos * cfg.bbox_reg_norm),
    }
    losses["total"] = losses["loss_retina_cls"] + losses["loss_retina_reg"]
    return losses


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: RetinaNetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 32))
    rcfg = resnet_nn.ResNetConfig(depth=cfg.depth, stride_in_1x1=True,
                                  frozen_bn=True)
    fc = cfg.fpn_channels
    na = num_anchors_per_cell(cfg)
    nc = cfg.num_classes - 1
    cls_logits = L.conv_params(next(keys), 3, 3, fc, na * nc, dtype=dtype)
    # prior-prob bias init (head.py): fg sigmoid starts at prior_prob
    cls_logits["bias"] = jnp.full(
        (na * nc,), -np.log((1 - cfg.prior_prob) / cfg.prior_prob), dtype)
    return {
        "backbone": resnet_nn.init_params(next(keys), rcfg, dtype),
        "fpn": {
            "inner": [
                L.conv_params(next(keys), 1, 1, c, fc, dtype=dtype)
                for c in (512, 1024, 2048)
            ],
            "layer": [
                L.conv_params(next(keys), 3, 3, fc, fc, dtype=dtype)
                for _ in range(3)
            ],
            "p6": L.conv_params(next(keys), 3, 3, 2048, fc, dtype=dtype),
            "p7": L.conv_params(next(keys), 3, 3, fc, fc, dtype=dtype),
        },
        "cls_tower": [
            L.conv_params(next(keys), 3, 3, fc, fc, dtype=dtype)
            for _ in range(cfg.num_convs)
        ],
        "bbox_tower": [
            L.conv_params(next(keys), 3, 3, fc, fc, dtype=dtype)
            for _ in range(cfg.num_convs)
        ],
        "cls_logits": cls_logits,
        "bbox_pred": L.conv_params(next(keys), 3, 3, fc, na * 4, dtype=dtype),
    }


def from_torch_state(flat: dict, cfg: RetinaNetConfig) -> dict:
    """maskrcnn-benchmark retinanet checkpoint names -> param tree.

    Names: backbone.body.* (ResNet), backbone.fpn.fpn_inner{2,3,4} /
    fpn_layer{2,3,4} / top_blocks.{p6,p7}, rpn.head.cls_tower.{0,2,4,6} /
    bbox_tower.{0,2,4,6} / cls_logits / bbox_pred.
    """
    from tpuseg.weights.detectron_map import (_conv, _strip_module,
                                              map_resnet_body)

    flat = _strip_module(flat)
    backbone = map_resnet_body(flat, cfg.depth)
    return {
        "backbone": backbone,
        "fpn": {
            "inner": [
                _conv(flat, f"backbone.fpn.fpn_inner{i}") for i in (2, 3, 4)
            ],
            "layer": [
                _conv(flat, f"backbone.fpn.fpn_layer{i}") for i in (2, 3, 4)
            ],
            "p6": _conv(flat, "backbone.fpn.top_blocks.p6"),
            "p7": _conv(flat, "backbone.fpn.top_blocks.p7"),
        },
        "cls_tower": [
            _conv(flat, f"rpn.head.cls_tower.{i}") for i in (0, 2, 4, 6)
        ],
        "bbox_tower": [
            _conv(flat, f"rpn.head.bbox_tower.{i}") for i in (0, 2, 4, 6)
        ],
        "cls_logits": _conv(flat, "rpn.head.cls_logits"),
        "bbox_pred": _conv(flat, "rpn.head.bbox_pred"),
    }
