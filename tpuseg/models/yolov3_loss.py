"""YOLOv3 training loss (yolo.jittor compute_loss capability).

Standard YOLOv3 target assignment and loss terms (the upstream the port
tracks): each gt is assigned to the anchor (of the 9 across 3 scales) with
the best wh-IoU, at the gt center's grid cell on that anchor's scale.
  - xy: BCE-style MSE on sigmoid offsets vs in-cell fractions
  - wh: MSE on raw tw/th vs log(gt / anchor)
  - obj: BCE, 1 at assigned cells, 0 elsewhere, cells whose predicted box
    overlaps any gt above ignore_thresh are excluded from the noobj term
  - cls: BCE one-hot

Static shapes: gts arrive padded [B, G]; assignment is a scatter into the
per-level [B, H*W*A] target planes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.core import boxes as box_ops
from tpuseg.models.yolov3 import ANCHORS, STRIDES, YoloV3Config


@dataclass(frozen=True)
class YoloLossConfig:
    ignore_thresh: float = 0.5
    obj_weight: float = 1.0
    noobj_weight: float = 100.0
    coord_weight: float = 1.0
    cls_weight: float = 1.0


def _bce(x, t):
    return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def build_targets(
    gt_boxes: jax.Array,  # [G, 4] xyxy in input px (padded)
    gt_classes: jax.Array,  # [G] 0-based, -1 pad
    level_hw: list,  # [(h, w)] per level
    cfg: YoloV3Config,
):
    """-> per level: (tconf [HWA], txywh [HWA,4], tcls [HWA], assigned [HWA])."""
    anchors_all = jnp.asarray(
        [[aw, ah] for lvl in ANCHORS for (aw, ah) in lvl],
        jnp.float32)  # [9, 2] absolute px, level-major (32, 16, 8)
    g = gt_boxes.shape[0]
    valid = gt_classes >= 0
    cxy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) * 0.5
    wh = gt_boxes[:, 2:] - gt_boxes[:, :2]
    # wh IoU vs the 9 anchors
    inter = jnp.minimum(wh[:, None, 0], anchors_all[None, :, 0]) * jnp.minimum(
        wh[:, None, 1], anchors_all[None, :, 1])
    union = (wh[:, 0] * wh[:, 1])[:, None] + (
        anchors_all[:, 0] * anchors_all[:, 1])[None, :] - inter
    wh_iou = inter / jnp.maximum(union, 1e-9)
    best_anchor = jnp.argmax(wh_iou, axis=1)  # [G] in [0, 9)
    best_level = best_anchor // 3
    best_a = best_anchor % 3

    out = []
    for li, (h, w) in enumerate(level_hw):
        stride = STRIDES[li]
        gx = cxy[:, 0] / stride
        gy = cxy[:, 1] / stride
        ci = jnp.clip(gx.astype(jnp.int32), 0, w - 1)
        cj = jnp.clip(gy.astype(jnp.int32), 0, h - 1)
        sel = valid & (best_level == li)
        lin = (cj * w + ci) * 3 + best_a  # position-major, anchor-consecutive
        n = h * w * 3
        lin_safe = jnp.where(sel, lin, n)  # out-of-range drop for pads
        tconf = jnp.zeros((n + 1,), jnp.float32).at[lin_safe].set(1.0)[:n]
        aw = anchors_all[best_anchor][:, 0]
        ah = anchors_all[best_anchor][:, 1]
        # offset relative to the CLAMPED cell: a gt centered exactly on the
        # right/bottom image edge (gx == w) lands in cell w-1 with target
        # offset 1.0 — `gx - floor(gx)` would give 0.0 there and train the
        # center a full stride to the left
        tx = gx - ci.astype(gx.dtype)
        ty = gy - cj.astype(gy.dtype)
        tw = jnp.log(jnp.maximum(wh[:, 0] / jnp.maximum(aw, 1e-9), 1e-9))
        th = jnp.log(jnp.maximum(wh[:, 1] / jnp.maximum(ah, 1e-9), 1e-9))
        vals = jnp.stack([tx, ty, tw, th], -1)
        txywh = jnp.zeros((n + 1, 4), jnp.float32).at[lin_safe].set(vals)[:n]
        tcls = jnp.zeros((n + 1,), jnp.int32).at[lin_safe].set(
            jnp.clip(gt_classes, 0))[:n]
        out.append((tconf, txywh, tcls))
    return out


def total_loss(
    raw_outs: list,  # 3 raw head maps [B, h, w, 3*(5+C)]
    gt_boxes: jax.Array,  # [B, G, 4] px
    gt_classes: jax.Array,  # [B, G]
    cfg: YoloV3Config,
    lcfg: YoloLossConfig = YoloLossConfig(),
):
    from tpuseg.models.yolov3 import decode

    b = raw_outs[0].shape[0]
    level_hw = [(o.shape[1], o.shape[2]) for o in raw_outs]
    # decoded boxes for the ignore mask
    dec_boxes, _, _ = decode(raw_outs, cfg)

    def per_image(outs_flat, dec, gtb, gtc):
        tgt = build_targets(gtb, gtc, level_hw, cfg)
        gt_valid = gtc >= 0
        iou = box_ops.iou_matrix(dec, gtb)  # [N, G]
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
        ignore = jnp.max(iou, axis=1) > lcfg.ignore_thresh

        losses = {"xy": 0.0, "wh": 0.0, "obj": 0.0, "noobj": 0.0, "cls": 0.0}
        off = 0
        for li, o in enumerate(outs_flat):
            h, w = level_hw[li]
            n = h * w * 3
            o = o.reshape(n, cfg.num_attrib)
            tconf, txywh, tcls = tgt[li]
            obj_mask = tconf > 0.5
            ign = ignore[off:off + n]
            off += n
            sxy = jax.nn.sigmoid(o[:, 0:2])
            losses["xy"] += jnp.sum(
                jnp.where(obj_mask[:, None], (sxy - txywh[:, 0:2]) ** 2, 0.0))
            losses["wh"] += jnp.sum(
                jnp.where(obj_mask[:, None],
                          (o[:, 2:4] - txywh[:, 2:4]) ** 2, 0.0))
            conf_bce = _bce(o[:, 4], tconf)
            losses["obj"] += jnp.sum(jnp.where(obj_mask, conf_bce, 0.0))
            noobj_mask = (~obj_mask) & (~ign)
            losses["noobj"] += jnp.sum(jnp.where(noobj_mask, conf_bce, 0.0))
            onehot = jax.nn.one_hot(tcls, cfg.num_classes)
            cls_bce = _bce(o[:, 5:], onehot).sum(-1)
            losses["cls"] += jnp.sum(jnp.where(obj_mask, cls_bce, 0.0))
        return losses

    losses = jax.vmap(
        lambda o0, o1, o2, dec, gtb, gtc: per_image([o0, o1, o2], dec, gtb, gtc)
    )(raw_outs[0], raw_outs[1], raw_outs[2], dec_boxes, gt_boxes, gt_classes)
    npos = jnp.maximum(jnp.sum(gt_classes >= 0), 1)
    out = {
        "xy": lcfg.coord_weight * jnp.sum(losses["xy"]) / npos,
        "wh": lcfg.coord_weight * jnp.sum(losses["wh"]) / npos,
        "obj": lcfg.obj_weight * jnp.sum(losses["obj"]) / npos,
        "noobj": lcfg.noobj_weight * jnp.sum(losses["noobj"])
        / jnp.maximum(jnp.sum(jnp.ones_like(dec_boxes[..., 0])), 1),
        "cls": lcfg.cls_weight * jnp.sum(losses["cls"]) / npos,
    }
    out["total"] = sum(out.values())
    return out
