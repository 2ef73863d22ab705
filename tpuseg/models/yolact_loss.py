"""YOLACT training loss (Yolact.jittor layers/modules/multibox_loss.py).

All components of the reference's MultiBoxLoss, reformulated for static
shapes (targets arrive padded to MAX_GT per image; positives are handled by
weight masks, never by filtering):

  B: SSD matching — per-prior best gt with pos/neg/neutral thresholds
     (0.5 / 0.4), forced best-prior-per-gt, crowd-overlap neutralization
  L: localization smooth-L1 on encoded offsets vs matched gt (alpha 1.5)
  C: classification with OHEM hard-negative mining (3:1 neg:pos, computed
     with the SSD log-sum-exp proxy)
  M: mask BCE between sigmoid(proto @ coeff) cropped to the gt box and the
     gt mask at proto resolution, normalized by gt box area (alpha 6.125,
     up to masks_to_train=100 positives per image)
  S: semantic segmentation aux BCE on P3 (alpha 1)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.core import boxes as box_ops


@dataclass(frozen=True)
class YolactLossConfig:
    pos_thresh: float = 0.5
    neg_thresh: float = 0.4
    crowd_iou_threshold: float = 0.7
    negpos_ratio: int = 3
    bbox_alpha: float = 1.5
    conf_alpha: float = 1.0
    mask_alpha: float = 6.125
    semantic_alpha: float = 1.0
    masks_to_train: int = 100
    # YOLACT++ (arXiv:1912.06218) FastMaskIoUNet training: I = smooth-L1
    # between the net's class-channel prediction on the assembled cropped
    # masks and their true mask IoU vs gt, skipping gt masks smaller than
    # discard_mask_area proto pixels (upstream 5*5)
    use_maskiou: bool = False
    maskiou_alpha: float = 25.0
    discard_mask_area: float = 25.0


def match_priors(
    gt_boxes: jax.Array,  # [G, 4] normalized xyxy (padded)
    gt_classes: jax.Array,  # [G] 0-based, -1 for pad
    gt_crowd: jax.Array,  # [G] bool
    priors: jax.Array,  # [N, 4] cxcywh
    cfg: YolactLossConfig,
):
    """-> (conf_t [N] in {-1 neutral, 0 bg, c+1 fg}, matched_idx [N],
    loc_t [N,4])."""
    n = priors.shape[0]
    priors_xyxy = box_ops.cxcywh_to_xyxy(priors)
    valid_gt = (gt_classes >= 0) & ~gt_crowd
    overlaps = box_ops.iou_matrix(gt_boxes, priors_xyxy)  # [G, N]
    overlaps = jnp.where(valid_gt[:, None], overlaps, -1.0)

    best_truth_overlap = jnp.max(overlaps, axis=0)  # [N]
    best_truth_idx = jnp.argmax(overlaps, axis=0)
    # force each valid gt's best prior to match it (overlap := 2), with the
    # reference's ITERATIVE claiming (box_utils.match): each round the
    # globally-best (gt, prior) pair is claimed and that prior/gt excluded,
    # so two gts sharing a best prior end up with DISTINCT forced priors
    # (a one-shot argmax scatter would collapse them onto one).
    # The loop runs on a per-gt top-G COMPACTION of the overlap matrix:
    # at most G-1 priors are ever excluded before a gt claims, so each
    # gt's winner is always within its own G best priors — exact, and the
    # G sequential rounds update [G, G] instead of [G, N=19248] (the
    # full-matrix loop was 9.7 ms of the 56.8 ms YOLACT train step,
    # results/profile_yolact_train.py). top_k ties break index-ascending,
    # matching the full-row argmax's first-max-wins.
    g = gt_boxes.shape[0]
    k = min(g, n)
    cand_val, cand_idx = jax.lax.top_k(overlaps, k)  # [G, k]

    def claim(_, state):
        cv, bto, bti = state
        per_gt_best = jnp.max(cv, axis=1)  # [G]
        j = jnp.argmax(per_gt_best)
        i = cand_idx[j, jnp.argmax(cv[j])]
        ok = per_gt_best[j] >= 0.0  # active, valid gt remains
        cv = jnp.where(
            ok, jnp.where(cand_idx == i, -1.0, cv).at[j, :].set(-1.0), cv)
        bto = jnp.where(ok, bto.at[i].set(2.0), bto)
        bti = jnp.where(ok, bti.at[i].set(j), bti)
        return cv, bto, bti

    _, best_truth_overlap, best_truth_idx = jax.lax.fori_loop(
        0, g, claim, (cand_val, best_truth_overlap, best_truth_idx))

    conf = gt_classes[best_truth_idx] + 1
    conf = jnp.where(best_truth_overlap < cfg.pos_thresh, -1, conf)  # neutral
    conf = jnp.where(best_truth_overlap < cfg.neg_thresh, 0, conf)  # bg

    # crowd neutralization: negative priors overlapping a crowd gt.
    # Computed [G, N] (priors on lanes; a [N, G=16] layout runs on 16 of
    # 128 lanes) — same values as iof_matrix(priors, gt) transposed.
    crowd_valid = (gt_classes >= 0) & gt_crowd
    if gt_boxes.shape[0] > 0:
        crowd_iof = box_ops.iof_matrix(priors_xyxy, gt_boxes,
                                       transpose=True)  # [G, N]
        crowd_iof = jnp.where(crowd_valid[:, None], crowd_iof, 0.0)
        crowd_hit = jnp.max(crowd_iof, axis=0) > cfg.crowd_iou_threshold
        conf = jnp.where((conf <= 0) & crowd_hit, -1, conf)

    matched = gt_boxes[best_truth_idx]
    loc_t = box_ops.ssd_encode(matched, priors)
    return conf, best_truth_idx, loc_t


def _log_sum_exp(x):
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    return jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True)) + m


def ohem_conf_loss(conf_logits, conf_t, cfg: YolactLossConfig):
    """SSD OHEM: per-batch hard negative mining at 3:1 (multibox_loss.py)."""
    b, n, c = conf_logits.shape
    pos = conf_t > 0
    # loss proxy for mining: logsumexp - background logit
    batch_conf = conf_logits.reshape(-1, c)
    loss_c = (_log_sum_exp(batch_conf) - batch_conf[:, 0:1]).reshape(b, n)
    loss_c = jnp.where(pos | (conf_t < 0), 0.0, loss_c)  # exclude pos+neutral
    # rank negatives per image
    idx_rank = jnp.argsort(jnp.argsort(-loss_c, axis=1), axis=1)
    num_pos = jnp.sum(pos, axis=1, keepdims=True)
    num_neg = jnp.clip(cfg.negpos_ratio * num_pos, max=n - 1)
    neg = idx_rank < num_neg
    neg = neg & (conf_t == 0)

    labels = jnp.clip(conf_t, 0)
    logp = jax.nn.log_softmax(conf_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    sel = pos | neg
    total = jnp.sum(jnp.where(sel, ce, 0.0))
    return cfg.conf_alpha * total


def smooth_l1(x, t):
    d = jnp.abs(x - t)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def mask_loss(
    proto,  # [S, S, K]
    coeff,  # [N, K]
    conf_t,  # [N]
    matched_idx,  # [N]
    gt_boxes,  # [G, 4] normalized
    gt_masks_proto,  # [G, S, S] float 0/1 (pre-downsampled on host)
    key,
    cfg: YolactLossConfig,
    gt_classes=None,  # [G] 0-based (needed for maskiou targets)
):
    """BCE over assembled masks for up to masks_to_train positives.

    With cfg.use_maskiou, also returns the FastMaskIoUNet training targets
    built from the SAME selected positives (upstream lincomb_mask_loss):
    {"input" [M,S,S] sigmoid+cropped masks, "iou_t" [M] true mask IoU of
    the binarized mask vs gt, "label" [M] 0-based class, "valid" [M]}.
    """
    n = conf_t.shape[0]
    s = proto.shape[0]
    pos = conf_t > 0
    # random subset of positives (reference: torch.randperm selection)
    scores = jax.random.uniform(key, (n,))
    _, sel, sel_valid = box_ops.masked_topk(scores, pos, cfg.masks_to_train)
    sel_gt = matched_idx[sel]  # [M]
    sel_coeff = coeff[sel]  # [M, K]
    mask_t = gt_masks_proto[sel_gt]  # [M, S, S]
    boxes_t = gt_boxes[sel_gt]  # [M, 4]

    pred = jnp.einsum("hwk,mk->mhw", proto, sel_coeff)
    # BCE with logits, then crop to gt box
    bce = jnp.maximum(pred, 0) - pred * mask_t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    # crop (box_utils.crop on the loss too)
    x1 = jnp.clip(boxes_t[:, 0] * s - 1, 0)
    x2 = jnp.clip(boxes_t[:, 2] * s + 1, None, s)
    y1 = jnp.clip(boxes_t[:, 1] * s - 1, 0)
    y2 = jnp.clip(boxes_t[:, 3] * s + 1, None, s)
    rows = jax.lax.broadcasted_iota(jnp.float32, (1, s, s), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, s, s), 2)
    inside = (
        (rows >= y1[:, None, None]) & (rows < y2[:, None, None])
        & (cols >= x1[:, None, None]) & (cols < x2[:, None, None])
    )
    bce = jnp.where(inside, bce, 0.0)
    per_inst = jnp.sum(bce, axis=(1, 2))
    # normalize_emulate_roi_pooling: / (gt_w_px * gt_h_px) * (S*S), then the
    # final M is scaled by alpha / (S*S) — net effect: / gt box area in
    # proto pixels (gt box itself, not the padded crop window)
    gt_w = (boxes_t[:, 2] - boxes_t[:, 0]) * s
    gt_h = (boxes_t[:, 3] - boxes_t[:, 1]) * s
    area = jnp.maximum(gt_w * gt_h, 1e-4)
    per_inst = per_inst / area
    per_inst = jnp.where(sel_valid, per_inst, 0.0)
    l_mask = cfg.mask_alpha * jnp.sum(per_inst)
    if not cfg.use_maskiou:
        return l_mask

    # maskiou targets: sigmoid + crop (net input), then binarize at 0.5 for
    # the true-IoU target; discard instances with tiny gt masks
    pred_sig = jnp.where(inside, jax.nn.sigmoid(pred), 0.0)
    pred_bin = (pred_sig > 0.5).astype(jnp.float32)
    inter = jnp.sum(pred_bin * mask_t, axis=(1, 2))
    union = jnp.sum(pred_bin, axis=(1, 2)) + jnp.sum(mask_t, axis=(1, 2)) - inter
    iou_t = inter / jnp.maximum(union, 1e-6)
    gt_area = jnp.sum(mask_t, axis=(1, 2))
    valid = sel_valid & (gt_area > cfg.discard_mask_area)
    label = jnp.clip(gt_classes[sel_gt], 0)
    miou = {"input": pred_sig, "iou_t": iou_t, "label": label, "valid": valid}
    return l_mask, miou


def mask_iou_loss(maskiou_fn, miou: dict, cfg: YolactLossConfig):
    """FastMaskIoUNet regression loss (upstream MultiBoxLoss.mask_iou_loss).

    maskiou_fn: masks [M, S, S] -> [M, num_classes-1] predicted IoUs.
    miou: batched targets from mask_loss, leading dims [B, M].
    """
    b, m, s, _ = miou["input"].shape
    pred = maskiou_fn(miou["input"].reshape(b * m, s, s))  # [B*M, C-1]
    sel = jnp.take_along_axis(
        pred, miou["label"].reshape(b * m)[:, None], axis=1)[:, 0]
    l1 = smooth_l1(sel, miou["iou_t"].reshape(b * m))
    l1 = jnp.where(miou["valid"].reshape(b * m), l1, 0.0)
    return cfg.maskiou_alpha * jnp.sum(l1)


def semantic_loss(sem_logits, gt_classes, gt_masks_sem,
                  cfg: YolactLossConfig, gt_crowd=None):
    """Aux semantic loss: per-class BCE on P3-scale class maps.

    gt_masks_sem: [G, Hs, Ws]; target per class c = max over instances of
    that class (reference builds segment_t with max).
    """
    hs, ws, c = sem_logits.shape
    g = gt_classes.shape[0]
    valid = gt_classes >= 0
    if gt_crowd is not None:
        # the reference splits crowds off labels/masks before the semantic
        # loss — a crowd RLE must not paint its class channel
        valid = valid & ~gt_crowd
    onehot = jax.nn.one_hot(jnp.clip(gt_classes, 0), c, dtype=sem_logits.dtype)
    onehot = jnp.where(valid[:, None], onehot, 0.0)
    # [Hs, Ws, C] target = max over instances
    target = jnp.max(
        gt_masks_sem[:, :, :, None] * onehot[:, None, None, :], axis=0
    )
    x = sem_logits
    bce = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return cfg.semantic_alpha * jnp.sum(bce) / (hs * ws)


def total_loss(preds, sem_logits, targets, priors, key, cfg: YolactLossConfig,
               maskiou_fn=None):
    """Batch loss dict. targets: dict of padded arrays per image:
    boxes [B,G,4] (normalized), classes [B,G] (-1 pad), crowd [B,G],
    masks_proto [B,G,S,S], masks_sem [B,G,Hs,Ws].

    With cfg.use_maskiou, ``maskiou_fn`` (masks [M,S,S] -> [M, C-1]) must
    be supplied (closes over the model's FastMaskIoUNet params so its
    gradients flow); adds the 'I' term (YOLACT++).
    """
    b = preds["loc"].shape[0]
    use_miou = cfg.use_maskiou and maskiou_fn is not None

    def per_image(loc, conf, coeff, proto, sem, boxes, classes, crowd,
                  masks_proto, masks_sem, key):
        conf_t, midx, loc_t = match_priors(boxes, classes, crowd, priors, cfg)
        pos = conf_t > 0
        l_loc = jnp.sum(
            jnp.where(pos[:, None], smooth_l1(loc, loc_t), 0.0)
        ) * cfg.bbox_alpha
        m_ret = mask_loss(proto, coeff, conf_t, midx, boxes, masks_proto,
                          key, cfg, gt_classes=classes)
        l_mask, miou = m_ret if cfg.use_maskiou else (m_ret, 0)
        l_sem = semantic_loss(sem, classes, masks_sem, cfg, gt_crowd=crowd)
        return l_loc, l_mask, l_sem, conf_t, jnp.sum(pos), miou

    keys = jax.random.split(key, b)
    l_loc, l_mask, l_sem, conf_t, npos, miou = jax.vmap(per_image)(
        preds["loc"], preds["conf"], preds["coeff"], preds["proto"],
        sem_logits, targets["boxes"], targets["classes"], targets["crowd"],
        targets["masks_proto"], targets["masks_sem"], keys,
    )
    l_conf = ohem_conf_loss(preds["conf"], conf_t, cfg)
    total_pos = jnp.maximum(jnp.sum(npos), 1)
    losses = {
        "B": jnp.sum(l_loc) / total_pos,
        "C": l_conf / total_pos,
        "M": jnp.sum(l_mask) / total_pos,
        "S": jnp.sum(l_sem) / (preds["loc"].shape[0]),
    }
    if use_miou:
        # upstream normalizes 'I' by total_num_pos like B/C/M
        losses["I"] = mask_iou_loss(maskiou_fn, miou, cfg) / total_pos
    losses["total"] = sum(losses.values())
    return losses
