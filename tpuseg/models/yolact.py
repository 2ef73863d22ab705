"""YOLACT — real-time instance segmentation (Yolact.jittor capability).

Architecture per the YOLACT paper (arXiv:1904.02689, cited at reference
README.md:356) and Yolact.jittor's ``yolact.py`` [SURVEY.md §2.2]:
ResNet/DarkNet backbone -> FPN (P3..P7) -> one shared PredictionModule
(class / box / mask-coefficient heads over all levels) + ProtoNet at P3
producing k=32 prototype masks; instance masks assemble at post-process
as ``sigmoid(proto @ coeffs)`` cropped to boxes.

TPU-native layout: the whole pipeline — preprocess, backbone, heads,
decode, Fast-NMS, mask assembly and crop — is ONE jit program with static
shapes (550x550 input -> 19248 priors -> top_k=200 per class -> 100 dets).
Fast-NMS is already loop-free matrix code (ideal for the MXU/VPU); mask
assembly is a single [138*138, 32] x [32, 100] matmul.

yolact_base quirks reproduced for weight parity:
  - square anchors (w == h == scale * sqrt(ar) / 550) — upstream keeps this
    historical bug for its released weights
  - prototypes ReLU-activated; coefficients tanh-activated
  - conf softmax over 81 classes (background col 0 dropped at detect)
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import boxes as box_ops
from tpuseg.nn import darknet as darknet_nn
from tpuseg.nn import fpn as fpn_nn
from tpuseg.nn import layers as L
from tpuseg.nn import resnet as resnet_nn
from tpuseg.ops import nms as nms_ops


@dataclass(frozen=True)
class YolactConfig:
    backbone: str = "resnet50"  # resnet50 | resnet101 | darknet53
    img_size: int = 550
    num_classes: int = 81  # incl background
    mask_dim: int = 32
    fpn_channels: int = 256
    aspect_ratios: tuple = (1.0, 0.5, 2.0)
    # per-level anchor scales: scalar per level (yolact) or tuple per level
    # (yolact++ uses 3 sub-scales i * 2^(j/3))
    scales: tuple = (24, 48, 96, 192, 384)
    use_square_anchors: bool = True
    conf_thresh: float = 0.05
    nms_iou_thresh: float = 0.5
    nms_top_k: int = 200
    max_num_detections: int = 100
    variances: tuple = (0.1, 0.2)
    # Fast-NMS (default) vs the reference's optional traditional per-class
    # greedy NMS (layers/functions/detection.py use_fast_nms flag)
    use_fast_nms: bool = True
    # bench-only speed knob: approx_max_k candidate selection in Fast-NMS
    # (recall ~0.99). Eval paths keep the exact default for mAP parity.
    approx_topk: bool = False
    # two-stage candidate selection: first compact the top `prior_topk`
    # priors by max class score (one cheap [N] top-k), then run per-class
    # top-k / Fast-NMS over the compacted set. EXACT whenever at most
    # prior_topk priors pass conf_thresh (always true for trained weights
    # at 0.05 — typical survivors are a few hundred of 19248); 0 = off.
    # This removes the [C, N] top-k that dominated the detect tail on TPU
    # (34 ms -> ~0.1 ms at batch 32).
    prior_topk: int = 0
    # YOLACT++ extras
    dcn_backbone: bool = False  # DCNv2 in stages 1-3, every 3rd block
    use_maskiou: bool = False  # FastMaskIoUNet mask rescoring

    def level_scales(self, li: int) -> tuple:
        s = self.scales[li]
        return tuple(s) if isinstance(s, (tuple, list)) else (s,)

    @property
    def num_anchors(self):
        return len(self.aspect_ratios) * len(self.level_scales(0))

    @property
    def proto_size(self):
        # P3 (three ceil-halvings) upsampled x2: 550 -> 69*2 = 138
        # (img_size // 4 is off by one for 550)
        return level_sizes(self)[0] * 2


def level_sizes(cfg: YolactConfig):
    """Feature map sizes for P3..P7 (conv stride arithmetic, 550 -> 69,35,18,9,5)."""
    sizes = []
    s = cfg.img_size
    # backbone convs: ceil division at each stride-2 conv with k3 p1
    def conv_out(n):
        return (n + 1) // 2

    x = cfg.img_size
    for _ in range(3):  # stride 8 (stem s2, pool s2, layer2 s2)
        x = conv_out(x)
    p3 = x
    p4 = conv_out(p3)
    p5 = conv_out(p4)
    p6 = conv_out(p5)
    p7 = conv_out(p6)
    return (p3, p4, p5, p6, p7)


@functools.lru_cache(maxsize=8)
def make_priors_np(cfg: YolactConfig) -> np.ndarray:
    """Priors [N, 4] (cx, cy, w, h) normalized — yolact.py make_priors.

    Loop order matches the reference: upstream iterates
    ``for ars in aspect_ratios: for scale in scales: for ar in ars`` with a
    single ratio group, i.e. SCALE-major / ratio-minor per position. This
    only matters for multi-sub-scale configs (yolact++: 3 scales x 3
    ratios per cell — the head's 9 channel groups are scale-major).
    """
    priors = []
    for li, size_hw in enumerate(level_sizes(cfg)):
        scales = cfg.level_scales(li)
        for j in range(size_hw):
            for i in range(size_hw):
                cx = (i + 0.5) / size_hw
                cy = (j + 0.5) / size_hw
                for scale in scales:
                    for ar in cfg.aspect_ratios:
                        ar_s = math.sqrt(ar)
                        w = scale * ar_s / cfg.img_size
                        h = scale / ar_s / cfg.img_size
                        if cfg.use_square_anchors:
                            h = w
                        priors.append([cx, cy, w, h])
    return np.asarray(priors, np.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _protonet(params: dict, x: jax.Array) -> jax.Array:
    """P3 -> [B, 2*P3, 2*P3, mask_dim] prototypes (relu-activated).

    yolact.py ``make_net`` of mask_proto_net: 3x (conv3x3 256 + relu),
    bilinear x2 upsample, conv3x3 256 + relu, conv1x1 mask_dim; final relu.
    """
    for i in range(3):
        x = L.relu(L.conv2d(x, params[f"conv{i}"], padding=1))
    x = jax.image.resize(
        x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
        "linear", antialias=False
    )
    x = L.relu(L.conv2d(x, params["conv3"], padding=1))
    x = L.conv2d(x, params["conv4"])  # 1x1 to mask_dim, no activation here
    return L.relu(x)


def _prediction_head(params: dict, x: jax.Array, cfg: YolactConfig):
    """Shared PredictionModule applied to one level.

    Returns (loc [B,hw*na,4], conf [B,hw*na,C], coeff [B,hw*na,k]).
    """
    b = x.shape[0]
    x = L.relu(L.conv2d(x, params["upfeature"], padding=1))
    loc = L.conv2d(x, params["bbox"], padding=1).reshape(b, -1, 4)
    conf = L.conv2d(x, params["conf"], padding=1).reshape(b, -1, cfg.num_classes)
    coeff = jnp.tanh(
        L.conv2d(x, params["mask"], padding=1).reshape(b, -1, cfg.mask_dim)
    )
    return loc, conf, coeff


def _resnet_cfg(cfg: YolactConfig) -> resnet_nn.ResNetConfig:
    depth = int(cfg.backbone[6:])
    dcn = (1, 2, 3) if cfg.dcn_backbone else ()
    # dbolya backbone.py: resnet101_dcn_inter3_backbone passes
    # dcn_interval=3; resnet50_dcnv2_backbone keeps the default interval 1
    # (every block of stages 2-4 is deformable). Both cover whole stages
    # (dcn_layers == stage depth), so stage+interval captures the layout.
    # remat_stages=(): the 550 canvas fits HBM without remat, and the
    # recompute costs 19% on the chip train step (150 vs 184 img/s A/B,
    # round 4) — remat COMPOSES with train-mode BN now
    # (layers.checkpoint_with_bn), it's just not worth paying here
    return resnet_nn.ResNetConfig(
        depth=depth, stride_in_1x1=False, frozen_bn=False,
        dcn_stages=dcn, dcn_interval=3 if depth == 101 else 1,
        remat_stages=())


def backbone_forward(params: dict, images: jax.Array, cfg: YolactConfig) -> dict:
    if cfg.backbone.startswith("resnet"):
        return resnet_nn.forward(params["backbone"], images, _resnet_cfg(cfg))
    return darknet_nn.forward(params["backbone"], images)


def maskiou_net(params: dict, masks: jax.Array, cfg: YolactConfig) -> jax.Array:
    """FastMaskIoUNet (YOLACT++): [N, S, S] masks -> [N, num_classes-1] iou.

    yolact.py maskiou_net spec with include_last_relu=True: conv stack
    (8,16,32,64,128 stride 2, relu) -> 1x1 conv to classes + relu ->
    SPATIAL max pool (F.max_pool2d over the full extent). The 1x1 conv
    runs BEFORE the pool and the activation is relu, not sigmoid — max
    and a signed linear map do not commute."""
    x = masks[..., None]
    for i, ch in enumerate((8, 16, 32, 64, 128)):
        x = L.relu(L.conv2d(x, params[f"conv{i}"], stride=2, padding=1))
    x = L.relu(L.conv2d(x, params["conv_last"]))  # 1x1 to classes
    return jnp.max(x, axis=(1, 2))  # spatial max pool -> [N, C-1]


def forward(params: dict, images: jax.Array, cfg: YolactConfig) -> dict:
    """images [B,550,550,3] normalized -> raw prediction dict."""
    feats = backbone_forward(params, images, cfg)
    pyramid = fpn_nn.yolact_fpn_forward(params["fpn"], feats)  # [P3..P7]
    proto = _protonet(params["proto"], pyramid[0])
    locs, confs, coeffs = [], [], []
    for p in pyramid:
        loc, conf, coeff = _prediction_head(params["pred"], p, cfg)
        locs.append(loc)
        confs.append(conf)
        coeffs.append(coeff)
    return {
        "proto": proto,
        "loc": jnp.concatenate(locs, 1),
        "conf": jnp.concatenate(confs, 1),
        "coeff": jnp.concatenate(coeffs, 1),
    }


# ---------------------------------------------------------------------------
# Detect (layers/functions/detection.py) + mask assembly (output_utils.py)
# ---------------------------------------------------------------------------


def detect(preds: dict, priors: jax.Array, cfg: YolactConfig,
           params_miou: dict | None = None) -> dict:
    """Raw predictions -> padded detections with assembled cropped masks.

    Per image: decode loc vs priors (SSD variances), softmax conf minus
    background, Fast-NMS per class at top_k, global top max_num_detections,
    mask = crop(sigmoid(proto @ coeff), box) at proto resolution.
    Returns dict with boxes (normalized xyxy), scores, classes (0-based,
    no background), masks [B, max_det, S, S], valid. With
    cfg.use_maskiou + params_miou, adds rescored 'mask_scores' (YOLACT++).
    """

    def per_image(loc, conf, coeff, proto):
        # the reference's conf_thresh gates PRIORS by their max class
        # score (Detect.__call__: conf_scores > self.conf_thresh); a
        # surviving prior keeps ALL its per-class scores, however small
        if cfg.prior_topk and cfg.prior_topk < conf.shape[0]:
            # two-stage: compact surviving priors before per-class work.
            # Equals the one-stage path whenever <= prior_topk priors pass
            # the gate (tests/test_yolact.py::test_prior_topk_two_stage).
            # The gate runs in LOGIT space: max_c softmax(l)_c =
            # exp(max_fg l - logsumexp(l)), and exp is monotonic, so
            # ranking/thresholding on (max_fg l - lse) selects the same
            # priors as on the softmax score — the [N, 81] softmax and the
            # [N] box decode then only run on the prior_topk survivors
            # (9.4x fewer priors at 550px).
            lse = jax.nn.logsumexp(conf, axis=-1)  # [N]
            log_max_s = jnp.max(conf[:, 1:], axis=-1) - lse
            prior_ok = log_max_s > jnp.log(jnp.float32(cfg.conf_thresh))
            _, pidx, pv = box_ops.masked_topk(log_max_s, prior_ok,
                                              cfg.prior_topk)
            scores = jax.nn.softmax(conf[pidx], -1)[:, 1:].T  # [C-1, K]
            scores = jnp.where(pv[None, :], scores, 0.0)
            boxes = box_ops.ssd_decode(loc[pidx], priors[pidx],
                                       cfg.variances)
            prior_map = pidx  # compacted slot -> original prior
        else:
            boxes = box_ops.ssd_decode(loc, priors, cfg.variances)  # [N,4]
            scores = jax.nn.softmax(conf, -1)[:, 1:].T  # [C-1, N]
            max_s = jnp.max(scores, axis=0)  # [N]
            prior_ok = max_s > cfg.conf_thresh
            scores = jnp.where(prior_ok[None, :], scores, 0.0)
            prior_map = None
        if cfg.use_fast_nms:
            cboxes, cscores, cclasses, cidx, keep = nms_ops.fast_nms(
                boxes, scores, cfg.nms_iou_thresh, cfg.nms_top_k,
                exact_topk=not cfg.approx_topk,
            )
        else:
            # traditional_nms: exact greedy per class (coordinate-offset
            # batched form) over the per-class top_k candidates
            c = scores.shape[0]
            top_s, top_i, top_v = box_ops.masked_topk(
                scores, scores > cfg.conf_thresh, cfg.nms_top_k)  # [C, K]
            cboxes = boxes[top_i]  # [C, K, 4]
            cls_ids = jnp.broadcast_to(
                jnp.arange(c)[:, None], top_i.shape)
            keep = nms_ops.batched_nms_mask(
                cboxes.reshape(-1, 4), top_s.reshape(-1),
                cls_ids.reshape(-1), cfg.nms_iou_thresh,
                valid=top_v.reshape(-1)).reshape(c, -1)
            cscores, cclasses, cidx = top_s, cls_ids, top_i
        # flatten classes and take global top-k (Detect: max_num_detections).
        # No further conf_thresh here: the prior gate (fast path) /
        # per-class gate (traditional path) already ran, and low per-class
        # scores of surviving priors are legitimate detections upstream
        flat_scores = jnp.where(keep, cscores, 0.0).reshape(-1)
        flat_boxes = cboxes.reshape(-1, 4)
        flat_classes = cclasses.reshape(-1)
        flat_pidx = cidx.reshape(-1)
        top_s, sel, valid = box_ops.masked_topk(
            flat_scores, flat_scores > 0.0, cfg.max_num_detections
        )
        out_boxes = flat_boxes[sel]
        out_classes = flat_classes[sel]
        sel_pidx = flat_pidx[sel]
        if prior_map is not None:  # compacted slot -> original prior
            sel_pidx = prior_map[sel_pidx]
        out_coeff = coeff[sel_pidx]  # [K, mask_dim]
        # mask assembly: [S,S,k] @ [k,K] -> [S,S,K]
        m = jnp.einsum("hwk,nk->hwn", proto, out_coeff)
        m = jax.nn.sigmoid(m)
        m = _crop_masks(m, out_boxes)
        masks_out = jnp.transpose(m, (2, 0, 1))
        out = {
            "boxes": out_boxes,
            "scores": jnp.where(valid, top_s, 0.0),
            "classes": out_classes,
            "masks": masks_out,
            "valid": valid,
        }
        if cfg.use_maskiou and params_miou is not None:
            iou = maskiou_net(params_miou, masks_out, cfg)  # [K, C-1]
            cls_iou = jnp.take_along_axis(
                iou, out_classes[:, None], axis=1)[:, 0]
            out["mask_scores"] = out["scores"] * cls_iou
        return out

    return jax.vmap(per_image)(
        preds["loc"], preds["conf"], preds["coeff"], preds["proto"]
    )


def _crop_masks(masks: jax.Array, boxes_norm: jax.Array, padding: int = 1) -> jax.Array:
    """Zero mask pixels outside each box (yolact box_utils.crop).

    masks [S,S,K]; boxes normalized xyxy. Matches sanitize_coordinates
    (cast=False, padding=1): scale to the mask grid, pad 1px each side,
    clamp, exclusive right edge.
    """
    s = masks.shape[0]
    x1, y1, x2, y2 = [boxes_norm[:, i] * s for i in range(4)]
    x1, x2 = jnp.minimum(x1, x2), jnp.maximum(x1, x2)
    y1, y2 = jnp.minimum(y1, y2), jnp.maximum(y1, y2)
    x1 = jnp.clip(x1 - padding, 0)
    x2 = jnp.clip(x2 + padding, None, s)
    y1 = jnp.clip(y1 - padding, 0)
    y2 = jnp.clip(y2 + padding, None, s)
    rows = jax.lax.broadcasted_iota(jnp.float32, (s, s, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (s, s, 1), 1)
    inside = (
        (rows >= y1[None, None, :])
        & (rows < y2[None, None, :])
        & (cols >= x1[None, None, :])
        & (cols < x2[None, None, :])
    )
    return jnp.where(inside, masks, 0.0)


def forward_train(params: dict, images: jax.Array, cfg: YolactConfig):
    """Training forward: raw predictions + semantic seg logits at P3 scale
    (yolact.py: semantic_seg_conv on the first FPN level, train only)."""
    feats = backbone_forward(params, images, cfg)
    pyramid = fpn_nn.yolact_fpn_forward(params["fpn"], feats)
    proto = _protonet(params["proto"], pyramid[0])
    locs, confs, coeffs = [], [], []
    for p in pyramid:
        loc, conf, coeff = _prediction_head(params["pred"], p, cfg)
        locs.append(loc)
        confs.append(conf)
        coeffs.append(coeff)
    sem = L.conv2d(pyramid[0], params["semantic"])
    preds = {
        "proto": proto,
        "loc": jnp.concatenate(locs, 1),
        "conf": jnp.concatenate(confs, 1),
        "coeff": jnp.concatenate(coeffs, 1),
    }
    return preds, sem


def full_pipeline(params: dict, priors: jax.Array, images_u8: jax.Array,
                  cfg: YolactConfig) -> dict:
    """uint8 RGB [B,H,W,3] -> detections. The single-jit-program path."""
    from tpuseg.ops.preprocess import yolact_preprocess

    x = yolact_preprocess(images_u8, size=cfg.img_size)
    preds = forward(params, x, cfg)
    return detect(preds, priors, cfg, params_miou=params.get("maskiou"))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: YolactConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 32))
    fc = cfg.fpn_channels
    na = cfg.num_anchors
    if cfg.backbone.startswith("resnet"):
        backbone = resnet_nn.init_params(next(keys), _resnet_cfg(cfg), dtype)
        in_ch = (512, 1024, 2048)
    else:
        backbone = darknet_nn.init_params(next(keys), dtype=dtype)
        in_ch = (256, 512, 1024)
    maskiou = None
    if cfg.use_maskiou:
        chans = (1, 8, 16, 32, 64, 128)
        maskiou = {
            f"conv{i}": L.conv_params(next(keys), 3, 3, chans[i],
                                      chans[i + 1], dtype=dtype)
            for i in range(5)
        }
        maskiou["conv_last"] = L.conv_params(
            next(keys), 1, 1, 128, cfg.num_classes - 1, dtype=dtype)
    return {
        **({"maskiou": maskiou} if maskiou is not None else {}),
        "backbone": backbone,
        "fpn": fpn_nn.yolact_fpn_init(next(keys), in_ch, fc, dtype),
        "proto": {
            "conv0": L.conv_params(next(keys), 3, 3, fc, 256, dtype=dtype),
            "conv1": L.conv_params(next(keys), 3, 3, 256, 256, dtype=dtype),
            "conv2": L.conv_params(next(keys), 3, 3, 256, 256, dtype=dtype),
            "conv3": L.conv_params(next(keys), 3, 3, 256, 256, dtype=dtype),
            "conv4": L.conv_params(next(keys), 1, 1, 256, cfg.mask_dim, dtype=dtype),
        },
        "pred": {
            "upfeature": L.conv_params(next(keys), 3, 3, fc, 256, dtype=dtype),
            "bbox": L.conv_params(next(keys), 3, 3, 256, na * 4, dtype=dtype),
            "conf": L.conv_params(next(keys), 3, 3, 256, na * cfg.num_classes, dtype=dtype),
            "mask": L.conv_params(next(keys), 3, 3, 256, na * cfg.mask_dim, dtype=dtype),
        },
        "semantic": L.conv_params(next(keys), 1, 1, fc, cfg.num_classes - 1, dtype=dtype),
    }
