"""YOLOv3 detector (yolo.jittor capability: COCO boxes, no masks).

Reference behavior (SURVEY.md §2.4): Darknet-53 backbone + 3-scale detection
heads with per-scale anchors, letterbox input (416/608), confidence filter +
per-class NMS. The Jittor port follows the standard YOLOv3 layout
(upstream darknet yolov3.cfg); we implement that architecture directly as a
single statically-shaped jit program: every stage below — preprocess →
backbone → heads → decode → NMS → top-k — runs on device with padded shapes.

Anchors (pixels — the standard COCO yolov3.cfg values; darknet anchors
are absolute network-input pixels and are NOT rescaled for 608 configs,
matching the official cfg files):
  stride 32: (116,90) (156,198) (373,326)
  stride 16: (30,61) (62,45) (59,119)
  stride  8: (10,13) (16,30) (33,23)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.core.boxes import masked_topk
from tpuseg.nn import darknet
from tpuseg.nn import layers as L
from tpuseg.ops import nms as nms_ops

ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),  # stride 32 head (from C5)
    ((30, 61), (62, 45), (59, 119)),  # stride 16
    ((10, 13), (16, 30), (33, 23)),  # stride 8
)
STRIDES = (32, 16, 8)


@dataclass(frozen=True)
class YoloV3Config:
    num_classes: int = 80
    input_size: int = 416
    conf_thresh: float = 0.005
    nms_thresh: float = 0.45
    max_det: int = 100
    pre_nms_topk: int = 1000

    @property
    def num_attrib(self):
        return 5 + self.num_classes


def _cbl(x, p, cfg, stride=1, padding=None, kernel=3):
    if padding is None:
        padding = kernel // 2
    x = L.conv2d(x, p["conv"], stride=stride, padding=padding)
    x = L.batch_norm(x, p["bn"])
    return jnp.where(x > 0, x, 0.1 * x)


def _convset(x, ps, cfg):
    """5-conv block: 1x1/3x3 alternating (yolov3 neck)."""
    for i, p in enumerate(ps):
        x = _cbl(x, p, cfg, kernel=1 if i % 2 == 0 else 3,
                 padding=0 if i % 2 == 0 else 1)
    return x


def forward(params: dict, images: jax.Array, cfg: YoloV3Config):
    """images [B,S,S,3] normalized -> list of 3 raw head maps
    [(B,h,w,3*(5+C))] at strides (32, 16, 8)."""
    feats = darknet.forward(params["backbone"], images)
    outs = []
    # head 0: from C5
    x = _convset(feats["c5"], params["neck0"], cfg)
    h = _cbl(x, params["head0"]["conv"], cfg)
    outs.append(L.conv2d(h, params["head0"]["out"]))
    # head 1: branch -> upsample -> concat C4
    b = _cbl(x, params["branch0"], cfg, kernel=1, padding=0)
    b = L.resize_nearest(b, (feats["c4"].shape[1], feats["c4"].shape[2]))
    x = jnp.concatenate([b, feats["c4"]], axis=-1)
    x = _convset(x, params["neck1"], cfg)
    h = _cbl(x, params["head1"]["conv"], cfg)
    outs.append(L.conv2d(h, params["head1"]["out"]))
    # head 2: branch -> upsample -> concat C3
    b = _cbl(x, params["branch1"], cfg, kernel=1, padding=0)
    b = L.resize_nearest(b, (feats["c3"].shape[1], feats["c3"].shape[2]))
    x = jnp.concatenate([b, feats["c3"]], axis=-1)
    x = _convset(x, params["neck2"], cfg)
    h = _cbl(x, params["head2"]["conv"], cfg)
    outs.append(L.conv2d(h, params["head2"]["out"]))
    return outs


def decode(outs: list, cfg: YoloV3Config):
    """Raw head maps -> (boxes_xyxy [B,N,4] in input px, obj [B,N],
    cls_probs [B,N,C]) with N = sum over levels of h*w*3."""
    all_boxes, all_obj, all_cls = [], [], []
    for out, anchors, stride in zip(outs, ANCHORS, STRIDES):
        b, h, w, _ = out.shape
        na = len(anchors)
        out = out.reshape(b, h, w, na, cfg.num_attrib)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        txy = jax.nn.sigmoid(out[..., 0:2])
        bx = (txy[..., 0] + gx[..., None]) * stride
        by = (txy[..., 1] + gy[..., None]) * stride
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        bw = jnp.exp(out[..., 2]) * aw
        bh = jnp.exp(out[..., 3]) * ah
        boxes = jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1
        )
        obj = jax.nn.sigmoid(out[..., 4])
        cls = jax.nn.sigmoid(out[..., 5:])
        n = h * w * na
        all_boxes.append(boxes.reshape(b, n, 4))
        all_obj.append(obj.reshape(b, n))
        all_cls.append(cls.reshape(b, n, cfg.num_classes))
    return (
        jnp.concatenate(all_boxes, 1),
        jnp.concatenate(all_obj, 1),
        jnp.concatenate(all_cls, 1),
    )


def postprocess(boxes, obj, cls_probs, cfg: YoloV3Config):
    """Per-image: score = obj * max_cls; top-k prefilter; class-aware NMS.

    Returns dict of padded [B, max_det] detections.
    """

    def per_image(boxes_i, obj_i, cls_i):
        cls_conf = jnp.max(cls_i, -1)
        cls_id = jnp.argmax(cls_i, -1)
        scores = obj_i * cls_conf
        valid = scores > cfg.conf_thresh
        top_s, idx, top_valid = masked_topk(scores, valid, cfg.pre_nms_topk)
        sel_boxes = boxes_i[idx]
        sel_cls = cls_id[idx]
        keep = nms_ops.batched_nms_mask(
            sel_boxes, top_s, sel_cls, cfg.nms_thresh, valid=top_valid
        )
        fin_s, fin_idx, fin_valid = masked_topk(top_s, keep, cfg.max_det)
        return {
            "boxes": sel_boxes[fin_idx],
            "scores": jnp.where(fin_valid, fin_s, 0.0),
            "classes": sel_cls[fin_idx],
            "valid": fin_valid,
        }

    return jax.vmap(per_image)(boxes, obj, cls_probs)


def detect(params: dict, images: jax.Array, cfg: YoloV3Config):
    """Full jit-able pipeline: normalized images -> padded detections."""
    outs = forward(params, images, cfg)
    boxes, obj, cls_probs = decode(outs, cfg)
    return postprocess(boxes, obj, cls_probs, cfg)


# ---------------------------------------------------------------------------
# Param init
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: YoloV3Config, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))

    def cb(kh, kw, cin, cout):
        return {
            "conv": L.conv_params(next(keys), kh, kw, cin, cout, bias=False, dtype=dtype),
            "bn": L.bn_params(cout, dtype),
        }

    def convset(cin, mid):
        # 1x1(mid) 3x3(2mid) 1x1(mid) 3x3(2mid) 1x1(mid)
        return [
            cb(1, 1, cin, mid),
            cb(3, 3, mid, mid * 2),
            cb(1, 1, mid * 2, mid),
            cb(3, 3, mid, mid * 2),
            cb(1, 1, mid * 2, mid),
        ]

    na = 3
    out_ch = na * cfg.num_attrib
    return {
        "backbone": darknet.init_params(next(keys), dtype=dtype),
        "neck0": convset(1024, 512),
        "head0": {
            "conv": cb(3, 3, 512, 1024),
            "out": L.conv_params(next(keys), 1, 1, 1024, out_ch, dtype=dtype),
        },
        "branch0": cb(1, 1, 512, 256),
        "neck1": convset(768, 256),  # concat(256 upsampled, C4 512)
        "head1": {
            "conv": cb(3, 3, 256, 512),
            "out": L.conv_params(next(keys), 1, 1, 512, out_ch, dtype=dtype),
        },
        "branch1": cb(1, 1, 256, 128),
        "neck2": convset(384, 128),
        "head2": {
            "conv": cb(3, 3, 128, 256),
            "out": L.conv_params(next(keys), 1, 1, 256, out_ch, dtype=dtype),
        },
    }
