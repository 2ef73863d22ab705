"""Mask R-CNN checkpoint conversion (maskrcnn-benchmark state dicts).

The reference loads ``e2e_mask_rcnn_R_50_FPN_1x.pth`` etc. (README.md:266)
whose (module.-stripped) names are:
  backbone.body.stem.{conv1,bn1}             (FrozenBN: w/b/mean/var buffers)
  backbone.body.layer{1-4}.{i}.{conv,bn}{1-3}[,downsample.{0,1}]
  backbone.fpn.fpn_inner{1-4} / fpn_layer{1-4}
  rpn.head.{conv,cls_logits,bbox_pred}
  roi_heads.box.feature_extractor.{fc6,fc7}
  roi_heads.box.predictor.{cls_score,bbox_pred}
  roi_heads.mask.feature_extractor.mask_fcn{1-4}
  roi_heads.mask.predictor.{conv5_mask,mask_fcn_logits}
"""
from __future__ import annotations

import numpy as np

from tpuseg.models.maskrcnn import MaskRCNNConfig

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _strip_module(flat: dict) -> dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in flat.items()
    }


def _conv(flat, name):
    w = np.asarray(flat[f"{name}.weight"], np.float32)
    p = {"weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    p["bias"] = (
        np.asarray(flat[f"{name}.bias"], np.float32)
        if f"{name}.bias" in flat else None
    )
    return p


def _linear(flat, name):
    return {
        "weight": np.ascontiguousarray(
            np.asarray(flat[f"{name}.weight"], np.float32).T),
        "bias": np.asarray(flat[f"{name}.bias"], np.float32),
    }


def _bn(flat, name):
    # FrozenBatchNorm2d buffers; some Caffe2 conversions lack mean/var
    # (already folded) — default to identity stats then
    c = len(np.asarray(flat[f"{name}.weight"]))
    return {
        "weight": np.asarray(flat[f"{name}.weight"], np.float32),
        "bias": np.asarray(flat[f"{name}.bias"], np.float32),
        "running_mean": np.asarray(
            flat.get(f"{name}.running_mean", np.zeros(c)), np.float32),
        "running_var": np.asarray(
            flat.get(f"{name}.running_var", np.ones(c)), np.float32),
    }


def map_resnet_stage(flat: dict, prefix: str, nblocks: int) -> list:
    """``layer{i}.{b}.conv/bn/downsample`` name mapping for one ResNet
    stage — the single copy shared by the Mask R-CNN FPN, C4, and
    RetinaNet converters (each previously carried its own)."""
    blocks = []
    for bi in range(nblocks):
        base = f"{prefix}.{bi}"
        p = {
            "conv1": _conv(flat, f"{base}.conv1"),
            "bn1": _bn(flat, f"{base}.bn1"),
            "conv2": _conv(flat, f"{base}.conv2"),
            "bn2": _bn(flat, f"{base}.bn2"),
            "conv3": _conv(flat, f"{base}.conv3"),
            "bn3": _bn(flat, f"{base}.bn3"),
            "downsample": None,
            # detectron checkpoints carry no DCN; the key keeps the tree
            # structurally identical to resnet.init_params
            "conv2_offset": None,
        }
        if f"{base}.downsample.0.weight" in flat:
            p["downsample"] = {
                "conv": _conv(flat, f"{base}.downsample.0"),
                "bn": _bn(flat, f"{base}.downsample.1"),
            }
        blocks.append(p)
    return blocks


def map_resnet_body(flat: dict, depth: int, body: str = "backbone.body.",
                    stages: int = 4) -> dict:
    """stem + layer1..layerN mapping shared by the detectron-family
    converters."""
    backbone = {"stem": {"conv": _conv(flat, body + "stem.conv1"),
                         "bn": _bn(flat, body + "stem.bn1")}}
    for si in range(stages):
        backbone[f"layer{si + 1}"] = map_resnet_stage(
            flat, f"{body}layer{si + 1}", STAGE_BLOCKS[depth][si])
    return backbone


def from_torch_state(flat: dict, cfg: MaskRCNNConfig) -> dict:
    flat = _strip_module(flat)
    backbone = map_resnet_body(flat, cfg.depth)

    fpn = {
        "inner": [_conv(flat, f"backbone.fpn.fpn_inner{i}") for i in range(1, 5)],
        "layer": [_conv(flat, f"backbone.fpn.fpn_layer{i}") for i in range(1, 5)],
    }
    rpn = {
        "conv": _conv(flat, "rpn.head.conv"),
        "cls": _conv(flat, "rpn.head.cls_logits"),
        "bbox": _conv(flat, "rpn.head.bbox_pred"),
    }
    # fc6 consumes flattened pooled features: torch flattens NCHW (C,7,7);
    # ours flattens NHWC (7,7,C) -> permute the input dimension accordingly
    fc6 = _linear(flat, "roi_heads.box.feature_extractor.fc6")
    c = cfg.fpn_channels
    r = cfg.pooler_resolution
    fc6_w = fc6["weight"].reshape(c, r, r, -1)  # [C, H, W, out] from torch CHW order
    fc6["weight"] = np.ascontiguousarray(
        fc6_w.transpose(1, 2, 0, 3).reshape(r * r * c, -1))
    box_headp = {
        "fc6": fc6,
        "fc7": _linear(flat, "roi_heads.box.feature_extractor.fc7"),
        "cls_score": _linear(flat, "roi_heads.box.predictor.cls_score"),
        "bbox_pred": _linear(flat, "roi_heads.box.predictor.bbox_pred"),
    }
    params = {
        "backbone": backbone,
        "fpn": fpn,
        "rpn": rpn,
        "box_head": box_headp,
    }
    if cfg.mask_on:  # Faster R-CNN checkpoints carry no mask head
        deconv_w = np.asarray(
            flat["roi_heads.mask.predictor.conv5_mask.weight"], np.float32)
        params["mask_head"] = {
            **{
                f"mask_fcn{i}": _conv(
                    flat, f"roi_heads.mask.feature_extractor.mask_fcn{i}")
                for i in range(1, 5)
            },
            "conv5_mask": {
                # torch ConvTranspose2d [in, out, kh, kw] -> [kh, kw, in, out]
                "weight": np.ascontiguousarray(deconv_w.transpose(2, 3, 0, 1)),
                "bias": np.asarray(
                    flat["roi_heads.mask.predictor.conv5_mask.bias"],
                    np.float32),
            },
            "mask_fcn_logits": _conv(
                flat, "roi_heads.mask.predictor.mask_fcn_logits"),
        }
    return params
