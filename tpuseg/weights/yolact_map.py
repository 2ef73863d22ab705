"""YOLACT checkpoint conversion: dbolya-style .pth state dicts -> param tree.

The reference zoo's YOLACT weights (``yolact_base_54_800000.pth``,
``yolact_resnet50_54_800000.pth``, README.md:205-221) keep upstream
dbolya/yolact module names:
  backbone.conv1 / backbone.bn1 / backbone.layers.{s}.{b}.*
  fpn.lat_layers.{i} (reversed: 0 = C5) / fpn.pred_layers.{i} (0 applied to
  P5 in forward order — reversed at load) / fpn.downsample_layers.{i}
  proto_net.{0,2,4,8,10}  (Sequential indices; 6 is the param-free upsample)
  prediction_layers.0.{upfeature.0, bbox_layer, conf_layer, mask_layer}
  semantic_seg_conv
"""
from __future__ import annotations

import numpy as np

from tpuseg.models.yolact import YolactConfig
from tpuseg.nn import resnet as resnet_nn


def _conv(flat: dict, name: str) -> dict:
    w = np.asarray(flat[f"{name}.weight"], np.float32)
    p = {"weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    p["bias"] = (
        np.asarray(flat[f"{name}.bias"], np.float32)
        if f"{name}.bias" in flat
        else None
    )
    return p


def from_torch_state(flat: dict, cfg: YolactConfig) -> dict:
    if cfg.backbone.startswith("resnet"):
        from tpuseg.models.yolact import _resnet_cfg

        rcfg = _resnet_cfg(cfg)
        # remap dbolya names -> torchvision names, then reuse the resnet loader
        remapped = {}
        for k, v in flat.items():
            if not k.startswith("backbone."):
                continue
            rest = k[len("backbone."):]
            if rest.startswith("layers."):
                parts = rest.split(".")
                rest = f"layer{int(parts[1]) + 1}." + ".".join(parts[2:])
            remapped[rest] = v
        backbone = resnet_nn.from_torch_state(remapped, rcfg)
    else:
        backbone = _darknet_from_torch(flat)

    nlv = 3  # lateral levels (C3, C4, C5)
    fpn = {
        "lat": [_conv(flat, f"fpn.lat_layers.{i}") for i in range(nlv)],
        # pred_layers.0 is applied to P5 in the reference forward; our
        # forward applies pred[j] to P_{3+j} -> reverse the checkpoint order
        "pred": [_conv(flat, f"fpn.pred_layers.{nlv - 1 - j}") for j in range(nlv)],
        "down": [_conv(flat, f"fpn.downsample_layers.{i}") for i in range(2)],
    }
    proto = {
        "conv0": _conv(flat, "proto_net.0"),
        "conv1": _conv(flat, "proto_net.2"),
        "conv2": _conv(flat, "proto_net.4"),
        "conv3": _conv(flat, "proto_net.8"),
        "conv4": _conv(flat, "proto_net.10"),
    }
    pred = {
        "upfeature": _conv(flat, "prediction_layers.0.upfeature.0"),
        "bbox": _conv(flat, "prediction_layers.0.bbox_layer"),
        "conf": _conv(flat, "prediction_layers.0.conf_layer"),
        "mask": _conv(flat, "prediction_layers.0.mask_layer"),
    }
    out = {
        "backbone": backbone,
        "fpn": fpn,
        "proto": proto,
        "pred": pred,
    }
    if "semantic_seg_conv.weight" in flat:
        out["semantic"] = _conv(flat, "semantic_seg_conv")
    # YOLACT++ FastMaskIoUNet: Sequential conv indices 0,2,4,6,8 + final 1x1
    for prefix in ("maskiou_net.maskiou_net.", "maskiou_net."):
        if f"{prefix}0.weight" in flat:
            miou = {
                f"conv{i}": _conv(flat, f"{prefix}{2 * i}")
                for i in range(5)
            }
            # the final 1x1 conv stays a conv: it runs BEFORE the spatial
            # max pool (FastMaskIoUNet, include_last_relu=True)
            miou["conv_last"] = _conv(flat, f"{prefix}10")
            out["maskiou"] = miou
            break
    return out


def _darknet_from_torch(flat: dict) -> dict:
    """dbolya DarkNetBackbone names: backbone._preconv / backbone.layers."""
    from tpuseg.nn.darknet import STAGES

    def cb(name):
        return {
            "conv": _conv(flat, f"{name}.conv"),
            "bn": {
                k: np.asarray(flat[f"{name}.bn.{k}"], np.float32)
                for k in ("weight", "bias", "running_mean", "running_var")
            },
        }

    params = {"stem": cb("backbone._preconv")}
    for si, (ch, nblocks) in enumerate(STAGES):
        base = f"backbone.layers.{si}"
        stage = {"down": cb(f"{base}.0"), "blocks": []}
        for bi in range(nblocks):
            stage["blocks"].append(
                {
                    "conv1": cb(f"{base}.{bi + 1}.0"),
                    "conv2": cb(f"{base}.{bi + 1}.1"),
                }
            )
        params[f"stage{si}"] = stage
    return params
