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


# ---------------------------------------------------------------------------
# inverse map: param tree -> dbolya-named flat state dict (reference-format
# checkpoint SAVE — yolact SavePath writes weights/<cfg>_<epoch>_<iter>.pth,
# README.md:232-233; a tpuseg training snapshot must load back through both
# load_weights and real torch)
# ---------------------------------------------------------------------------


def _inv_conv(out: dict, name: str, p: dict) -> None:
    w = np.asarray(p["weight"], np.float32)
    out[f"{name}.weight"] = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
    if p.get("bias") is not None:
        out[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _inv_bn(out: dict, name: str, p: dict) -> None:
    for k in ("weight", "bias", "running_mean", "running_var"):
        out[f"{name}.{k}"] = np.asarray(p[k], np.float32)
    # torch BN modules carry this buffer; strict load_state_dict wants it
    out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def to_torch_state(params: dict, cfg: YolactConfig) -> dict:
    """Exact inverse of :func:`from_torch_state` (numpy float32 leaves)."""
    flat: dict = {}
    bb = params["backbone"]
    if cfg.backbone.startswith("resnet"):
        from tpuseg.models.yolact import _resnet_cfg

        rcfg = _resnet_cfg(cfg)
        _inv_conv(flat, "backbone.conv1", bb["stem"]["conv"])
        _inv_bn(flat, "backbone.bn1", bb["stem"]["bn"])
        for si, nblocks in enumerate(rcfg.stage_blocks):
            for bi, p in enumerate(bb[f"layer{si + 1}"]):
                base = f"backbone.layers.{si}.{bi}"
                _inv_conv(flat, f"{base}.conv1", p["conv1"])
                _inv_bn(flat, f"{base}.bn1", p["bn1"])
                _inv_conv(flat, f"{base}.conv2", p["conv2"])
                if p.get("conv2_offset") is not None:
                    # DCNv2 module layout: conv2.{weight,bias} +
                    # conv2.conv_offset_mask.{weight,bias}
                    _inv_conv(flat, f"{base}.conv2.conv_offset_mask",
                              p["conv2_offset"])
                _inv_bn(flat, f"{base}.bn2", p["bn2"])
                _inv_conv(flat, f"{base}.conv3", p["conv3"])
                _inv_bn(flat, f"{base}.bn3", p["bn3"])
                if p.get("downsample") is not None:
                    _inv_conv(flat, f"{base}.downsample.0",
                              p["downsample"]["conv"])
                    _inv_bn(flat, f"{base}.downsample.1",
                            p["downsample"]["bn"])
    else:
        from tpuseg.nn.darknet import STAGES

        def inv_cb(name, p):
            _inv_conv(flat, f"{name}.conv", p["conv"])
            _inv_bn(flat, f"{name}.bn", p["bn"])

        inv_cb("backbone._preconv", bb["stem"])
        for si, (_, nblocks) in enumerate(STAGES):
            base = f"backbone.layers.{si}"
            inv_cb(f"{base}.0", bb[f"stage{si}"]["down"])
            for bi, blk in enumerate(bb[f"stage{si}"]["blocks"]):
                inv_cb(f"{base}.{bi + 1}.0", blk["conv1"])
                inv_cb(f"{base}.{bi + 1}.1", blk["conv2"])

    nlv = 3
    for i in range(nlv):
        _inv_conv(flat, f"fpn.lat_layers.{i}", params["fpn"]["lat"][i])
        # forward applies pred[j] to P_{3+j}; checkpoint order is reversed
        _inv_conv(flat, f"fpn.pred_layers.{i}",
                  params["fpn"]["pred"][nlv - 1 - i])
    for i in range(2):
        _inv_conv(flat, f"fpn.downsample_layers.{i}",
                  params["fpn"]["down"][i])
    for ci, idx in enumerate((0, 2, 4, 8, 10)):
        _inv_conv(flat, f"proto_net.{idx}", params["proto"][f"conv{ci}"])
    _inv_conv(flat, "prediction_layers.0.upfeature.0",
              params["pred"]["upfeature"])
    _inv_conv(flat, "prediction_layers.0.bbox_layer", params["pred"]["bbox"])
    _inv_conv(flat, "prediction_layers.0.conf_layer", params["pred"]["conf"])
    _inv_conv(flat, "prediction_layers.0.mask_layer", params["pred"]["mask"])
    if "semantic" in params:
        _inv_conv(flat, "semantic_seg_conv", params["semantic"])
    if "maskiou" in params:
        for i in range(5):
            _inv_conv(flat, f"maskiou_net.maskiou_net.{2 * i}",
                      params["maskiou"][f"conv{i}"])
        _inv_conv(flat, "maskiou_net.maskiou_net.10",
                  params["maskiou"]["conv_last"])
    return flat
