"""Darknet ``.weights`` binary reader for YOLOv3.

yolo.jittor consumes the original darknet weight release (yolov3.weights /
darknet53.conv.74), a flat binary: 20-byte header (3x int32 version + int64
images-seen), then per conv layer in yolov3.cfg order:
  with BN:  bn_bias (beta), bn_weight (gamma), running_mean, running_var,
            conv weights [out, in, kh, kw]
  no BN:    conv bias, conv weights
This module walks our YOLOv3 param tree in exactly that layer order.
"""
from __future__ import annotations

import numpy as np


class _Reader:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            header = np.fromfile(f, np.int32, 3)
            self.version = tuple(header)
            if header[0] * 10 + header[1] >= 2:
                np.fromfile(f, np.int64, 1)  # seen
            else:
                np.fromfile(f, np.int32, 1)
            self.data = np.fromfile(f, np.float32)
        self.pos = 0

    def take(self, n: int) -> np.ndarray:
        out = self.data[self.pos : self.pos + n]
        assert len(out) == n, "darknet weights file exhausted early"
        self.pos += n
        return out

    @property
    def remaining(self) -> int:
        return len(self.data) - self.pos


def _fill_conv_bn(r: _Reader, p: dict) -> None:
    w = p["conv"]["weight"]  # HWIO
    kh, kw, cin, cout = w.shape
    p["bn"]["bias"] = r.take(cout)
    p["bn"]["weight"] = r.take(cout)
    p["bn"]["running_mean"] = r.take(cout)
    p["bn"]["running_var"] = r.take(cout)
    wdata = r.take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
    p["conv"]["weight"] = np.ascontiguousarray(wdata.transpose(2, 3, 1, 0))


def _fill_conv_bias(r: _Reader, p: dict) -> None:
    w = p["weight"]
    kh, kw, cin, cout = w.shape
    p["bias"] = r.take(cout)
    wdata = r.take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
    p["weight"] = np.ascontiguousarray(wdata.transpose(2, 3, 1, 0))


def _backbone_layers(backbone: dict):
    yield backbone["stem"]
    for si in range(5):
        stage = backbone[f"stage{si}"]
        yield stage["down"]
        for blk in stage["blocks"]:
            yield blk["conv1"]
            yield blk["conv2"]


def load_darknet53_backbone(path: str, params: dict) -> dict:
    """Load darknet53.conv.74 (ImageNet-pretrained backbone) in place."""
    import jax

    params = jax.tree.map(np.asarray, params)
    r = _Reader(path)
    for layer in _backbone_layers(params["backbone"]):
        _fill_conv_bn(r, layer)
    return params


def load_yolov3_weights(path: str, params: dict) -> dict:
    """Load a full yolov3.weights file into our param tree (in cfg order)."""
    import jax

    params = jax.tree.map(np.asarray, params)
    r = _Reader(path)
    for layer in _backbone_layers(params["backbone"]):
        _fill_conv_bn(r, layer)
    # detection neck/heads in yolov3.cfg order
    for p in params["neck0"]:
        _fill_conv_bn(r, p)
    _fill_conv_bn(r, params["head0"]["conv"])
    _fill_conv_bias(r, params["head0"]["out"])
    _fill_conv_bn(r, params["branch0"])
    for p in params["neck1"]:
        _fill_conv_bn(r, p)
    _fill_conv_bn(r, params["head1"]["conv"])
    _fill_conv_bias(r, params["head1"]["out"])
    _fill_conv_bn(r, params["branch1"])
    for p in params["neck2"]:
        _fill_conv_bn(r, p)
    _fill_conv_bn(r, params["head2"]["conv"])
    _fill_conv_bias(r, params["head2"]["out"])
    assert r.remaining == 0, f"{r.remaining} floats left over — layer order mismatch"
    return params
