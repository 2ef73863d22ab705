"""DarkNet-53 backbone (yolo.jittor YOLOv3; Yolact.jittor DarkNetBackbone).

Standard darknet53: stem conv(32) then 5 stages of [downsample conv s2 +
N residual blocks], N = (1, 2, 8, 8, 4), channels (64, 128, 256, 512, 1024).
Residual block: 1x1 to c/2 -> 3x3 to c, add. BatchNorm + LeakyReLU(0.1).
Returns the stride-8/16/32 maps consumed by the YOLOv3 heads and the
YOLACT FPN (c3, c4, c5).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.nn import layers as L

STAGES = ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4))


@dataclass(frozen=True)
class DarkNetConfig:
    leaky_slope: float = 0.1
    bn_eps: float = 1e-5


def _conv_bn_leaky(x, p, cfg, stride=1, padding=1, kernel=3):
    x = L.conv2d(x, p["conv"], stride=stride, padding=padding)
    x = L.batch_norm(x, p["bn"], eps=cfg.bn_eps)
    return jnp.where(x > 0, x, cfg.leaky_slope * x)


def forward(params: dict, x: jax.Array, cfg: DarkNetConfig = DarkNetConfig()):
    """x [B,H,W,3] -> {"c3": /8, "c4": /16, "c5": /32}."""
    x = _conv_bn_leaky(x, params["stem"], cfg)
    feats = {}
    for si, (ch, nblocks) in enumerate(STAGES):
        sp = params[f"stage{si}"]
        x = _conv_bn_leaky(x, sp["down"], cfg, stride=2)
        for bi in range(nblocks):
            bp = sp["blocks"][bi]
            h = _conv_bn_leaky(x, bp["conv1"], cfg, padding=0, kernel=1)
            h = _conv_bn_leaky(h, bp["conv2"], cfg)
            x = x + h
        if si >= 2:
            feats[f"c{si + 1}"] = x
    return feats


def init_params(key: jax.Array, cfg: DarkNetConfig = DarkNetConfig(), dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))

    def cb(kh, kw, cin, cout):
        return {
            "conv": L.conv_params(next(keys), kh, kw, cin, cout, bias=False, dtype=dtype),
            "bn": L.bn_params(cout, dtype),
        }

    params = {"stem": cb(3, 3, 3, 32)}
    cin = 32
    for si, (ch, nblocks) in enumerate(STAGES):
        stage = {"down": cb(3, 3, cin, ch), "blocks": []}
        for _ in range(nblocks):
            stage["blocks"].append(
                {"conv1": cb(1, 1, ch, ch // 2), "conv2": cb(3, 3, ch // 2, ch)}
            )
        params[f"stage{si}"] = stage
        cin = ch
    return params
