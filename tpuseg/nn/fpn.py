"""Feature Pyramid Networks — detectron and YOLACT variants.

  - :func:`fpn_forward` — detectron.jittor ``modeling/backbone/fpn.py``:
    1x1 inner (lateral) + 3x3 layer convs, nearest top-down upsample,
    LastLevelMaxPool P6. Outputs P2..P6 at 256 channels.
  - :func:`yolact_fpn_forward` — Yolact.jittor ``yolact.py::FPN``:
    laterals over (C3, C4, C5), bilinear top-down, ReLU after the 3x3
    pred convs, two stride-2 3x3 downsample convs for P6/P7.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.nn import layers as L


def _upsample_nearest_to(x, ref):
    return L.resize_nearest(x, (ref.shape[1], ref.shape[2]))


def _upsample_bilinear_to(x, ref):
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]),
        method="linear", antialias=False
    )


def fpn_forward(params: dict, feats: dict, with_p6: bool = True) -> dict:
    """detectron FPN: {"c2".."c5"} -> {"p2".."p6"} (256ch)."""
    names = ["c2", "c3", "c4", "c5"]
    inner = [L.conv2d(feats[n], params["inner"][i]) for i, n in enumerate(names)]
    # top-down accumulation
    last = inner[-1]
    tds = [last]
    for i in range(len(inner) - 2, -1, -1):
        last = inner[i] + _upsample_nearest_to(last, inner[i])
        tds.insert(0, last)
    out = {
        f"p{i + 2}": L.conv2d(tds[i], params["layer"][i], padding=1)
        for i in range(len(tds))
    }
    if with_p6:
        out["p6"] = L.max_pool2d(out["p5"], 1, 2)
    return out


def fpn_init(key, in_channels=(256, 512, 1024, 2048), out_ch=256, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    return {
        "inner": [
            L.conv_params(next(keys), 1, 1, c, out_ch, dtype=dtype)
            for c in in_channels
        ],
        "layer": [
            L.conv_params(next(keys), 3, 3, out_ch, out_ch, dtype=dtype)
            for _ in in_channels
        ],
    }


def yolact_fpn_forward(params: dict, feats: dict) -> list:
    """YOLACT FPN: {"c3","c4","c5"} -> [P3, P4, P5, P6, P7] (256ch).

    Matches yolact.py FPN.forward: laterals applied in reversed order with
    bilinear upsample accumulation, ReLU after pred convs, stride-2 conv
    downsample chain for P6/P7 (no relu on those).
    """
    convouts = [feats["c3"], feats["c4"], feats["c5"]]
    n = len(convouts)
    x = jnp.zeros_like(L.conv2d(convouts[-1], params["lat"][0]))
    outs = [None] * n
    for j in range(n - 1, -1, -1):
        lat_idx = n - 1 - j
        if j < n - 1:
            x = _upsample_bilinear_to(x, convouts[j])
        x = x + L.conv2d(convouts[j], params["lat"][lat_idx])
        outs[j] = x
    for j in range(n):
        outs[j] = L.relu(L.conv2d(outs[j], params["pred"][j], padding=1))
    p6 = L.conv2d(outs[-1], params["down"][0], stride=2, padding=1)
    p7 = L.conv2d(p6, params["down"][1], stride=2, padding=1)
    return outs + [p6, p7]


def yolact_fpn_init(key, in_channels=(512, 1024, 2048), out_ch=256, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    return {
        # lat[0] corresponds to C5 (reversed order, as in the reference)
        "lat": [
            L.conv_params(next(keys), 1, 1, c, out_ch, dtype=dtype)
            for c in reversed(in_channels)
        ],
        "pred": [
            L.conv_params(next(keys), 3, 3, out_ch, out_ch, dtype=dtype)
            for _ in in_channels
        ],
        "down": [
            L.conv_params(next(keys), 3, 3, out_ch, out_ch, dtype=dtype)
            for _ in range(2)
        ],
    }
