#!/usr/bin/env python
"""Per-stage ResNet-50 timing at Mask R-CNN shapes (bs=16, 800x1344 bf16)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn import layers as L
from tpuseg.nn import resnet as RN

PEAK = 197e12


def _sync(out):
    # tunnel-safe: scalar readback of the last output (see bench.py _sync)
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=10, warm=2):
    out = fn(*args)
    _sync(out)
    for _ in range(warm):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0))


def main():
    batch = 16
    cfg = RN.ResNetConfig(depth=50, stride_in_1x1=True, frozen_bn=True)
    params = RN.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(
        (batch, 800, 1344, 3)).astype(np.float32)).astype(jnp.bfloat16)

    def stem(p, x):
        y = L.conv2d(x, p["stem"]["conv"], stride=2, padding=3)
        y = L.relu(L.batch_norm_inference(y, p["stem"]["bn"], eps=0.0))
        return L.max_pool2d(y, 3, 2, padding=1)

    jstem = jax.jit(stem)
    x = jstem(params, x0)
    t = timeit(jstem, (params, x0))
    f = flops_of(stem, params, x0)
    print(f"stem+pool: {t*1e3:7.2f} ms  {f/1e12:5.2f} TF  MFU {f/t/PEAK*100:5.1f}%  out {x.shape}")

    for si, name in enumerate(["layer1", "layer2", "layer3", "layer4"]):
        stride = 1 if si == 0 else 2

        def stage(p, x, name=name, stride=stride):
            for bi, bp in enumerate(p[name]):
                x = RN.bottleneck(x, bp, stride if bi == 0 else 1, 1, cfg)
            return x

        js = jax.jit(stage)
        xn = js(params, x)
        t = timeit(js, (params, x))
        f = flops_of(stage, params, x)
        print(f"{name}:    {t*1e3:7.2f} ms  {f/1e12:5.2f} TF  MFU {f/t/PEAK*100:5.1f}%  out {xn.shape}")
        x = xn


if __name__ == "__main__":
    main()
