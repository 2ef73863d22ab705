#!/usr/bin/env python
"""Backbone+FPN MFU probe: is the Mask R-CNN backbone stage XLA-bound?

Times the bare backbone_fpn stage and divides XLA cost-analysis FLOPs by
the 197 TF/s v5e bf16 peak. Also times a bare fat conv as the achievable
ceiling reference.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import maskrcnn as M

PEAK = 197e12


def timeit(fn, args, iters=10, warm=2):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0))


def main():
    batch = 16
    cfg = M.MaskRCNNConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, 800, 1344, 3)).astype(np.float32))

    def s_backbone(p, im):
        return M.backbone_fpn(p, im.astype(jnp.bfloat16), cfg)

    t = timeit(jax.jit(s_backbone), (params, images))
    f = flops_of(s_backbone, params, images)
    print(f"backbone+FPN: {t*1e3:8.2f} ms  {f/1e12:.2f} TFLOP  "
          f"MFU {f/t/PEAK*100:5.1f}%")

    # per-stage resnet decomposition
    from tpuseg.nn import resnet as RN

    rcfg = RN.ResNetConfig(depth=50, stride_in_1x1=True, frozen_bn=True,
                           freeze_at=cfg.freeze_at)

    def s_resnet(p, im):
        return RN.forward(p["backbone"], im.astype(jnp.bfloat16), rcfg)

    t = timeit(jax.jit(s_resnet), (params, images))
    f = flops_of(s_resnet, params, images)
    print(f"resnet only:  {t*1e3:8.2f} ms  {f/1e12:.2f} TFLOP  "
          f"MFU {f/t/PEAK*100:5.1f}%")

    # ceiling reference: one fat 3x3 conv at P3-like shape, 256ch
    x = jnp.asarray(rng.standard_normal(
        (batch, 100, 168, 256)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(
        (3, 3, 256, 256)).astype(np.float32)).astype(jnp.bfloat16)

    def fat(x, w):
        y = x
        for _ in range(8):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y

    t = timeit(jax.jit(fat), (x, w))
    f = flops_of(fat, x, w)
    print(f"8x 3x3 conv 256ch @100x168: {t*1e3:8.2f} ms  {f/1e12:.2f} TFLOP  "
          f"MFU {f/t/PEAK*100:5.1f}%")

    # stem-alone probe (7x7/2 conv on 3ch input is the classic underutilizer)
    def stem(p, im):
        return RN.stem_forward(p["backbone"]["stem"], im.astype(jnp.bfloat16),
                               rcfg)

    try:
        t = timeit(jax.jit(stem), (params, images))
        f = flops_of(stem, params, images)
        print(f"stem only:    {t*1e3:8.2f} ms  {f/1e12:.2f} TFLOP  "
              f"MFU {f/t/PEAK*100:5.1f}%")
    except AttributeError:
        print("stem probe skipped (no stem_forward helper)")


if __name__ == "__main__":
    main()
