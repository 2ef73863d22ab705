#!/usr/bin/env python
"""Micro-probe every conv shape inside resnet layer1/layer2 (bs=16)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def _sync(out):
    # tunnel-safe: scalar readback of the last output (see bench.py _sync)
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=20, warm=3):
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


def probe(label, h, w, cin, cout, k, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, h, w, cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    def f(x, wgt):
        return jax.lax.conv_general_dilated(
            x, wgt, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    jf = jax.jit(f)
    t = timeit(jf, (x, wgt))
    flops = 2 * 16 * (h // stride) * (w // stride) * cin * cout * k * k
    gb = (x.nbytes + wgt.nbytes + 16 * (h // stride) * (w // stride) * cout * 2) / 1e9
    print(f"{label:44s} {t*1e3:7.2f} ms  MFU {flops/t/PEAK*100:5.1f}%  "
          f"BW {gb/t:6.0f} GB/s")


def main():
    # layer1 block shapes (200x336)
    probe("l1 conv1 1x1 256->64 @200x336", 200, 336, 256, 64, 1, 1)
    probe("l1 conv2 3x3 64->64 @200x336", 200, 336, 64, 64, 3, 1)
    probe("l1 conv3 1x1 64->256 @200x336", 200, 336, 64, 256, 1, 1)
    # layer2 entry block
    probe("l2 conv1 1x1/2 256->128 @200x336", 200, 336, 256, 128, 1, 2)
    probe("l2 downsample 1x1/2 256->512 @200x336", 200, 336, 256, 512, 1, 2)
    # layer2 inner blocks (100x168)
    probe("l2 conv1 1x1 512->128 @100x168", 100, 168, 512, 128, 1, 1)
    probe("l2 conv2 3x3 128->128 @100x168", 100, 168, 128, 128, 3, 1)
    probe("l2 conv3 1x1 128->512 @100x168", 100, 168, 128, 512, 1, 1)
    # layer3 reference (50x84)
    probe("l3 conv2 3x3 256->256 @50x84", 50, 84, 256, 256, 3, 1)


if __name__ == "__main__":
    main()
