#!/usr/bin/env python
"""Stem decomposition: 7x7/2 conv vs 3x3/2 maxpool, plus XLA variants."""
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def _sync(out):
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=10, warm=3):
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


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 800, 1344, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    jconv = jax.jit(conv)
    y = jconv(x, w)
    t = timeit(jconv, (x, w))
    print(f"7x7/2 conv alone: {t*1e3:7.2f} ms  out {y.shape}")

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    jpool = jax.jit(pool)
    z = jpool(y)
    t = timeit(jpool, (y,))
    print(f"3x3/2 maxpool alone: {t*1e3:7.2f} ms  out {z.shape}")

    def both(x, w):
        return pool(conv(x, w))

    t = timeit(jax.jit(both), (x, w))
    print(f"conv+pool fused jit: {t*1e3:7.2f} ms")

    # variant: f32 input (the real pipeline feeds normalized f32->bf16 cast)
    xf = x.astype(jnp.float32)

    def both_f32in(x, w):
        return pool(conv(x.astype(jnp.bfloat16), w))

    t = timeit(jax.jit(both_f32in), (xf, w))
    print(f"conv+pool, f32 input cast in-graph: {t*1e3:7.2f} ms")

    # variant: channel-padded input to 8 (lane alignment)
    x8 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
    w8 = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
    t = timeit(jax.jit(both), (x8, w8))
    print(f"conv+pool, C_in padded to 8: {t*1e3:7.2f} ms")

    # variant: im2col matmul conv (patches 7x7x3=147) + pool
    def im2col_conv(x, w):
        p = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        cols = []
        for dy in range(7):
            for dx in range(7):
                cols.append(p[:, dy:dy + 800:2, dx:dx + 1344:2, :])
        patches = jnp.concatenate(cols, -1)  # [16, 400, 672, 147]
        return patches @ w.reshape(147, 64)

    def im2col_both(x, w):
        return pool(im2col_conv(x, w))

    t = timeit(jax.jit(im2col_both), (x, w))
    print(f"im2col conv + pool: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
