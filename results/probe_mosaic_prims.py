#!/usr/bin/env python
"""Mosaic primitive-cost probes for the fused-stem kernel design.

Tests whether (a) lane-stride-2 slicing, (b) lane shifts, (c) in-kernel
transposes are cheap enough to build the stem conv+pool kernel on.
Each kernel loops its op K times over a VMEM-resident tile so the cost
measured is compute, not DMA.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64


def _sync(out):
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


def run(name, kernel, x, out_shape):
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    try:
        t = timeit(f, (x,))
        per = t / REPS * 1e6
        print(f"{name:46s} {t*1e3:8.3f} ms total, {per:8.2f} us/op")
    except Exception as e:
        print(f"{name:46s} FAILED: {str(e)[:120]}")


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 1344)).astype(np.float32))

    # (a) lane-strided slice x[:, ::2]
    def k_stride(in_ref, out_ref):
        acc = jnp.zeros((256, 672), jnp.float32)
        for i in range(REPS):
            acc = acc + in_ref[:, i % 2::2]
        out_ref[:] = acc

    run("lane stride-2 slice [256,1344]->[256,672]", k_stride, x, (256, 672))

    # (b) lane shift (static roll by 6)
    def k_shift(in_ref, out_ref):
        acc = jnp.zeros((256, 1344), jnp.float32)
        for i in range(REPS):
            acc = acc + jnp.roll(in_ref[:], (i % 7) - 3, axis=1)
        out_ref[:] = acc

    run("lane roll +-3 [256,1344]", k_shift, x, (256, 1344))

    # (b2) static lane slice (shift via slice, no wrap)
    def k_slice(in_ref, out_ref):
        acc = jnp.zeros((256, 1338), jnp.float32)
        for i in range(REPS):
            o = i % 7
            acc = acc + in_ref[:, o:o + 1338]
        out_ref[:] = acc

    run("lane static slice offset 0..6 [256,1338]", k_slice, x, (256, 1338))

    # (c) transpose [64, 336] -> [336, 64]
    xt = jnp.asarray(rng.standard_normal((64, 336)).astype(np.float32))

    def k_tr(in_ref, out_ref):
        acc = jnp.zeros((336, 64), jnp.float32)
        for _ in range(REPS):
            acc = acc + in_ref[:].T
        out_ref[:] = acc

    run("transpose [64,336]->[336,64]", k_tr, xt, (336, 64))

    # (d) matmul [64,168]x[168,672] (the stem conv-row matmul)
    a = jnp.asarray(rng.standard_normal((64, 168)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((168, 672)).astype(np.float32))

    def k_mm2(a_ref, b_ref, out_ref):
        acc = jnp.zeros((64, 672), jnp.float32)
        for _ in range(REPS):
            acc = acc + jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    f = jax.jit(lambda a, b: pl.pallas_call(
        k_mm2,
        out_shape=jax.ShapeDtypeStruct((64, 672), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b))
    t = timeit(f, (a, b))
    flops = 2 * 64 * 168 * 672 * REPS
    print(f"{'matmul [64,168]x[168,672] f32':46s} {t*1e3:8.3f} ms total, "
          f"{t/REPS*1e6:8.2f} us/op  ({flops/t/1e12:.1f} TF/s)")

    # (e) sublane-strided slice on second-minor dim [672,672]->[336,672]
    xs = jnp.asarray(rng.standard_normal((672, 672)).astype(np.float32))

    def k_sub(in_ref, out_ref):
        acc = jnp.zeros((336, 672), jnp.float32)
        for i in range(REPS):
            acc = acc + in_ref[i % 2::2, :]
        out_ref[:] = acc

    run("sublane stride-2 slice [672,672]->[336,672]", k_sub, xs, (336, 672))


if __name__ == "__main__":
    main()
