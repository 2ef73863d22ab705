#!/usr/bin/env python
"""Per-geometry DCNv2 block cost on the real chip (windowed kernel era).

Round-3 recorded per-block numbers for the DENSE kernel (26.6 / 7.5 /
0.8 ms for the three YOLACT++-550 R50 stage geometries at bs=16); the
windowed kernel that replaced it in round 4 (74 -> 141 img/s/chip
headline) was only measured through the full pipeline. This profiles
each geometry standalone — forward and fwd+bwd — so the next
formulation attempt starts from per-block numbers again.

Geometries (YOLACT++-550 R50, 13 deformable blocks, dbolya
resnet50_dcnv2_backbone): conv2 of every bottleneck in stages 2-4.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.ops.deform_conv import dcn_block


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


# (name, H_in (= W_in, square), C, stride, n_blocks_with_this_geometry)
GEOMS = [
    ("stage2 s2 138->69 c128", 138, 128, 2, 1),
    ("stage2 s1  69x69 c128", 69, 128, 1, 3),
    ("stage3 s2  69->35 c256", 69, 256, 2, 1),
    ("stage3 s1  35x35 c256", 35, 256, 1, 5),
    ("stage4 s2  35->18 c512", 35, 512, 2, 1),
    ("stage4 s1  18x18 c512", 18, 512, 1, 2),
]


def main():
    batch = 16
    rng = np.random.default_rng(0)
    total_f, total_b = 0.0, 0.0
    for name, h, c, stride, nblk in GEOMS:
        x = jnp.asarray(rng.standard_normal(
            (batch, h, h, c)).astype(np.float32)).astype(jnp.bfloat16)
        k = 3
        p = {
            "offset": {
                "weight": jnp.asarray(rng.standard_normal(
                    (k, k, c, 3 * k * k)).astype(np.float32) * 0.01
                ).astype(jnp.bfloat16),
                "bias": jnp.zeros((3 * k * k,), jnp.bfloat16),
            },
            "weight": jnp.asarray(rng.standard_normal(
                (k, k, c, c)).astype(np.float32) * 0.05).astype(jnp.bfloat16),
        }

        fwd = jax.jit(lambda xx, pp: dcn_block(xx, pp, stride=stride))
        t_f = timeit(fwd, (x, p))

        def loss(xx, pp):
            return jnp.sum(dcn_block(xx, pp, stride=stride)
                           .astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_b = timeit(bwd, (x, p))
        total_f += t_f * nblk
        total_b += t_b * nblk
        print(f"{name}: fwd {t_f*1e3:7.2f} ms  fwd+bwd {t_b*1e3:7.2f} ms"
              f"  (x{nblk} blocks)")
    print(f"sum over 13 blocks: fwd {total_f*1e3:7.1f} ms   "
          f"fwd+bwd {total_b*1e3:7.1f} ms   (bs=16)")


if __name__ == "__main__":
    main()

# Round-5 measurement (bs=16, real chip, readback-synced):
#   stage2 s2 c128: fwd 13.0 / fwd+bwd 42.0 ms   (x1)
#   stage2 s1 c128: fwd 12.2 / fwd+bwd 36.6 ms   (x3)
#   stage3 s2 c256: fwd 12.0 / fwd+bwd 21.8 ms   (x1)
#   stage3 s1 c256: fwd 10.9 / fwd+bwd 20.0 ms   (x5)
#   stage4 s2 c512: fwd  8.0 / fwd+bwd 17.1 ms   (x1)
#   stage4 s1 c512: fwd 12.2 / fwd+bwd  8.8 ms   (x2)  <- fwd > fwd+bwd!
# CAVEAT: standalone-jitted single-block calls through the axon tunnel are
# dominated by per-dispatch/readback overhead (the stage4 inversion, and a
# 149 ms fwd "sum" vs the 113 ms FULL ++ pipeline at the same batch).
# Only fwd-vs-fwd+bwd DELTAS on the big blocks carry signal; use
# slope-timing (vary block count in one program) for real per-block cost
# (ARCHITECTURE.md "tunnel micro-timing").
