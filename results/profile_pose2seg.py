#!/usr/bin/env python
"""Per-stage Pose2Seg inference profile on the real chip (VERDICT r3 weak
#2: where do the 83.9 img/s go — backbone vs align vs seg head vs paste?).

Also A/Bs the bf16 compute path (backbone + align + seg head in bf16,
softmax/paste in f32) against the default f32 pipeline — the candidate
lift named in the verdict.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import pose2seg as P
from tpuseg.ops.sampling import affine_align


def sync(out):
    # scalar host readback: block_until_ready returns early for some
    # program shapes on the axon tunnel (see bench.py::_sync)
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=10, warm=2):
    out = fn(*args)
    sync(out)
    for _ in range(warm):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0))


def main():
    cfg = P.Pose2SegConfig()
    params = P.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, pp, s = 16, cfg.max_people, cfg.input_size
    images = jnp.asarray(rng.standard_normal((b, s, s, 3)).astype(np.float32))
    theta = jnp.asarray(np.tile(
        np.asarray([[0.3, 0.0, 0.1], [0.0, 0.3, 0.1]], np.float32),
        (b, pp, 1, 1)))
    inv_theta = jnp.asarray(np.tile(
        np.asarray([[3.0, 0.0, -0.3], [0.0, 3.0, -0.3]], np.float32),
        (b, pp, 1, 1)))
    pvalid = jnp.ones((b, pp), bool)
    skel = jnp.asarray(rng.standard_normal(
        (b, pp, cfg.align_size, cfg.align_size,
         cfg.skeleton_channels)).astype(np.float32))

    for dtype, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        pc = jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params)

        def full(p, im, th, ith, pv, sk):
            return P.forward(p, im.astype(dtype), th, ith, pv, cfg,
                             skel_feats=sk)

        t_full = timeit(jax.jit(full),
                        (pc, images, theta, inv_theta, pvalid, skel))
        fl = flops_of(full, pc, images, theta, inv_theta, pvalid, skel)
        print(f"[{label}] full: {t_full*1e3:8.2f} ms ({b/t_full:.1f} img/s) "
              f"{fl/t_full/197e12*100:.1f}% MFU")

        def s_backbone(p, im):
            return P.backbone_forward(p, im.astype(dtype), cfg)

        jb = jax.jit(s_backbone)
        feats = jb(pc, images)
        t = timeit(jb, (pc, images))
        fl = flops_of(s_backbone, pc, images)
        print(f"[{label}] backbone(dilated R50+FPN): {t*1e3:8.2f} ms  "
              f"{fl/t/197e12*100:5.1f}% MFU")

        def s_align(f, th):
            return affine_align(f, th, cfg.align_size)

        ja = jax.jit(s_align)
        aligned = ja(feats, theta)
        t = timeit(ja, (feats, theta))
        print(f"[{label}] affine_align ({b}x{pp} people): {t*1e3:8.2f} ms")

        aligned_cat = jnp.concatenate(
            [aligned, skel.astype(aligned.dtype)], -1)
        flat = aligned_cat.reshape(b * pp, cfg.align_size, cfg.align_size, -1)

        def s_seg(p, x):
            return P.seg_module(p["seg"], x, cfg)

        js = jax.jit(s_seg)
        js(pc, flat)
        t = timeit(js, (pc, flat))
        fl = flops_of(s_seg, pc, flat)
        print(f"[{label}] seg head ({b*pp} crops): {t*1e3:8.2f} ms  "
              f"{fl/t/197e12*100:5.1f}% MFU")


if __name__ == "__main__":
    main()
