#!/usr/bin/env python
"""Per-stage Mask R-CNN R50-C4 inference profile on the real chip
(VERDICT r3 weak #1: quantify the C4 cost structure).

Stages timed separately (each jitted alone, so inter-stage fusion is
lost — use as a relative map, the fused pipeline is faster than the sum).
The interesting questions: how much of the step is (a) the stride-16
backbone at 800x1344, (b) RoIAlign-14 on 1000 proposals/img, (c) res5 on
the 1000 pooled RoIs (the C4 design's intrinsic per-RoI conv tower),
(d) the second res5 pass for the mask branch on 100 detections.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import maskrcnn as M
from tpuseg.models import maskrcnn_c4 as M4
from tpuseg.ops import sampling


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
    batch = 8
    dtype = jnp.bfloat16
    cfg = M4.MaskRCNNC4Config()
    params = M4.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)
    rng = np.random.default_rng(0)
    ch, cw = 800, 1344
    images = jnp.asarray(
        rng.standard_normal((batch, ch, cw, 3)).astype(np.float32))
    hw = jnp.asarray([[800, 1201]] * batch, jnp.int32)

    def full(p, im, hw):
        return M4.forward_inference(p, im.astype(dtype), hw, cfg)

    t_full = timeit(jax.jit(full), (params, images, hw))
    fl = flops_of(full, params, images, hw)
    print(f"full pipeline: {t_full*1e3:8.2f} ms  ({batch/t_full:.1f} img/s)  "
          f"{fl/t_full/197e12*100:.1f}% MFU  ({fl/1e12:.1f} TF/call)")

    # stage 1: backbone to C4
    def s_backbone(p, im):
        return M4.backbone_c4(p, im.astype(dtype), cfg)

    jb = jax.jit(s_backbone)
    c4 = jb(params, images)
    t = timeit(jb, (params, images))
    fl = flops_of(s_backbone, params, images)
    print(f"backbone->C4:    {t*1e3:8.2f} ms  {fl/t/197e12*100:5.1f}% MFU")

    # stage 2: RPN head + proposals (single level, 6000/1000)
    def s_rpn(p, c4, hw):
        logits, deltas = M.rpn_head(p["rpn"], [c4])
        anchors = jnp.asarray(M4.make_anchors_np(cfg, ch, cw))
        return M.rpn_proposals(logits, deltas, [anchors], hw,
                               M4._single_level_cfg(cfg), (ch, cw))

    jr = jax.jit(s_rpn)
    proposals, p_scores, p_valid = jr(params, c4, hw)
    t = timeit(jr, (params, c4, hw))
    print(f"RPN+proposals:   {t*1e3:8.2f} ms")

    # stage 3: RoIAlign-14 on the 1000 proposals/img. Standalone (no
    # consumer to fuse into / donate to) the [N, 14, 14, 1024] pooled
    # buffer at N=8000 OOMs the chip next to the residents above, so the
    # RoI stages run at half batch and report per-image ms.
    half = batch // 2
    p = proposals.shape[1]
    flat_boxes = proposals[:half].reshape(half * p, 4)
    flat_bidx = jnp.repeat(jnp.arange(half), p)

    def s_pool(c4, fb, bi):
        return sampling.roi_align(
            c4, fb, bi, output_size=cfg.pooler_resolution,
            spatial_scale=1.0 / cfg.anchor_stride,
            sampling_ratio=cfg.pooler_sampling_ratio, group_size=p)

    jp = jax.jit(s_pool)
    pooled = jp(c4[:half], flat_boxes, flat_bidx)
    t = timeit(jp, (c4[:half], flat_boxes, flat_bidx))
    print(f"RoIAlign 14x14 ({p} rois/img): {t/half*1e3:8.2f} ms/img")

    # stage 4: res5 on pooled rois + box predictor
    def s_res5(p_, pooled):
        feats = M4.res5_head(p_["roi_head"], pooled, cfg)
        x = jnp.mean(feats, axis=(1, 2))
        from tpuseg.nn import layers as L

        return (L.linear(x, p_["box_pred"]["cls_score"]),
                L.linear(x, p_["box_pred"]["bbox_pred"]))

    j5 = jax.jit(s_res5)
    j5(params, pooled)
    t = timeit(j5, (params, pooled))
    fl = flops_of(s_res5, params, pooled)
    print(f"res5+box head ({p} rois/img): {t/half*1e3:8.2f} ms/img  "
          f"{fl/t/197e12*100:5.1f}% MFU  ({fl/half/1e12:.2f} TF/img)")

    # stage 5: mask branch (RoIAlign + res5 again on 100 dets/img)
    d = cfg.detections_per_img
    det_boxes = proposals[:half, :d].reshape(half * d, 4)
    det_bidx = jnp.repeat(jnp.arange(half), d)

    def s_mask(p_, c4, fb, bi):
        mpool = sampling.roi_align(
            c4, fb, bi, output_size=cfg.pooler_resolution,
            spatial_scale=1.0 / cfg.anchor_stride,
            sampling_ratio=cfg.pooler_sampling_ratio, group_size=d)
        return M4.res5_head(p_["roi_head"], mpool, cfg)

    jm = jax.jit(s_mask)
    jm(params, c4[:half], det_boxes, det_bidx)
    t = timeit(jm, (params, c4[:half], det_boxes, det_bidx))
    print(f"mask branch ({d} dets/img): {t/half*1e3:8.2f} ms/img")


if __name__ == "__main__":
    main()
