#!/usr/bin/env python
"""Per-stage Mask R-CNN R50-FPN inference profile on the real chip.

Stages timed separately (each jitted alone, so inter-stage fusion is
lost — use as a relative map, the fused pipeline is faster than the sum).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import maskrcnn as M
from tpuseg.core import boxes as box_ops
from tpuseg.ops import nms as nms_ops


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


def main():
    batch = 16
    dtype = jnp.bfloat16
    cfg = M.MaskRCNNConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)
    rng = np.random.default_rng(0)
    ch, cw = 800, 1344
    images = jnp.asarray(
        rng.standard_normal((batch, ch, cw, 3)).astype(np.float32))
    hw = jnp.asarray([[800, 1201]] * batch, jnp.int32)

    def full(p, im, hw):
        return M.forward_inference(p, im.astype(dtype), hw, cfg)

    t_full = timeit(jax.jit(full), (params, images, hw))
    print(f"full pipeline: {t_full*1e3:8.2f} ms  ({batch/t_full:.1f} img/s)")

    # stage 1: backbone + FPN
    def s_backbone(p, im):
        return M.backbone_fpn(p, im.astype(dtype), cfg)

    jb = jax.jit(s_backbone)
    pyramid = jb(params, images)
    t = timeit(jb, (params, images))
    print(f"backbone+FPN: {t*1e3:8.2f} ms")

    # stage 2: RPN head + proposals
    def s_rpn(p, pyr, hw):
        logits, deltas = M.rpn_head(p["rpn"], pyr)
        anchors = [jnp.asarray(a) for a in M.make_anchors_np(cfg, ch, cw)]
        return M.rpn_proposals(logits, deltas, anchors, hw, cfg, (ch, cw))

    jr = jax.jit(s_rpn)
    proposals, p_scores, p_valid = jr(params, pyramid, hw)
    t = timeit(jr, (params, pyramid, hw))
    print(f"RPN head+proposals: {t*1e3:8.2f} ms")

    # stage 2b: RPN proposals decomposed — head only
    def s_rpn_head(p, pyr):
        return M.rpn_head(p["rpn"], pyr)

    t = timeit(jax.jit(s_rpn_head), (params, pyramid))
    print(f"  RPN convs only: {t*1e3:8.2f} ms")

    # stage 3: box-head RoIAlign
    b = batch
    p_dim = proposals.shape[1]
    flat_boxes = proposals.reshape(b * p_dim, 4)
    flat_bidx = jnp.repeat(jnp.arange(b), p_dim)

    def s_pool(pyr, fb, fi):
        return M.pooled_roi_features(
            pyr[:4], fb, fi, cfg.pooler_resolution, cfg.pooler_sampling_ratio)

    jp = jax.jit(s_pool)
    pooled = jp(pyramid, flat_boxes, flat_bidx)
    t = timeit(jp, (pyramid, flat_boxes, flat_bidx))
    print(f"box RoIAlign ({b*p_dim} rois): {t*1e3:8.2f} ms")

    # stage 4: box head FCs
    def s_boxhead(p, pooled):
        return M.box_head(p["box_head"], pooled)

    jbh = jax.jit(s_boxhead)
    cls_logits, box_deltas = jbh(params, pooled)
    t = timeit(jbh, (params, pooled))
    print(f"box head 2FC: {t*1e3:8.2f} ms")

    # stage 5: postprocess (cands + NMS + final topk)
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), -1).reshape(
        b, p_dim, cfg.num_classes)
    deltas_r = box_deltas.astype(jnp.float32).reshape(
        b, p_dim, cfg.num_classes * 4)

    def s_post(proposals, p_valid, scores, deltas_r, hw):
        def per_image_cands(props, pv, sc, dl, hw_i):
            decoded = box_ops.decode_boxes(dl, props, weights=cfg.box_reg_weights)
            decoded = decoded.reshape(p_dim, cfg.num_classes, 4)[:, 1:, :]
            decoded = box_ops.clip_to_image(decoded, hw_i[0] - 1, hw_i[1] - 1)
            cls_scores = sc[:, 1:]
            cand_valid = pv[:, None] & (cls_scores > cfg.score_thresh)
            top_s, sel, sel_valid = box_ops.masked_topk(
                cls_scores.reshape(-1), cand_valid.reshape(-1),
                cfg.pre_final_nms_topk, approx=cfg.approx_topk)
            flat_b = jax.lax.optimization_barrier(decoded.reshape(-1, 4))
            flat_c = jnp.tile(jnp.arange(cfg.num_classes - 1), (p_dim,))
            return flat_b[sel], top_s, flat_c[sel], sel_valid

        cb, ts, cc, sv = jax.vmap(per_image_cands)(
            proposals, p_valid, scores, deltas_r, hw)
        keep = nms_ops.batched_nms_mask_batch(
            cb, ts, cc, cfg.nms_thresh, valid=sv, to_remove=1.0)
        return cb, ts, cc, keep

    jpost = jax.jit(s_post)
    t = timeit(jpost, (proposals, p_valid, scores, deltas_r, hw))
    print(f"box postprocess (decode+topk+NMS): {t*1e3:8.2f} ms")

    # stage 6: mask branch (RoIAlign + head, class-selected)
    d = cfg.detections_per_img
    det_boxes = jnp.zeros((b, d, 4), jnp.float32).at[..., 2:].set(64.0)
    det_classes = jnp.zeros((b, d), jnp.int32)

    def s_mask(p, pyr, db, dc):
        flat_det = db.reshape(b * d, 4)
        fi = jnp.repeat(jnp.arange(b), d)
        mp = M.pooled_roi_features(pyr[:4], flat_det, fi, cfg.mask_resolution,
                                   cfg.pooler_sampling_ratio)
        return M.mask_head(p["mask_head"], mp,
                           class_sel=(dc + 1).reshape(b * d))

    jm = jax.jit(s_mask)
    t = timeit(jm, (params, pyramid, det_boxes, det_classes))
    print(f"mask branch (pool+head, {b*d} rois): {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
