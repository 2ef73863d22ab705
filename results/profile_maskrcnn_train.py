#!/usr/bin/env python
"""Per-stage Mask R-CNN R50-FPN TRAIN-step profile on the real chip.

The inference pipeline has a full stage profile (profile_maskrcnn.py,
profile_resnet_stages.py); the train step (25.0 img/s/chip in BENCH_r04)
never got one. Decomposes the bs=8 mixed-bf16 train step into:

  backbone fwd+bwd (per-block remat, freeze_at=2)
  rpn head+loss fwd+bwd (given pyramid)
  proposal generation + roi sampling (stop-gradient path)
  box branch fwd+bwd   (RoIAlign fwd+bwd Pallas + 2FC head + loss)
  mask branch fwd+bwd  (RoIAlign-14 fwd+bwd + 4conv+deconv + loss)

Each stage is jitted alone with grads taken wrt the stage's inputs
(params and, where real, the pyramid) so the Pallas backward kernels are
included. Relative map only: the fused full step overlaps stages.

Setup mirrors bench.py::bench_maskrcnn_train exactly (same shapes,
dtypes, synthetic targets).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.engine.trainer import cast_floats, sgd_init, sgd_update
from tpuseg.models import maskrcnn as M
from tpuseg.models import maskrcnn_loss as ML


def _sync(out):
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=6, warm=2):
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
    batch, g = 8, 16
    cfg = M.MaskRCNNConfig()
    lcfg = ML.MaskRCNNLossConfig(num_classes=cfg.num_classes)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    buf = sgd_init(params)
    rng = np.random.default_rng(0)
    ch, cw = 800, 1344
    images = jnp.asarray(
        rng.standard_normal((batch, ch, cw, 3)).astype(np.float32))
    hw = jnp.asarray([[800, 1201]] * batch, jnp.int32)
    xy = rng.uniform(0, 600, (batch, g, 2)).astype(np.float32)
    wh = rng.uniform(40, 300, (batch, g, 2)).astype(np.float32)
    classes = rng.integers(0, cfg.num_classes - 1, (batch, g)).astype(np.int32)
    classes[:, g // 2:] = -1
    targets = {
        "boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        "classes": jnp.asarray(classes),
        "mask_crops": jnp.asarray(
            (rng.uniform(size=(batch, g, lcfg.gt_mask_crop,
                               lcfg.gt_mask_crop)) > 0.5).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)

    # ---- full step (bench.py parity) -----------------------------------
    def step(p, b, images, hw, targets):
        def loss_fn(pp):
            losses = M.forward_train_losses(
                cast_floats(pp, jnp.bfloat16), images.astype(jnp.bfloat16),
                hw, targets, key, cfg, lcfg)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p2, b2 = sgd_update(p, grads, b, 1e-2, 0.9, 1e-4)
        return p2, b2, losses

    t_full = timeit(jax.jit(step), (params, buf, images, hw, targets))
    print(f"full train step: {t_full*1e3:8.1f} ms  ({batch/t_full:.1f} img/s)")

    # ---- forward-only losses -------------------------------------------
    def fwd_only(p, images, hw, targets):
        return M.forward_train_losses(
            cast_floats(p, jnp.bfloat16), images.astype(jnp.bfloat16),
            hw, targets, key, cfg, lcfg)["total"]

    t = timeit(jax.jit(fwd_only), (params, images, hw, targets))
    print(f"forward-only (all losses): {t*1e3:8.1f} ms")

    # ---- backbone fwd+bwd ----------------------------------------------
    def bb_loss(p, images):
        pyr = M.backbone_fpn(cast_floats(p, jnp.bfloat16),
                             images.astype(jnp.bfloat16), cfg)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in pyr)

    t = timeit(jax.jit(jax.grad(bb_loss)), (params, images))
    print(f"backbone+FPN fwd+bwd: {t*1e3:8.1f} ms")
    jb = jax.jit(lambda p, im: M.backbone_fpn(
        cast_floats(p, jnp.bfloat16), im.astype(jnp.bfloat16), cfg))
    pyramid = jb(params, images)
    t = timeit(jb, (params, images))
    print(f"  (backbone+FPN forward alone: {t*1e3:8.1f} ms)")

    # ---- rpn head + loss fwd+bwd (given pyramid) ------------------------
    anchors_l = [jnp.asarray(a) for a in M.make_anchors_np(cfg, ch, cw)]
    anchors = jnp.concatenate(anchors_l, axis=0)
    inside_l = []
    for li, an in enumerate(anchors_l):
        stride = cfg.anchor_stride[li]
        hl, wl = M.fpn_level_hw(ch, cw, stride)
        inside_l.append(M.anchor_inside_mask(
            hw, stride, hl, wl, an.shape[0] // (hl * wl)))
    inside = jnp.concatenate(inside_l, axis=1)
    k_rpn, k_roi = jax.random.split(key)

    def rpn_branch(p, pyr):
        logits, deltas = M.rpn_head(cast_floats(p["rpn"], jnp.bfloat16), pyr)
        al = jnp.concatenate([l.astype(jnp.float32) for l in logits], axis=1)
        ad = jnp.concatenate([d.astype(jnp.float32) for d in deltas], axis=1)
        ls = ML.rpn_loss(al, ad, anchors, targets["boxes"],
                         targets["classes"] >= 0, k_rpn, lcfg,
                         image_hw=hw, anchor_inside=inside)
        return ls["loss_objectness"] + ls["loss_rpn_box_reg"]

    t = timeit(jax.jit(jax.grad(rpn_branch, argnums=(0, 1))),
               (params, pyramid))
    print(f"rpn head+loss fwd+bwd: {t*1e3:8.1f} ms")

    # ---- proposals + sampling (stop-grad, no bwd) ------------------------
    from dataclasses import replace as _replace
    train_cfg = _replace(
        cfg, rpn_pre_nms_top_n=cfg.rpn_pre_nms_top_n_train,
        fpn_post_nms_top_n=cfg.fpn_post_nms_top_n_train,
        fpn_post_nms_per_batch=True)

    def props_sample(p, pyr):
        logits, deltas = M.rpn_head(cast_floats(p["rpn"], jnp.bfloat16), pyr)
        proposals, p_scores, p_valid = M.rpn_proposals(
            logits, deltas, anchors_l, hw, train_cfg, (ch, cw))
        keys = jax.random.split(k_roi, batch)
        sample = jax.vmap(
            lambda p_, pv, gb, gc, gv, k: ML.sample_proposals(
                p_, pv, gb, gc, gv, k, lcfg)
        )(proposals, p_valid, targets["boxes"], targets["classes"],
          targets["classes"] >= 0, keys)
        return sample

    jp = jax.jit(props_sample)
    sample = jp(params, pyramid)
    t = timeit(jp, (params, pyramid))
    print(f"proposals (12000/2000) + roi sampling: {t*1e3:8.1f} ms "
          f"(incl. rpn head recompute)")

    s = sample["boxes"].shape[1]
    flat_boxes = sample["boxes"].reshape(batch * s, 4)
    flat_bidx = jnp.repeat(jnp.arange(batch), s)
    flat_sample = {k_: v.reshape((batch * s,) + v.shape[2:])
                   for k_, v in sample.items()}
    print(f"  sampled rois per image: {s}")

    # ---- box branch fwd+bwd ---------------------------------------------
    def box_branch(p, pyr):
        pooled = M.pooled_roi_features(
            pyr[:4], flat_boxes, flat_bidx, cfg.pooler_resolution,
            cfg.pooler_sampling_ratio)
        cls_logits, box_deltas = box_head(p, pooled)
        ls = ML.box_head_loss(cls_logits.astype(jnp.float32),
                              box_deltas.astype(jnp.float32),
                              flat_sample, lcfg)
        return ls["loss_classifier"] + ls["loss_box_reg"]

    def box_head(p, pooled):
        return M.box_head(cast_floats(p["box_head"], jnp.bfloat16), pooled)

    t = timeit(jax.jit(jax.grad(box_branch, argnums=(0, 1))),
               (params, pyramid))
    print(f"box branch fwd+bwd (RoIAlign-7 + 2FC + loss): {t*1e3:8.1f} ms")

    # ---- mask branch fwd+bwd ---------------------------------------------
    # Profiles the SHIPPED positive-prefix branch (maskrcnn.py runs the
    # mask head on the first m = roi_batch*pos_fraction sampled slots).
    # The pre-round-5 all-512-rois variant measured 144 ms here — the
    # finding that motivated the prefix slice (25.1 -> 40.6 img/s).
    m = int(lcfg.roi_batch_per_image * lcfg.roi_pos_fraction)
    mask_boxes = sample["boxes"][:, :m]
    flat_msample = {k_: v[:, :m].reshape((batch * m,) + v.shape[2:])
                    for k_, v in sample.items()}
    t28 = jax.vmap(lambda rois, gt_idx, gb, crops: ML.mask_targets_from_crops(
        rois, gt_idx, gb, crops, cfg.mask_out))(
        mask_boxes, sample["gt_idx"][:, :m], targets["boxes"],
        targets["mask_crops"])

    def mask_branch(p, pyr):
        mask_pooled = M.pooled_roi_features(
            pyr[:4], mask_boxes.reshape(batch * m, 4),
            jnp.repeat(jnp.arange(batch), m), cfg.mask_resolution,
            cfg.pooler_sampling_ratio)
        mask_x = M.mask_head(cast_floats(p["mask_head"], jnp.bfloat16),
                             mask_pooled,
                             class_sel=flat_msample["cls_target"])
        ls = ML.mask_head_loss_selected(
            mask_x.astype(jnp.float32), flat_msample,
            t28.reshape(batch * m, cfg.mask_out, cfg.mask_out), lcfg)
        return ls["loss_mask"]

    t = timeit(jax.jit(jax.grad(mask_branch, argnums=(0, 1))),
               (params, pyramid))
    print(f"mask branch fwd+bwd (RoIAlign-14 + 4conv+deconv + loss, "
          f"{m}-roi positive prefix): {t*1e3:8.1f} ms")

    # ---- mask target generation alone ------------------------------------
    jt = jax.jit(lambda: jax.vmap(
        lambda rois, gt_idx, gb, crops: ML.mask_targets_from_crops(
            rois, gt_idx, gb, crops, cfg.mask_out))(
        mask_boxes, sample["gt_idx"][:, :m], targets["boxes"],
        targets["mask_crops"]))
    t = timeit(jt, ())
    print(f"mask target generation (grouped-matmul crops): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
