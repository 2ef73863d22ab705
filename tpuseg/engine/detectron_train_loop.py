"""Mask R-CNN training loop (detectron.jittor engine/trainer.py do_train).

Iteration-based loop to SOLVER.MAX_ITER with WarmupMultiStepLR, periodic
``model_{iter:07d}`` checkpoints and MetricLogger-style console lines.
Host pipeline builds the dual-canvas batches + padded targets (incl.
per-gt mask crops for the mask loss).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.engine.maskrcnn_engine import CANVAS_LANDSCAPE, CANVAS_PORTRAIT, \
    preprocess_image_bgr
from tpuseg.engine.trainer import (
    save_params_npz, sgd_init, sgd_update, warmup_multistep_lr)
from tpuseg.models import maskrcnn as M
from tpuseg.models import maskrcnn_loss as ML
from tpuseg.utils.logging import MovingAverage


def build_train_example(dataset, iid, min_size=800, max_size=1333,
                        max_gt=64, crop=112, flip_prob=0.5, rng=None):
    """One image -> (canvas, hw, padded targets). Horizontal-flip aug
    (detectron INPUT.FLIP_PROB_TRAIN=0.5)."""
    import cv2

    img = dataset.load_image(iid)  # RGB
    gt = dataset.load_target(iid)
    if rng is not None and rng.random() < flip_prob:
        w = img.shape[1]
        img = np.ascontiguousarray(img[:, ::-1])
        b = gt["boxes"].copy()
        # BoxList.transpose: flipped xmin = width - xmax - 1 (TO_REMOVE=1)
        b[:, [0, 2]] = w - gt["boxes"][:, [2, 0]] - 1
        gt["boxes"] = b
        gt["masks"] = np.ascontiguousarray(gt["masks"][:, :, ::-1])
    canvas, (th, tw), (sy, sx) = preprocess_image_bgr(
        img[:, :, ::-1], min_size, max_size)
    g = min(len(gt["boxes"]), max_gt)
    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.full((max_gt,), -1, np.int32)
    crops = np.zeros((max_gt, crop, crop), np.float32)
    for i in range(g):
        if gt["iscrowd"][i]:
            continue
        boxes[i] = gt["boxes"][i] * np.asarray([sx, sy, sx, sy], np.float32)
        classes[i] = gt["classes"][i]
        # sample the crop over the EXACT float gt box (warpAffine), not
        # int-truncated bounds: mask_targets_from_crops projects proposal
        # rois assuming the RxR crop spans [x1,x2]x[y1,y2] precisely, and
        # a ~1px crop offset shifts small-object mask targets by ~10%
        x1, y1, x2, y2 = gt["boxes"][i].astype(np.float64)
        bw = max(x2 - x1, 1.0)
        bh = max(y2 - y1, 1.0)
        mat = np.asarray(
            [[bw / crop, 0.0, x1 + 0.5 * bw / crop - 0.5],
             [0.0, bh / crop, y1 + 0.5 * bh / crop - 0.5]], np.float64)
        m = cv2.warpAffine(
            gt["masks"][i].astype(np.float32), mat, (crop, crop),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
        crops[i] = m > 0.5
    return canvas, (th, tw), {
        "boxes": boxes, "classes": classes, "mask_crops": crops}


def do_train(dataset, cfg: M.MaskRCNNConfig | None = None, params=None,
             base_lr=0.0025, steps=(120000, 160000), max_iter=180000,
             ims_per_batch=2, checkpoint_period=2500,
             output_dir="weights/detectron", log_every=20, max_steps=None,
             label_map=None, seed=3, forward_losses=None,
             init_params_fn=None, compute_dtype=None):
    """``forward_losses(params, images, hw, targets, key) -> loss dict``
    defaults to the Mask R-CNN FPN family; pass the RetinaNet equivalents
    (with ``init_params_fn``) to train the one-stage model with the same
    solver/schedule/logging.

    ``compute_dtype=jnp.bfloat16`` = TPU mixed precision: f32 master
    params in the optimizer, bf16 forward/backward (loss modules upcast
    logits to f32 at their entry points). None = reference-parity f32."""
    cfg = cfg or M.MaskRCNNConfig()
    if forward_losses is None:
        lcfg = ML.MaskRCNNLossConfig(num_classes=cfg.num_classes)

        def forward_losses(p, images, hw, targets, key):
            return M.forward_train_losses(
                p, images, hw, targets, key, cfg, lcfg)

    lr_fn = warmup_multistep_lr(base_lr=base_lr, steps=steps)
    if params is None:
        params = (init_params_fn or M.init_params)(
            jax.random.PRNGKey(0), cfg)
    buf = sgd_init(params)
    # maskrcnn-benchmark param groups: biases lr x2 / wd 0; FrozenBN
    # buffers and stem+layer1 (FREEZE_CONV_BODY_AT=2) never update
    from tpuseg.engine.trainer import detectron_param_groups

    lr_scale, wd_scale = detectron_param_groups(params)

    def step_fn(params, buf, images, hw, targets, key, it):
        def loss_fn(p):
            if compute_dtype is not None:
                from tpuseg.engine.trainer import cast_floats

                p = cast_floats(p, compute_dtype)
                images_c = images.astype(compute_dtype)
            else:
                images_c = images
            losses = forward_losses(p, images_c, hw, targets, key)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, buf = sgd_update(params, grads, buf, lr_fn(it),
                                 momentum=0.9, weight_decay=1e-4,
                                 lr_scale=lr_scale, wd_scale=wd_scale)
        return params, buf, losses

    step_jit = jax.jit(step_fn)
    rng = np.random.default_rng(seed)
    ids = list(dataset.image_ids)
    avgs: dict[str, MovingAverage] = {}
    t_avg = MovingAverage(50)
    key = jax.random.PRNGKey(seed)
    it = 0
    if not ids:
        raise ValueError("dataset has no images")
    # bucket by orientation so each batch shares one canvas. Buckets
    # persist across shuffle passes: resetting them every epoch would spin
    # forever on datasets with fewer than ims_per_batch images of an
    # orientation (partial buckets carry over and fill on a later pass)
    buckets = {CANVAS_LANDSCAPE: [], CANVAS_PORTRAIT: []}
    while it < max_iter and (max_steps is None or it < max_steps):
        rng.shuffle(ids)
        for iid in ids:
            info = dataset.coco.imgs[iid]
            canvas = (CANVAS_LANDSCAPE if info["width"] >= info["height"]
                      else CANVAS_PORTRAIT)
            buckets[canvas].append(iid)
            if len(buckets[canvas]) == ims_per_batch:
                chunk = buckets[canvas]
                buckets[canvas] = []
                imgs, hws, tgts = [], [], []
                for i in chunk:
                    cvs, hw, t = build_train_example(dataset, i, rng=rng)
                    imgs.append(cvs)
                    hws.append(hw)
                    tgts.append(t)
                images = jnp.asarray(np.stack(imgs))
                hw = jnp.asarray(np.asarray(hws, np.int32))
                targets = {k: jnp.asarray(np.stack([t[k] for t in tgts]))
                           for k in tgts[0]}
                key, sub = jax.random.split(key)
                t0 = time.perf_counter()
                params, buf, losses = step_jit(
                    params, buf, images, hw, targets, sub, it)
                losses = jax.tree.map(float, jax.device_get(losses))
                t_avg.add(time.perf_counter() - t0)
                for k, v in losses.items():
                    avgs.setdefault(k, MovingAverage(50)).add(v)
                it += 1
                if it % log_every == 0:
                    terms = "  ".join(
                        f"{k}: {a.get_avg():.4f}" for k, a in avgs.items())
                    eta = (max_iter - it) * t_avg.get_avg() / 3600
                    print(f"iter: {it}  {terms}  "
                          f"time: {t_avg.get_avg():.3f}  eta: {eta:.1f}h")
                if it % checkpoint_period == 0:
                    path = f"{output_dir}/model_{it:07d}.npz"
                    save_params_npz(path, jax.device_get(params))
                    print(f"saved {path}")
                if it >= max_iter or (max_steps is not None
                                      and it >= max_steps):
                    break
    return params, it
