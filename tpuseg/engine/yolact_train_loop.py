"""YOLACT training loop (Yolact.jittor train.py parity).

Host pipeline: COCO dataset -> SSD augmentation -> padded device targets
(gt masks pre-downsampled to proto and P3 resolutions). Device: the single
jit train step from tpuseg.engine.trainer (loss + grads + SGD), DP-sharded
over the mesh when more than one chip is available. Console logging mirrors
the reference's loss-term lines (B/C/M/S + ETA via MovingAverage), and
checkpoints follow the ``<cfg>_<epoch>_<iter>`` naming.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def build_targets_np(gt: dict, aug_img_size: int, proto_size: int,
                     sem_size: int, max_gt: int):
    """Augmented per-image target -> fixed-shape numpy arrays."""
    import cv2

    g = min(len(gt["classes"]), max_gt)
    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.full((max_gt,), -1, np.int32)
    crowd = np.zeros((max_gt,), bool)
    masks_proto = np.zeros((max_gt, proto_size, proto_size), np.float32)
    masks_sem = np.zeros((max_gt, sem_size, sem_size), np.float32)
    for i in range(g):
        boxes[i] = gt["boxes"][i]
        classes[i] = gt["classes"][i]
        crowd[i] = bool(gt.get("iscrowd", np.zeros(g))[i])
        m = gt["masks"][i].astype(np.float32)
        masks_proto[i] = (
            cv2.resize(m, (proto_size, proto_size),
                       interpolation=cv2.INTER_LINEAR) > 0.5)
        masks_sem[i] = (
            cv2.resize(m, (sem_size, sem_size),
                       interpolation=cv2.INTER_LINEAR) > 0.5)
    return {
        "boxes": boxes, "classes": classes, "crowd": crowd,
        "masks_proto": masks_proto, "masks_sem": masks_sem,
    }


def batch_iterator(dataset, cfg, rng: np.random.Generator, batch_size: int,
                   max_gt: int = 32):
    """Infinite shuffled batches of (images, targets) numpy arrays."""
    from tpuseg.data.augment import AugmentConfig, ssd_augment
    from tpuseg.models.yolact import level_sizes

    acfg = AugmentConfig(size=cfg.img_size)
    sizes = level_sizes(cfg)
    proto = sizes[0] * 2
    sem = sizes[0]
    ids = list(dataset.image_ids)
    if len(ids) < batch_size:
        # the range() below would yield nothing and the while-loop would
        # reshuffle forever — fail loudly instead of hanging the trainer
        raise ValueError(
            f"dataset has {len(ids)} images < batch_size {batch_size}")
    while True:
        rng.shuffle(ids)
        for start in range(0, len(ids) - batch_size + 1, batch_size):
            imgs, tgts = [], []
            for iid in ids[start:start + batch_size]:
                img = dataset.load_image(iid)
                gt = dataset.load_target(iid)
                # crowds ride along (reference keeps them with label -1 so
                # matching can neutralize anchors over crowd regions)
                aimg, aboxes, aclasses, amasks, acrowd = ssd_augment(
                    rng, img, gt["boxes"], gt["classes"],
                    gt["masks"], acfg, iscrowd=gt["iscrowd"].astype(bool))
                # crowds go LAST (reference appends them after real gts) so
                # the max_gt cap never evicts a real gt in favor of a crowd
                order = np.argsort(acrowd, kind="stable")
                aboxes, aclasses, acrowd = (
                    aboxes[order], aclasses[order], acrowd[order])
                if len(amasks):
                    amasks = amasks[order]
                # ssd_augment returns normalized boxes; masks at train size
                tgts.append(build_targets_np(
                    {"boxes": aboxes, "classes": aclasses, "masks": amasks,
                     "iscrowd": acrowd},
                    cfg.img_size, proto, sem, max_gt))
                imgs.append(aimg)
            images = np.stack(imgs)
            targets = {
                k: np.stack([t[k] for t in tgts]) for k in tgts[0]
            }
            yield images, targets


def train(dataset, model_cfg, batch_size=8, max_iter=800000, save_every=10000,
          save_folder="weights/", cfg_name="yolact_base", resume=None,
          start_iter=-1, log_every=10, lr_fn=None, use_mesh=True,
          max_steps=None, compute_dtype=None, loss_cfg=None,
          save_format="pth"):
    """train.py main loop (README.md:225-237 CLI semantics)."""
    from tpuseg.engine.trainer import (
        YolactTrainer, ckpt_path, load_params_ckpt, parse_ckpt_iter,
        save_params_npz, save_params_pth)
    from tpuseg.models import yolact as yolact_model
    from tpuseg.parallel.mesh import make_mesh, replicate, shard_batch
    from tpuseg.utils.logging import MovingAverage

    n_dev = len(jax.devices()) if use_mesh else 1
    # yolact train.py: per-GPU batch < 6 -> "Disabling batch norm" —
    # otherwise BN trains (batch stats + running-stat updates)
    freeze_bn = (batch_size // max(n_dev, 1)) < 6
    trainer = YolactTrainer(model_cfg, loss_cfg=loss_cfg, lr_fn=lr_fn,
                            compute_dtype=compute_dtype,
                            freeze_bn=freeze_bn)
    params = yolact_model.init_params(jax.random.PRNGKey(0), model_cfg)
    it = 0
    if resume:
        params = load_params_ckpt(resume, params, model_cfg)
        it = parse_ckpt_iter(resume) if start_iter < 0 else start_iter
    buf = trainer.init_state(params)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = make_mesh()
        params = replicate(params, mesh)
        buf = replicate(buf, mesh)

    rng = np.random.default_rng(42)
    it_gen = batch_iterator(dataset, model_cfg, rng, batch_size)
    # loss-term keys vary by config (++ adds 'I'): create averages lazily
    loss_keys = ("B", "C", "M", "S")
    avgs = {}
    time_avg = MovingAverage(100)
    epoch_size = max(len(dataset) // batch_size, 1)
    key = jax.random.PRNGKey(7)
    while it < max_iter:
        if max_steps is not None and max_steps <= 0:
            break
        images, targets = next(it_gen)
        images = jnp.asarray(images)
        targets = jax.tree.map(jnp.asarray, targets)
        if mesh is not None:
            images = shard_batch(images, mesh)
            targets = shard_batch(targets, mesh)
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, buf, losses = trainer.train_step(
            params, buf, images, targets, sub, it)
        losses = jax.tree.map(float, jax.device_get(losses))
        time_avg.add(time.perf_counter() - t0)
        for k, v in losses.items():
            avgs.setdefault(k, MovingAverage(100)).add(v)
        it += 1
        if max_steps is not None:
            max_steps -= 1
        if it % log_every == 0:
            eta = (max_iter - it) * time_avg.get_avg()
            terms = " | ".join(
                f"{k}: {avgs[k].get_avg():.3f}"
                for k in (*loss_keys, "I") if k in avgs)
            print(f"[{it // epoch_size:3d}] {it:7d} || {terms} || "
                  f"T: {avgs['total'].get_avg():.3f} || "
                  f"ETA: {eta / 3600:.2f}h || {time_avg.get_avg():.3f}s/it")
        if it % save_every == 0:
            path = ckpt_path(save_folder, cfg_name, it // epoch_size, it,
                             fmt=save_format)
            if save_format == "pth":
                save_params_pth(path, jax.device_get(params), model_cfg)
            else:
                save_params_npz(path, jax.device_get(params))
            print(f"saved {path}")
    return params, it
