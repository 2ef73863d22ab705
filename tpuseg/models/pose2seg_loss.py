"""Pose2Seg training loss + trainer (Pose2Seg.jittor train.py capability).

The reference trains the seg module (and finetunes the backbone) with
pixel-wise cross-entropy on the aligned 64x64 crops: gt masks are warped
into each person's aligned frame with the same affine used for features.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.engine.trainer import sgd_init, sgd_update
from tpuseg.models import pose2seg as P2S


def aligned_ce_loss(logits, gt_aligned, person_valid):
    """logits [B,P,S,S,2]; gt_aligned [B,P,S,S] in {0,1};
    person_valid [B,P]."""
    logp = jax.nn.log_softmax(logits, -1)
    t = gt_aligned.astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    per_person = ce.mean(axis=(2, 3))
    w = person_valid.astype(ce.dtype)
    return jnp.sum(per_person * w) / jnp.maximum(jnp.sum(w), 1.0)


def warp_gt_to_aligned(gt_masks, theta, align_size):
    """gt_masks [B,P,H,W] float; theta [B,P,2,3] -> [B,P,S,S] (same affine
    as the feature crop)."""
    b, p, h, w = gt_masks.shape
    # fold persons into the sample batch axis so each person's affine is
    # applied ONLY to that person's own mask channel (a [B,H,W,P] call
    # would warp every mask with every theta and keep just the diagonal —
    # P x the grid_sample work and a [B,P,S,S,P] intermediate)
    out = P2S.affine_align(
        gt_masks.reshape(b * p, h, w, 1),
        theta.reshape(b * p, 1, 2, 3), align_size)  # [B*P,1,S,S,1]
    return out.reshape(b, p, align_size, align_size)


class Pose2SegTrainer:
    def __init__(self, cfg: P2S.Pose2SegConfig, lr_fn=None, momentum=0.9,
                 weight_decay=5e-4):
        self.cfg = cfg
        self.lr_fn = lr_fn or (lambda it: 2e-4)
        mom, wd = momentum, weight_decay
        c = cfg
        lr_fn_ = self.lr_fn

        from tpuseg.nn import layers as L

        def loss_fn(params, images, theta, valid, gt_aligned, skel):
            # Pose2Seg train.py runs the whole model in training mode:
            # BN normalizes by batch stats and updates running stats
            with L.bn_train_mode() as bt:
                feats = P2S.backbone_forward(params, images, c)
                aligned = P2S.affine_align(feats, theta, c.align_size)
                if c.cat_skeleton:
                    aligned = jnp.concatenate(
                        [aligned, skel.astype(aligned.dtype)], axis=-1)
                b, p = theta.shape[:2]
                logits = P2S.seg_module(
                    params["seg"],
                    aligned.reshape(b * p, c.align_size, c.align_size, -1), c)
            bn_stats = L.bn_tape_by_path(params, bt.tape)
            logits = logits.reshape(b, p, c.align_size, c.align_size, 2)
            return aligned_ce_loss(logits, gt_aligned, valid), bn_stats

        def step(params, buf, images, theta, valid, gt_aligned, skel, it):
            (loss, bn_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                params, images, theta, valid, gt_aligned, skel)
            params, buf = sgd_update(params, grads, buf, lr_fn_(it), mom, wd,
                                     lr_scale=L.bn_param_groups(params))
            params = L.bn_apply_stats(params, bn_stats)
            return params, buf, loss

        self._step = jax.jit(step)

    def init_state(self, params):
        return sgd_init(params)

    def train_step(self, params, buf, images, theta, valid, gt_aligned, it,
                   skel=None):
        if skel is None:
            if self.cfg.cat_skeleton:
                # training the 311-ch segnet with the 55 skeleton channels
                # silently zeroed would "converge" without ever learning the
                # skeleton pathway — require the caller to pass them
                raise ValueError(
                    "cfg.cat_skeleton is on: pass skel features to "
                    "train_step (see tools/pose2seg_train.py)")
            b, p = theta.shape[:2]
            skel = jnp.zeros(
                (b, p, self.cfg.align_size, self.cfg.align_size,
                 self.cfg.skeleton_channels), jnp.float32)
        return self._step(params, buf, images, theta, valid, gt_aligned,
                          skel, it)
