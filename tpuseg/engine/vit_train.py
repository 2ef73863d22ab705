"""ViT finetuning engine (ViT.jittor train.py capability).

Cross-entropy finetuning with SGD momentum + cosine/multistep schedules;
the train step is one jit program, DP-sharded over the mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.engine.trainer import sgd_init, sgd_update
from tpuseg.nn import vit as vit_nn
from tpuseg.ops.losses import softmax_cross_entropy


def cosine_schedule(base_lr: float, total_steps: int, warmup: int = 500):
    def lr(it):
        it = jnp.asarray(it, jnp.float32)
        warm = base_lr * it / jnp.maximum(warmup, 1)
        prog = jnp.clip((it - warmup) / jnp.maximum(total_steps - warmup, 1),
                        0.0, 1.0)
        cos = base_lr * 0.5 * (1 + jnp.cos(jnp.pi * prog))
        return jnp.where(it < warmup, warm, cos)

    return lr


class ViTTrainer:
    def __init__(self, cfg: vit_nn.ViTConfig, lr_fn=None, momentum=0.9,
                 weight_decay=1e-4, label_smoothing: float = 0.0):
        self.cfg = cfg
        self.lr_fn = lr_fn or cosine_schedule(3e-2, 10000)
        mom, wd = momentum, weight_decay
        smooth = label_smoothing
        vcfg = cfg
        lr_fn_ = self.lr_fn

        def loss_fn(params, images, labels):
            logits = vit_nn.forward(params, images, vcfg)
            if smooth > 0:
                nc = vcfg.num_classes
                t = jax.nn.one_hot(labels, nc) * (1 - smooth) + smooth / nc
                logp = jax.nn.log_softmax(logits, -1)
                loss = -jnp.sum(t * logp, -1)
            else:
                loss = softmax_cross_entropy(logits, labels)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return jnp.mean(loss), acc

        def step(params, buf, images, labels, iteration):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, labels)
            params, buf = sgd_update(
                params, grads, buf, lr_fn_(iteration), mom, wd)
            return params, buf, {"loss": loss, "acc": acc}

        self._step = jax.jit(step)

    def init_state(self, params):
        return sgd_init(params)

    def train_step(self, params, buf, images, labels, iteration):
        """images [B,H,W,3] normalized float; labels [B] int."""
        return self._step(params, buf, images, labels, iteration)
