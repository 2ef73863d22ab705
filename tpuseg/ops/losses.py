"""Shared loss ops.

:func:`sigmoid_focal_loss` is the TPU equivalent of detectron.jittor's
``detectron/layers/sigmoid_focal_loss.py`` (upstream
csrc/cuda/SigmoidFocalLoss_cuda.cu) — plain jnp, XLA fuses it
(SURVEY.md §2.6: no Pallas needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array,  # [N, C] class logits (no background column)
    targets: jax.Array,  # [N] int class ids, 0 = background, 1..C = fg
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jax.Array:
    """Per-anchor focal loss, summed over classes (CUDA kernel semantics:
    class c in 1..C is positive iff targets == c; background rows drive all
    classes negative; targets < 0 contribute zero)."""
    n, c = logits.shape
    cls_ids = jnp.arange(1, c + 1)
    t = (targets[:, None] == cls_ids[None, :]).astype(logits.dtype)
    valid = (targets >= 0)[:, None].astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    return loss * alpha_t * valid


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, -1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
