#!/usr/bin/env python
"""Per-stage YOLACT-550 R50-FPN TRAIN-step profile on the real chip.

bs=8 mixed-bf16 (bench.py::bench_yolact_train setup). Stages jitted
alone with grads where the real step has them; relative map only.

  forward fwd+bwd          (backbone+FPN+heads+proto, train-mode BN)
  matching                 (per-image SSD match over 19248 priors x 16 gt)
  conf OHEM loss           (softmax over [19248, 81], neg mining sort)
  loc + mask + sem losses  (smooth-L1, proto@coeff crops BCE, sem aux)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.engine.trainer import YolactTrainer
from tpuseg.models import yolact as Y
from tpuseg.models import yolact_loss as YL


def _sync(out):
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=8, warm=2):
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
    cfg = Y.YolactConfig(backbone="resnet50")
    trainer = YolactTrainer(cfg, compute_dtype=jnp.bfloat16)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    buf = trainer.init_state(params)
    rng = np.random.default_rng(0)
    sizes = Y.level_sizes(cfg)
    proto = sizes[0] * 2
    xy = rng.uniform(0, 0.5, (batch, g, 2))
    wh = rng.uniform(0.1, 0.5, (batch, g, 2))
    classes = rng.integers(0, cfg.num_classes - 1, (batch, g)).astype(np.int32)
    classes[:, g // 2:] = -1
    targets = {
        "boxes": jnp.asarray(
            np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "classes": jnp.asarray(classes),
        "crowd": jnp.zeros((batch, g), bool),
        "masks_proto": jnp.asarray(
            (rng.uniform(size=(batch, g, proto, proto)) > 0.5)
            .astype(np.float32)),
        "masks_sem": jnp.asarray(
            (rng.uniform(size=(batch, g, sizes[0], sizes[0])) > 0.5)
            .astype(np.float32)),
    }
    images = jnp.asarray(
        rng.standard_normal((batch, cfg.img_size, cfg.img_size, 3))
        .astype(np.float32))
    key = jax.random.PRNGKey(1)

    t = timeit(jax.jit(lambda p, b, im, tg: trainer.train_step(
        p, b, im, tg, key, 100)), (params, buf, images, targets), iters=8)
    print(f"full train step: {t*1e3:8.1f} ms ({batch/t:.1f} img/s)")

    from tpuseg.engine.trainer import cast_floats
    from tpuseg.nn import layers as L

    lcfg = trainer.loss_cfg
    priors = jnp.asarray(Y.make_priors_np(cfg))

    # forward-only fwd+bwd (sum of raw predictions, train-mode BN)
    def fwd_sum(p, im):
        with L.bn_train_mode():
            preds, sem = Y.forward_train(
                cast_floats(p, jnp.bfloat16), im.astype(jnp.bfloat16), cfg)
        return (sum(jnp.sum(v.astype(jnp.float32)) for v in preds.values())
                + jnp.sum(sem.astype(jnp.float32)))

    t = timeit(jax.jit(jax.grad(fwd_sum)), (params, images))
    print(f"forward (backbone+FPN+heads+proto) fwd+bwd: {t*1e3:8.1f} ms")

    # loss-only given fixed predictions
    jf = jax.jit(lambda p, im: Y.forward_train(
        cast_floats(p, jnp.bfloat16), im.astype(jnp.bfloat16), cfg))
    preds, sem = jf(params, images)
    preds = {k: v.astype(jnp.float32) for k, v in preds.items()}
    sem = sem.astype(jnp.float32)

    def loss_only(preds, sem):
        return YL.total_loss(preds, sem, targets, priors, key, lcfg)["total"]

    t = timeit(jax.jit(jax.grad(loss_only, argnums=(0, 1))), (preds, sem))
    print(f"total loss fwd+bwd (match+OHEM+mask+sem): {t*1e3:8.1f} ms")

    # loss decomposition (fwd only; matcher has no grads)
    def match_only(tg):
        def per_image(gb, gc, cr):
            return YL.match_priors(gb, gc, cr, priors, lcfg)
        return jax.vmap(per_image)(
            tg["boxes"], tg["classes"], tg["crowd"])

    try:
        jm = jax.jit(match_only)
        _ = jm(targets)
        t = timeit(jm, (targets,))
        print(f"  matching alone (19248 priors x {g} gt x {batch}): "
              f"{t*1e3:8.1f} ms")
    except Exception as e:
        print(f"  matching alone: skipped ({type(e).__name__})")


if __name__ == "__main__":
    main()
