#!/usr/bin/env python
"""ViT finetuning (ViT.jittor train.py capability).

Trains on an image-folder dataset (class-per-subdir) or synthetic data for
smoke runs.
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="vit_b16_config")
    ap.add_argument("--data_dir", default=None,
                    help="root with one subdir per class")
    ap.add_argument("--weights", default=None, help="pretrained .pth/.npz")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--save", default="weights/vit_finetuned.npz")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.engine.classify import config_to_vit, load_vit_weights
    from tpuseg.engine.config import get_config
    from tpuseg.engine.trainer import save_params_npz
    from tpuseg.engine.vit_train import ViTTrainer, cosine_schedule
    from tpuseg.nn import vit as vit_nn
    from tpuseg.ops.preprocess import vit_preprocess

    preset = get_config(args.config)
    rng = np.random.default_rng(0)

    if args.data_dir:
        classes = sorted(os.listdir(args.data_dir))
        samples = []
        for ci, cname in enumerate(classes):
            cdir = os.path.join(args.data_dir, cname)
            for f in os.listdir(cdir):
                samples.append((os.path.join(cdir, f), ci))
        preset = preset.copy({"num_classes": len(classes)})
        print(f"{len(samples)} images, {len(classes)} classes")
    else:
        samples = None
        print("no --data_dir: synthetic smoke-training")

    cfg = config_to_vit(preset)
    if args.weights:
        params = load_vit_weights(args.weights, cfg)
    else:
        params = vit_nn.init_params(jax.random.PRNGKey(0), cfg)
    trainer = ViTTrainer(cfg, lr_fn=cosine_schedule(args.lr, args.steps))
    buf = trainer.init_state(params)

    from tpuseg.data.native_loader import NativeImageLoader

    loader = NativeImageLoader()
    for it in range(args.steps):
        if samples:
            idx = rng.integers(0, len(samples), args.batch_size)
            paths = [samples[i][0] for i in idx]
            labels = np.asarray([samples[i][1] for i in idx], np.int32)
            imgs, _ = loader.load_batch(paths, cfg.image_size, cfg.image_size)
        else:
            imgs = rng.integers(
                0, 255, (args.batch_size, cfg.image_size, cfg.image_size, 3)
            ).astype(np.uint8)
            labels = rng.integers(0, cfg.num_classes, args.batch_size).astype(
                np.int32)
        x = vit_preprocess(jnp.asarray(imgs), size=cfg.image_size)
        params, buf, metrics = trainer.train_step(
            params, buf, x, jnp.asarray(labels), it)
        if (it + 1) % 10 == 0:
            print(f"step {it + 1}: loss {float(metrics['loss']):.4f} "
                  f"acc {float(metrics['acc']):.3f}")
    save_params_npz(args.save, jax.device_get(params))
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
