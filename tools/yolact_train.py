#!/usr/bin/env python
"""YOLACT training (Yolact.jittor train.py CLI parity, README.md:225-237).

Usage:
    python tools/yolact_train.py --config=yolact_base_config --batch_size=8
    python tools/yolact_train.py --config=yolact_base_config \
        --resume=weights/yolact_base_10_32100.pth --start_iter=-1
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="yolact_base_config")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--start_iter", type=int, default=-1)
    ap.add_argument("--save_folder", default="weights/")
    ap.add_argument("--save_interval", type=int, default=10000)
    ap.add_argument("--save_format", default="pth", choices=["pth", "npz"],
                    help="pth = reference SavePath convention "
                    "(torch-zip, loads in upstream yolact)")
    ap.add_argument("--max_iter", type=int, default=800000)
    ap.add_argument("--max_steps", type=int, default=None,
                    help="stop after N steps (smoke runs)")
    ap.add_argument("--train_images", default=None)
    ap.add_argument("--train_info", default=None)
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="bfloat16 = TPU mixed precision (f32 master weights)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpuseg.configs.presets import yolact_loss_config, yolact_model_config
    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.config import get_config
    from tpuseg.engine.yolact_train_loop import train

    preset = get_config(args.config)
    mcfg = yolact_model_config(preset)
    ds_cfg = get_config(preset.dataset)
    images = args.train_images or ds_cfg.train_images
    info = args.train_info or ds_cfg.train_info
    dataset = CocoDetectionDataset(images, info)
    print(f"config: {args.config}  dataset: {len(dataset)} images  "
          f"batch: {args.batch_size}")
    train(dataset, mcfg, batch_size=args.batch_size, max_iter=args.max_iter,
          save_every=args.save_interval, save_folder=args.save_folder,
          cfg_name=preset.name, resume=args.resume,
          start_iter=args.start_iter, max_steps=args.max_steps,
          loss_cfg=yolact_loss_config(preset),
          save_format=args.save_format,
          compute_dtype=(jnp.bfloat16
                         if args.compute_dtype == "bfloat16" else None))


if __name__ == "__main__":
    main()
