#!/usr/bin/env python
"""YOLACT evaluation / inference (Yolact.jittor eval.py CLI parity).

Usage (README.md:239-250 surface):
    # full COCO val mAP table
    python tools/yolact_eval.py --trained_model=weights/yolact_base_54_800000.pth
    # single image
    python tools/yolact_eval.py --trained_model=... --image=input.jpg:output.jpg
    # folder
    python tools/yolact_eval.py --trained_model=... --images=in_dir:out_dir
"""
import argparse
import os


def infer_config_name(weights_path: str | None, explicit: str | None):
    """eval.py behavior: parse the config from the weight filename."""
    if explicit:
        return explicit
    if weights_path:
        base = os.path.basename(weights_path)
        # longest-prefix first so yolact_plus_* doesn't fall into
        # yolact_base
        for name in ("yolact_plus_resnet50", "yolact_plus_base",
                     "yolact_resnet50", "yolact_darknet53", "yolact_im700",
                     "yolact_im400", "yolact_base"):
            if base.startswith(name):
                return name + "_config"
    return "yolact_base_config"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trained_model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--score_threshold", type=float, default=0.0)
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--image", default=None, help="in.jpg or in.jpg:out.jpg")
    ap.add_argument("--images", default=None, help="in_dir:out_dir")
    ap.add_argument("--valid_images", default=None)
    ap.add_argument("--valid_info", default=None)
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--output_coco_json", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--prior_topk", type=int, default=0,
                    help="two-stage candidate selection: compact the top-N "
                         "priors by max class score before per-class NMS "
                         "(0 = off/reference-exact; 4096 is detection-"
                         "identical for trained weights and ~1.5x faster "
                         "on TPU)")
    ap.add_argument("--devices", default=None,
                    help="'all' or N: shard the eval batch across devices")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from tpuseg.configs.presets import yolact_model_config
    from tpuseg.engine.config import get_config
    from tpuseg.engine.yolact_engine import (
        YolactPredictor, evaluate_dataset, resize_to_square)

    cfg_name = infer_config_name(args.trained_model, args.config)
    preset = get_config(cfg_name)
    mcfg = yolact_model_config(preset)
    if args.prior_topk:
        from tpuseg.models.yolact import YolactConfig

        mcfg = YolactConfig(**{**mcfg.__dict__,
                               "prior_topk": args.prior_topk})
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bs = 1 if (args.image or args.images) else args.batch_size
    predictor = YolactPredictor(mcfg, weights=args.trained_model,
                                batch_size=bs, dtype=dtype,
                                devices=args.devices)
    print(f"config: {cfg_name}  backbone: {mcfg.backbone}  "
          f"weights: {args.trained_model or '(random init)'}")

    def run_one(in_path, out_path):
        from tpuseg.data.image_io import load_image_rgb, save_image_bgr

        img = load_image_rgb(in_path)
        h, w = img.shape[:2]
        batch = resize_to_square(img, mcfg.img_size)[None]
        dets = predictor.run_batch(batch)
        det_i = {k: v[0] for k, v in dets.items()}
        final = predictor.postprocess_image(
            det_i, h, w, max(args.score_threshold, 0.05))
        order = np.argsort(-final["scores"])[: args.top_k]
        print(f"{in_path}: {len(order)} detections")
        vis = img[:, :, ::-1].copy()
        import cv2
        rng = np.random.default_rng(0)
        for i in order:
            color = tuple(int(c) for c in rng.integers(60, 255, 3))
            x1, y1, x2, y2 = final["boxes"][i].astype(int)
            m = final["masks"][i].astype(bool)
            vis[m] = (0.55 * vis[m] + 0.45 * np.asarray(color)).astype(np.uint8)
            cv2.rectangle(vis, (x1, y1), (x2, y2), color, 2)
            cv2.putText(vis, f"{int(final['classes'][i])}:{final['scores'][i]:.2f}",
                        (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        color, 1)
            print(f"  class {int(final['classes'][i]):3d} "
                  f"score {final['scores'][i]:.3f}")
        if out_path:
            save_image_bgr(out_path, vis)
            print(f"wrote {out_path}")

    if args.image:
        parts = args.image.split(":")
        run_one(parts[0], parts[1] if len(parts) > 1 else None)
        return
    if args.images:
        din, dout = args.images.split(":")
        os.makedirs(dout, exist_ok=True)
        for name in sorted(os.listdir(din)):
            if name.lower().endswith((".jpg", ".jpeg", ".png")):
                run_one(os.path.join(din, name), os.path.join(dout, name))
        return

    # full dataset mAP
    from tpuseg.data.coco_dataset import CocoDetectionDataset

    ds_cfg = get_config(preset.dataset)
    images = args.valid_images or ds_cfg.valid_images
    info = args.valid_info or ds_cfg.valid_info
    dataset = CocoDetectionDataset(images, info)
    evaluate_dataset(predictor, dataset, max_images=args.max_images,
                     score_threshold=args.score_threshold,
                     output_coco_json=("results/yolact"
                                       if args.output_coco_json else None))


if __name__ == "__main__":
    main()
