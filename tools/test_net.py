#!/usr/bin/env python
"""Mask R-CNN COCO evaluation (detectron.jittor tools/test_net.py parity).

Usage (README.md:343-347):
    python tools/test_net.py --config-file configs/e2e_mask_rcnn_R_50_FPN_1x.yaml \
        MODEL.WEIGHT weights/e2e_mask_rcnn_R_50_FPN_1x.pth
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-file", default=None)
    ap.add_argument("--images", default=None, help="COCO val image dir")
    ap.add_argument("--annotations", default=None, help="instances json")
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--devices", default=None,
                    help="'all' or N: shard the eval batch across devices")
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="dotted config overrides, e.g. MODEL.WEIGHT path")
    args = ap.parse_args()

    from tpuseg.engine.config import ConfigNode
    from tpuseg.engine.maskrcnn_engine import (
        build_predictor_from_cfg, evaluate_coco)
    from tpuseg.data.coco_dataset import CocoDetectionDataset

    cfg = ConfigNode({"MODEL": {"WEIGHT": ""},
                      "INPUT": {"MIN_SIZE_TEST": 800},
                      "DATASETS": {"IMAGES": args.images or "",
                                   "ANNOTATIONS": args.annotations or ""}})
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    # dispatches FPN vs C4 on MODEL.BACKBONE.CONV_BODY
    predictor = build_predictor_from_cfg(
        cfg, devices=args.devices, batch_size=args.batch_size)
    dataset = CocoDetectionDataset(
        cfg.DATASETS.IMAGES, cfg.DATASETS.ANNOTATIONS, label_map=None)
    evaluate_coco(predictor, dataset, max_images=args.max_images,
                  batch_size=args.batch_size)


if __name__ == "__main__":
    main()
