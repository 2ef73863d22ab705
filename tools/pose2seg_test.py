#!/usr/bin/env python
"""Pose2Seg evaluation (Pose2Seg.jittor test.py parity).

Usage (README.md:195-199):
    python tools/pose2seg_test.py --weights last.pkl --coco \
        --coco_images <val2017 dir> --coco_ann <person_keypoints json>
    python tools/pose2seg_test.py --weights last.pkl --OCHuman \
        --ochuman_images <dir> --ochuman_val <json> [--ochuman_test <json>]
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--coco", action="store_true")
    ap.add_argument("--OCHuman", action="store_true")
    ap.add_argument("--coco_images", default="./data/coco2017/val2017")
    ap.add_argument("--coco_ann",
                    default="./data/coco2017/annotations/"
                            "person_keypoints_val2017_pose2seg.json")
    ap.add_argument("--ochuman_images", default="./data/OCHuman/images")
    ap.add_argument("--ochuman_val",
                    default="./data/OCHuman/ochuman_coco_format_val_"
                            "range_0.00_1.00.json")
    ap.add_argument("--ochuman_test",
                    default="./data/OCHuman/ochuman_coco_format_test_"
                            "range_0.00_1.00.json")
    ap.add_argument("--max_images", type=int, default=None)
    args = ap.parse_args()

    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.pose2seg_engine import (
        Pose2SegPredictor, evaluate_pose2seg)

    predictor = Pose2SegPredictor(weights=args.weights)
    runs = []
    if args.coco:
        runs.append(("cocoVal", args.coco_images, args.coco_ann))
    if args.OCHuman:
        runs.append(("OCHumanVal", args.ochuman_images, args.ochuman_val))
        runs.append(("OCHumanTest", args.ochuman_images, args.ochuman_test))
    for name, images, ann in runs:
        print(f"===== {name} =====")
        ds = CocoDetectionDataset(images, ann, label_map=None)
        evaluate_pose2seg(predictor, ds, max_images=args.max_images)


if __name__ == "__main__":
    main()
