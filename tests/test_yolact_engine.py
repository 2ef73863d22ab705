import json
import os

import numpy as np
import jax

from tpuseg.data.coco_dataset import CocoDetectionDataset
from tpuseg.engine.yolact_engine import YolactPredictor, evaluate_dataset
from tpuseg.models import yolact as Y


def _write_synth_dataset(root):
    import cv2

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
            anns.append({
                "id": len(anns) + 1, "image_id": i + 1, "category_id": cat,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x, y, x, y + bh, x + bw, y + bh, x + bw, y]],
            })
        cv2.imwrite(f"{root}/images/{i + 1:03d}.jpg", img)
        images.append({"id": i + 1, "height": h, "width": w,
                       "file_name": f"{i + 1:03d}.jpg"})
    ann = {"images": images, "annotations": anns,
           "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    with open(f"{root}/ann.json", "w") as f:
        json.dump(ann, f)
    return f"{root}/images", f"{root}/ann.json"


def _small_cfg():
    return Y.YolactConfig(img_size=128, num_classes=3, nms_top_k=16,
                          max_num_detections=10)


def test_evaluate_dataset_runs(tmp_path, capsys):
    img_dir, ann = _write_synth_dataset(str(tmp_path))
    label_map = {1: 1, 2: 2}
    ds = CocoDetectionDataset(img_dir, ann, label_map=label_map)
    cfg = _small_cfg()
    pred = YolactPredictor(cfg, batch_size=2)
    maps = evaluate_dataset(pred, ds, progress=False)
    assert "box" in maps and "mask" in maps
    assert 0 <= maps["box"]["all"] <= 100


def test_evaluate_dataset_oracle_is_perfect(tmp_path):
    """Feed ground truth through the full engine path -> 100 mAP."""
    img_dir, ann = _write_synth_dataset(str(tmp_path))
    ds = CocoDetectionDataset(img_dir, ann, label_map={1: 1, 2: 2})
    cfg = _small_cfg()
    pred = YolactPredictor(cfg, batch_size=2)
    proto = cfg.proto_size
    ids = ds.image_ids

    def oracle_run_batch(batch):
        bs = len(batch)
        k = cfg.max_num_detections
        out = {
            "boxes": np.zeros((bs, k, 4), np.float32),
            "scores": np.zeros((bs, k), np.float32),
            "classes": np.zeros((bs, k), np.int32),
            "masks": np.zeros((bs, k, proto, proto), np.float32),
            "valid": np.zeros((bs, k), bool),
        }
        for bi in range(bs):
            if bi >= len(oracle_run_batch.chunk):
                break
            gt = ds.load_target(oracle_run_batch.chunk[bi])
            h, w = gt["height"], gt["width"]
            n = len(gt["boxes"])
            for j in range(n):
                out["boxes"][bi, j] = gt["boxes"][j] / [w, h, w, h]
                out["scores"][bi, j] = 0.9
                out["classes"][bi, j] = gt["classes"][j]
                import cv2
                m = cv2.resize(gt["masks"][j].astype(np.float32),
                               (proto, proto), interpolation=cv2.INTER_LINEAR)
                out["masks"][bi, j] = m
                out["valid"][bi, j] = True
        return out

    # wire the oracle through: intercept run_batch and record the chunk ids
    orig_eval = evaluate_dataset
    calls = {"start": 0}

    def run_batch(batch):
        start = calls["start"]
        oracle_run_batch.chunk = ids[start:start + pred.batch_size]
        calls["start"] = start + pred.batch_size
        return oracle_run_batch(batch)

    pred.run_batch = run_batch
    maps = orig_eval(pred, ds, progress=False)
    assert maps["box"]["all"] == 100.0
    assert maps["mask"]["all"] >= 95.0  # proto-res roundtrip is near-lossless


def test_maskrcnn_evaluate_coco_oracle(tmp_path):
    """Ground truth through evaluate_coco's json+COCOeval path -> AP == 1."""
    import types

    from tpuseg.engine import maskrcnn_engine as ME

    img_dir, ann = _write_synth_dataset(str(tmp_path))
    # synthetic categories 1,2 -> remap into COCO ids via identity label_map
    ds = CocoDetectionDataset(img_dir, ann, label_map=None)

    class Oracle:
        def run_on_bgr_image(self, img_bgr):
            iid = oracle_state["ids"].pop(0)
            gt = ds.load_target(iid)
            # classes: category_id - 1 must invert via COCO_CATEGORY_IDS;
            # synthetic cats are 1 and 2 == COCO ids 1, 2 (indices 0, 1)
            return {
                "boxes": gt["boxes"] - np.asarray([0, 0, 1, 1]),  # xyxy inc.
                "scores": np.full(len(gt["boxes"]), 0.9, np.float32),
                "classes": gt["classes"],  # 0-based already (label_map=None
                # keeps raw category ids; load_target subtracts 1)
                "masks": gt["masks"],
            }

    oracle_state = {"ids": list(ds.image_ids)}
    stats = ME.evaluate_coco(Oracle(), ds, progress=False)
    assert stats["bbox"][0] > 0.99
    assert stats["segm"][0] > 0.99


def test_evaluate_dataset_coco_json(tmp_path):
    """--output_coco_json path: dumps jsons and runs the COCOeval clone."""
    img_dir, ann = _write_synth_dataset(str(tmp_path))
    ds = CocoDetectionDataset(img_dir, ann, label_map={1: 1, 2: 2})
    cfg = Y.YolactConfig(img_size=128, num_classes=3, nms_top_k=16,
                         max_num_detections=10)
    pred = YolactPredictor(cfg, batch_size=2)
    out_prefix = str(tmp_path / "res")
    evaluate_dataset(pred, ds, progress=False, output_coco_json=out_prefix)
    import json, os

    assert os.path.exists(out_prefix + "_bbox.json")
    assert os.path.exists(out_prefix + "_mask.json")
    data = json.load(open(out_prefix + "_mask.json"))
    assert isinstance(data, list)
