import numpy as np
import pytest

from tpuseg.eval import rle as R
from tpuseg.eval.coco import COCO
from tpuseg.eval.cocoeval import COCOeval


def test_rle_counts_roundtrip(rng):
    for shape in [(7, 5), (31, 17), (64, 64), (1, 1)]:
        m = (rng.uniform(size=shape) > 0.5).astype(np.uint8)
        counts = R.encode_counts(m)
        back = R.decode_counts(counts, *shape)
        np.testing.assert_array_equal(back, m)


def test_rle_string_roundtrip(rng):
    for _ in range(20):
        n = rng.integers(1, 50)
        counts = rng.integers(0, 100000, n).astype(np.int64)
        s = R.counts_to_string(counts)
        back = R.string_to_counts(s)
        np.testing.assert_array_equal(back, counts)


def test_encode_decode_dict(rng):
    m = (rng.uniform(size=(23, 31)) > 0.7).astype(np.uint8)
    rle = R.encode(m)
    assert isinstance(rle["counts"], str)
    np.testing.assert_array_equal(R.decode(rle), m)
    assert R.area(rle) == int(m.sum())


def test_poly_to_rle_rectangle():
    # integer-corner rectangle -> exact half-open pixel fill
    rle = R.poly_to_rle([1, 1, 1, 4, 4, 4, 4, 1], 6, 6)
    m = R.decode(rle)
    want = np.zeros((6, 6), np.uint8)
    want[1:4, 1:4] = 1
    np.testing.assert_array_equal(m, want)


def test_poly_to_rle_fullimage():
    rle = R.poly_to_rle([0, 0, 0, 4, 4, 4, 4, 0], 4, 4)
    assert R.area(rle) == 16


def test_mask_iou(rng):
    a = (rng.uniform(size=(10, 12)) > 0.5).astype(np.uint8)
    b = (rng.uniform(size=(10, 12)) > 0.5).astype(np.uint8)
    got = R.mask_iou([R.encode(a)], [R.encode(b)], [0])[0, 0]
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    assert got == pytest.approx(inter / union)
    # crowd: intersection / area(dt)
    got_c = R.mask_iou([R.encode(a)], [R.encode(b)], [1])[0, 0]
    assert got_c == pytest.approx(inter / a.sum())


def _make_gt(num_imgs=2):
    images = [{"id": i + 1, "height": 50, "width": 50} for i in range(num_imgs)]
    cats = [{"id": 1, "name": "thing"}, {"id": 2, "name": "stuff"}]
    anns = []

    def add(img_id, cat, box, crowd=0):
        x, y, w, h = box
        anns.append({
            "id": len(anns) + 1, "image_id": img_id, "category_id": cat,
            "bbox": [x, y, w, h], "area": w * h, "iscrowd": crowd,
            "segmentation": [[x, y, x, y + h, x + w, y + h, x + w, y]],
        })
    add(1, 1, [5, 5, 10, 10])
    add(1, 1, [30, 30, 12, 12])
    add(2, 1, [10, 10, 8, 8])
    add(2, 2, [20, 20, 15, 15])
    return {"images": images, "categories": cats, "annotations": anns}


def _dt(img_id, cat, box, score):
    x, y, w, h = box
    return {"image_id": img_id, "category_id": cat,
            "bbox": [x, y, w, h], "score": score}


def run_eval(gt_dict, dts, iouType="bbox"):
    gt = COCO(gt_dict)
    if iouType == "segm":
        for d in dts:
            x, y, w, h = d["bbox"]
            m = np.zeros((50, 50), np.uint8)
            m[int(y):int(y + h), int(x):int(x + w)] = 1
            d["segmentation"] = R.encode(m)
    dt = gt.loadRes(dts)
    E = COCOeval(gt, dt, iouType)
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E.stats


def test_perfect_detections_ap1():
    gt = _make_gt()
    dts = [
        _dt(1, 1, [5, 5, 10, 10], 0.9),
        _dt(1, 1, [30, 30, 12, 12], 0.8),
        _dt(2, 1, [10, 10, 8, 8], 0.95),
        _dt(2, 2, [20, 20, 15, 15], 0.85),
    ]
    stats = run_eval(gt, dts)
    assert stats[0] == pytest.approx(1.0)
    assert stats[1] == pytest.approx(1.0)
    stats_segm = run_eval(gt, [dict(d) for d in dts], "segm")
    assert stats_segm[0] == pytest.approx(1.0)


def test_half_recall_ap():
    # only 1 of 2 class-1 gts in image 1 detected; others perfect
    gt = _make_gt()
    dts = [
        _dt(1, 1, [5, 5, 10, 10], 0.9),
        _dt(2, 1, [10, 10, 8, 8], 0.95),
        _dt(2, 2, [20, 20, 15, 15], 0.85),
    ]
    stats = run_eval(gt, dts)
    # class 1: 3 gt, 2 matched, precision 1 -> AP = mean precision over
    # 101 recall pts with recall=2/3: ceil -> 67 ones + 34 zeros
    ap_c1 = 67 / 101
    want = (ap_c1 + 1.0) / 2  # class 2 perfect
    assert stats[0] == pytest.approx(want, abs=1e-6)


def test_false_positive_lowers_precision():
    gt = _make_gt()
    dts = [
        _dt(1, 1, [5, 5, 10, 10], 0.9),
        _dt(1, 1, [30, 30, 12, 12], 0.8),
        _dt(2, 1, [10, 10, 8, 8], 0.95),
        _dt(2, 2, [20, 20, 15, 15], 0.85),
        _dt(2, 2, [1, 1, 5, 5], 0.99),  # high-score FP for class 2
    ]
    stats = run_eval(gt, dts)
    # class 2: FP at rank 1, TP at rank 2 -> precision@recall1.0 = 0.5
    want = (1.0 + 0.5) / 2
    assert stats[0] == pytest.approx(want, abs=1e-6)


def test_crowd_gt_is_ignored():
    gt_dict = _make_gt()
    # add a crowd gt in image 1 class 1; det matching it must not count FP
    x, y, w, h = 40, 5, 8, 8
    gt_dict["annotations"].append({
        "id": 99, "image_id": 1, "category_id": 1,
        "bbox": [x, y, w, h], "area": w * h, "iscrowd": 1,
        "segmentation": {"size": [50, 50],
                         "counts": R.counts_to_string(
                             R.encode_counts(np.ones((50, 50), np.uint8)))},
    })
    dts = [
        _dt(1, 1, [5, 5, 10, 10], 0.9),
        _dt(1, 1, [30, 30, 12, 12], 0.8),
        _dt(1, 1, [40, 5, 8, 8], 0.99),  # matches only the crowd -> ignored
        _dt(2, 1, [10, 10, 8, 8], 0.95),
        _dt(2, 2, [20, 20, 15, 15], 0.85),
    ]
    stats = run_eval(gt_dict, dts)
    assert stats[0] == pytest.approx(1.0)


def test_localization_quality_thresholds():
    # det shifted so IoU ~ 0.6: counts at IoU .5/.55/.6 only
    gt = {"images": [{"id": 1, "height": 100, "width": 100}],
          "categories": [{"id": 1, "name": "x"}],
          "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                           "bbox": [10, 10, 20, 20], "area": 400,
                           "iscrowd": 0,
                           "segmentation": [[10, 10, 10, 30, 30, 30, 30, 10]]}]}
    dts = [_dt(1, 1, [14, 10, 20, 20], 0.9)]  # IoU = 16*20/(2*400-320)=0.667
    stats = run_eval(gt, dts)
    # thresholds .5,.55,.6,.65 pass (4 of 10) -> AP = 0.4
    assert stats[0] == pytest.approx(0.4, abs=1e-6)
    assert stats[1] == pytest.approx(1.0)  # AP50
