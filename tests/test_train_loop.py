import numpy as np

from tests.test_yolact_engine import _write_synth_dataset
from tpuseg.data.coco_dataset import CocoDetectionDataset
from tpuseg.models import yolact as Y


def test_yolact_train_loop_smoke(tmp_path):
    from tpuseg.engine.yolact_train_loop import train

    img_dir, ann = _write_synth_dataset(str(tmp_path))
    ds = CocoDetectionDataset(img_dir, ann, label_map={1: 1, 2: 2})
    cfg = Y.YolactConfig(img_size=64, num_classes=3, nms_top_k=8,
                         max_num_detections=5)
    params, it = train(
        ds, cfg, batch_size=2, max_iter=10, save_every=2,
        save_folder=str(tmp_path / "w"), cfg_name="yolact_tiny",
        lr_fn=lambda i: 1e-7, use_mesh=False, max_steps=3, log_every=1)
    assert it == 3
    import os

    saved = os.listdir(str(tmp_path / "w"))
    assert any(f.startswith("yolact_tiny_") for f in saved)


def test_ssd_augment_shapes(rng):
    from tpuseg.data.augment import AugmentConfig, ssd_augment

    img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    boxes = np.asarray([[10, 10, 60, 80], [50, 20, 150, 110]], np.float32)
    classes = np.asarray([0, 1], np.int32)
    masks = np.zeros((2, 120, 160), np.uint8)
    masks[0, 10:80, 10:60] = 1
    masks[1, 20:110, 50:150] = 1
    cfg = AugmentConfig(size=64)
    for seed in range(5):
        r = np.random.default_rng(seed)
        aimg, aboxes, aclasses, amasks = ssd_augment(
            r, img, boxes, classes, masks, cfg)
        assert aimg.shape == (64, 64, 3)
        assert len(aboxes) == len(aclasses) == len(amasks)
        assert len(aboxes) >= 1
        assert np.all(aboxes >= -1e-5) and np.all(aboxes <= 1 + 1e-5)
        assert amasks.shape[1:] == (64, 64)


def test_timer_and_logging(tmp_path, capsys):
    from tpuseg.utils import timer
    from tpuseg.utils.logging import Log, MovingAverage, ProgressBar

    timer.reset()
    with timer.env("stage_a"):
        sum(range(1000))
    with timer.env("stage_a"):
        pass
    out = timer.print_stats()
    assert "stage_a" in out

    ma = MovingAverage(3)
    for v in (1.0, 2.0, 3.0, 4.0):
        ma.add(v)
    assert ma.get_avg() == 3.0
    ma.add(float("nan"))
    assert ma.get_avg() == 3.0  # NaN skipped

    pb = ProgressBar(10, 100)
    pb.set_val(50)
    assert repr(pb).count("█") == 5

    log = Log("test", log_dir=str(tmp_path))
    log.log("train", loss=1.5, iter=10)
    import json

    with open(log.path) as f:
        entry = json.loads(f.readline())
    assert entry["type"] == "train" and entry["data"]["loss"] == 1.5
