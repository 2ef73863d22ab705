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


def test_mixed_precision_train_step_matches_f32(rng):
    """compute_dtype=bf16 (f32 master params, bf16 forward/backward) must
    produce per-loss values near the f32 step and finite f32 updates."""
    import jax
    import jax.numpy as jnp

    from tpuseg.engine.trainer import YolactTrainer

    cfg = Y.YolactConfig(img_size=64, num_classes=3, nms_top_k=8,
                         max_num_detections=5)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    g = 4
    xy = rng.uniform(0.05, 0.5, (2, g, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (2, g, 2)).astype(np.float32)
    classes = rng.integers(0, 2, (2, g)).astype(np.int32)
    classes[:, g // 2:] = -1
    sizes = Y.level_sizes(cfg)
    proto = sizes[0] * 2
    sem = sizes[0]
    targets = {
        "boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        "classes": jnp.asarray(classes),
        "crowd": jnp.asarray(np.zeros((2, g), bool)),
        "masks_proto": jnp.asarray(
            (rng.uniform(size=(2, g, proto, proto)) > 0.5).astype(np.float32)),
        "masks_sem": jnp.asarray(
            (rng.uniform(size=(2, g, sem, sem)) > 0.5).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)
    out = {}
    for name, cdt in [("f32", None), ("bf16", jnp.bfloat16)]:
        # freeze_bn: batch-stat BN at random init amplifies bf16 rounding
        # of the batch statistics into O(10%) loss shifts; this test
        # isolates the mixed-precision cast itself (train-mode BN parity
        # is covered by tests/test_bn_train.py against torch)
        tr = YolactTrainer(cfg, lr_fn=lambda i: 1e-3, compute_dtype=cdt,
                           freeze_bn=True)
        buf = tr.init_state(params)
        p2, b2, losses = tr.train_step(params, buf, images, targets, key, 0)
        # master params and their updates stay f32
        assert all(jnp.asarray(x).dtype != jnp.bfloat16
                   for x in jax.tree.leaves(p2))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(p2))
        out[name] = {k: float(v) for k, v in losses.items()}
    for k in out["f32"]:
        a, b = out["f32"][k], out["bf16"][k]
        assert abs(a - b) <= 0.08 * max(abs(a), 1e-3), (k, a, b)
