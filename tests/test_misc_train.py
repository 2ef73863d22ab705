import numpy as np
import jax
import jax.numpy as jnp


def test_focal_loss_matches_reference(rng):
    """Golden: direct per-class focal loss formula."""
    from tpuseg.ops.losses import sigmoid_focal_loss

    n, c = 16, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    targets = rng.integers(-1, c + 1, n).astype(np.int32)
    got = np.asarray(sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), gamma=2.0, alpha=0.25))
    sig = 1 / (1 + np.exp(-logits))
    want = np.zeros((n, c))
    for i in range(n):
        if targets[i] < 0:
            continue
        for j in range(c):
            t = 1.0 if targets[i] == j + 1 else 0.0
            p = sig[i, j]
            pt = p * t + (1 - p) * (1 - t)
            ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
            a = 0.25 * t + 0.75 * (1 - t)
            want[i, j] = a * ce * (1 - pt) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_trainer_learns_synthetic(rng):
    from tpuseg.engine.vit_train import ViTTrainer
    from tpuseg.nn import vit as V

    cfg = V.ViTConfig(image_size=16, patch_size=8, hidden_size=32,
                      num_layers=2, num_heads=2, mlp_dim=64, num_classes=3)
    params = V.init_params(jax.random.PRNGKey(0), cfg)
    trainer = ViTTrainer(cfg, lr_fn=lambda it: 1e-2)
    buf = trainer.init_state(params)
    # 3 fixed patterns -> labels; must overfit quickly
    imgs = jnp.asarray(rng.standard_normal((3, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2])
    losses = []
    for it in range(60):
        params, buf, m = trainer.train_step(params, buf, imgs, labels, it)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5
    assert float(m["acc"]) == 1.0


def test_pose2seg_trainer_step(rng):
    from tpuseg.models import pose2seg as P2S
    from tpuseg.models.pose2seg_loss import Pose2SegTrainer, warp_gt_to_aligned

    cfg = P2S.Pose2SegConfig(input_size=64, align_size=16, max_people=3,
                             seg_units=2)
    params = P2S.init_params(jax.random.PRNGKey(0), cfg)
    trainer = Pose2SegTrainer(cfg, lr_fn=lambda it: 1e-6)
    buf = trainer.init_state(params)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    theta = jnp.zeros((1, 3, 2, 3)).at[:, :, 0, 0].set(0.5).at[:, :, 1, 1].set(0.5)
    valid = jnp.asarray([[True, True, False]])
    gt_masks = jnp.asarray(
        (rng.uniform(size=(1, 3, 64, 64)) > 0.5).astype(np.float32))
    gt_aligned = warp_gt_to_aligned(gt_masks, theta, cfg.align_size)
    gt_aligned = (gt_aligned > 0.5).astype(jnp.float32)
    assert gt_aligned.shape == (1, 3, 16, 16)
    # cat_skeleton models must be fed skeleton features explicitly
    # (train_step raises on the silent-zeros default)
    import pytest

    with pytest.raises(ValueError):
        trainer.train_step(params, buf, images, theta, valid, gt_aligned, 0)
    skel = jnp.zeros((1, 3, cfg.align_size, cfg.align_size,
                      cfg.skeleton_channels))
    p2, b2, loss = trainer.train_step(
        params, buf, images, theta, valid, gt_aligned, 0, skel=skel)
    assert np.isfinite(float(loss)) and float(loss) > 0
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)))
    assert changed


def test_dataset_catalog():
    from tpuseg.data.catalog import DatasetCatalog

    d = DatasetCatalog.get("coco_2017_val")
    assert d["args"]["ann_file"].endswith("instances_val2017.json")
    DatasetCatalog.register("my_set", "imgs", "ann.json")
    assert DatasetCatalog.get("my_set")["args"]["root"].endswith("imgs")
    import pytest

    with pytest.raises(KeyError):
        DatasetCatalog.get("nope")
