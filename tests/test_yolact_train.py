import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.engine.trainer import (
    YolactTrainer, ckpt_path, parse_ckpt_iter, save_params_npz,
    load_params_npz, yolact_lr_schedule, warmup_multistep_lr)
from tpuseg.models import yolact as Y


def _tiny():
    return Y.YolactConfig(img_size=64, num_classes=4, nms_top_k=8,
                          max_num_detections=5)


def _targets(rng, b, g, proto, sem):
    xy = rng.uniform(0, 0.5, (b, g, 2))
    wh = rng.uniform(0.2, 0.5, (b, g, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    classes = rng.integers(0, 3, (b, g)).astype(np.int32)
    classes[:, g // 2:] = -1  # padding
    return {
        "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes),
        "crowd": jnp.zeros((b, g), bool),
        "masks_proto": jnp.asarray(
            (rng.uniform(size=(b, g, proto, proto)) > 0.5).astype(np.float32)),
        "masks_sem": jnp.asarray(
            (rng.uniform(size=(b, g, sem, sem)) > 0.5).astype(np.float32)),
    }


def test_train_step_runs_and_updates(rng):
    cfg = _tiny()
    # tiny fixed lr: random-init losses are huge (no pretrained backbone),
    # this test checks step mechanics, not convergence
    trainer = YolactTrainer(cfg, lr_fn=lambda it: 1e-7)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    buf = trainer.init_state(params)
    sizes = Y.level_sizes(cfg)
    proto = sizes[0] * 2
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    targets = _targets(rng, 2, 8, proto, sizes[0])
    p0 = params["pred"]["bbox"]["weight"]
    params2, buf2, losses = trainer.train_step(
        params, buf, images, targets, jax.random.PRNGKey(1), 0)
    for k in ("B", "C", "M", "S", "total"):
        v = float(losses[k])
        assert np.isfinite(v), f"loss {k} not finite: {v}"
        assert v >= 0
    assert not np.allclose(np.asarray(params2["pred"]["bbox"]["weight"]),
                           np.asarray(p0))
    # second step with updated params also finite
    _, _, losses2 = trainer.train_step(
        params2, buf2, images, targets, jax.random.PRNGKey(2), 1)
    assert np.isfinite(float(losses2["total"]))


def test_lr_schedules():
    import pytest

    lr = yolact_lr_schedule(base_lr=1e-3, warmup_until=500, warmup_init=1e-4)
    assert float(lr(0)) == pytest.approx(1e-4, rel=1e-5)
    assert float(lr(500)) == pytest.approx(1e-3, rel=1e-5)
    assert float(lr(300000)) == pytest.approx(1e-4, rel=1e-5)  # 1st decay
    d = warmup_multistep_lr(base_lr=0.01, steps=(10, 20), warmup_iters=5)
    assert float(d(0)) == pytest.approx(0.01 / 3, rel=1e-5)
    assert float(d(5)) == pytest.approx(0.01, rel=1e-5)
    assert float(d(15)) == pytest.approx(0.001, rel=1e-5)
    assert float(d(25)) == pytest.approx(0.0001, rel=1e-5)


def test_ckpt_roundtrip_and_naming(tmp_path):
    cfg = _tiny()
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    path = ckpt_path(str(tmp_path), "yolact_tiny", 3, 1234)
    assert path.endswith("yolact_tiny_3_1234.pth")  # reference convention
    assert parse_ckpt_iter(path) == 1234
    path = ckpt_path(str(tmp_path), "yolact_tiny", 3, 1234, fmt="npz")
    assert path.endswith("yolact_tiny_3_1234.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path, params)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dp_sharded_train_step():
    """The multichip path: batch sharded over an 8-device CPU mesh."""
    from tpuseg.parallel.mesh import make_mesh, replicate, shard_batch

    cfg = _tiny()
    trainer = YolactTrainer(cfg)
    mesh = make_mesh(8)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    params = replicate(params, mesh)
    buf = trainer.init_state(params)
    rng = np.random.default_rng(0)
    sizes = Y.level_sizes(cfg)
    proto = sizes[0] * 2
    images = jnp.asarray(rng.standard_normal((8, 64, 64, 3)).astype(np.float32))
    targets = _targets(rng, 8, 8, proto, sizes[0])
    images = shard_batch(images, mesh)
    targets = shard_batch(targets, mesh)
    params2, _, losses = trainer.train_step(
        params, buf, images, targets, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(losses["total"]))
    # params stay replicated (gradient all-reduce happened inside jit)
    shard0 = jax.tree.leaves(params2)[0]
    assert len(shard0.sharding.device_set) == 8


def test_plus_init_has_dcn_conv2_bias():
    """Upstream DCNv2 modules carry a (zero-init, trained) conv bias;
    plain bottleneck conv2 has none. A from-scratch ++ checkpoint saved
    to .pth must contain backbone conv2.bias keys for every deformable
    block or upstream's strict load_state_dict rejects it."""
    import jax
    import jax.numpy as jnp

    from tpuseg.configs.presets import yolact_model_config
    from tpuseg.engine.config import get_config
    from tpuseg.models import yolact as Y
    from tpuseg.weights.yolact_map import to_torch_state

    cfg = yolact_model_config(get_config("yolact_plus_resnet50_config"))
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    flat = to_torch_state(params, cfg)
    bias_keys = [k for k in flat if k.endswith(".conv2.bias")]
    off_keys = [k for k in flat if "conv_offset_mask.weight" in k]
    assert len(off_keys) == 13  # R50 ++ = every block of stages 2-4
    assert len(bias_keys) == len(off_keys), (
        f"{len(bias_keys)} conv2.bias vs {len(off_keys)} deformable blocks")
    for k in bias_keys:
        assert not np.asarray(flat[k]).any()  # zero-init like upstream
