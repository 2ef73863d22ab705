import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import yolov3 as Y
from tpuseg.models import yolov3_loss as YL


def small_cfg():
    return Y.YoloV3Config(num_classes=4, input_size=128)


def test_build_targets_places_gt():
    cfg = small_cfg()
    level_hw = [(4, 4), (8, 8), (16, 16)]
    # one gt: 100x90 px box centered at (64, 64) -> best anchor from wh IoU
    gt = jnp.asarray([[14, 19, 114, 109], [0, 0, 0, 0]], jnp.float32)
    cls = jnp.asarray([2, -1], jnp.int32)
    tgt = YL.build_targets(gt, cls, level_hw, cfg)
    total_assigned = sum(float(t[0].sum()) for t in tgt)
    assert total_assigned == 1.0  # exactly one cell assigned, pad dropped
    # the assigned cell is at the gt center on the chosen level
    for li, (tconf, txywh, tcls) in enumerate(tgt):
        if float(tconf.sum()) > 0:
            n = int(jnp.argmax(tconf))
            h, w = level_hw[li]
            cell = n // 3
            cj, ci = cell // w, cell % w
            stride = Y.STRIDES[li]
            assert ci == int(64 / stride) and cj == int(64 / stride)
            assert int(tcls[n]) == 2


def test_total_loss_finite_and_grads(rng):
    cfg = small_cfg()
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((2, 128, 128, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(10, 60, (2, 5, 4)).astype(np.float32))
    gt = gt.at[..., 2:].set(gt[..., :2] + 40)
    cls = jnp.asarray(rng.integers(0, 4, (2, 5)).astype(np.int32))
    cls = cls.at[:, 3:].set(-1)

    def loss_fn(p):
        outs = Y.forward(p, images, cfg)
        return YL.total_loss(outs, gt, cls, cfg)["total"]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_perfect_prediction_low_loss():
    """Head outputs decoded exactly onto targets -> coord/cls losses ~ 0."""
    cfg = small_cfg()
    level_hw = [(4, 4), (8, 8), (16, 16)]
    gt = jnp.asarray([[14, 19, 114, 109]], jnp.float32)
    cls = jnp.asarray([1], jnp.int32)
    tgt = YL.build_targets(gt, cls, level_hw, cfg)
    outs = []
    for li, (h, w) in enumerate(level_hw):
        tconf, txywh, tcls = tgt[li]
        o = np.zeros((h * w * 3, 5 + cfg.num_classes), np.float32)
        obj = np.asarray(tconf) > 0.5
        # logits: sigmoid(x) = t -> x = logit(t); clamp for stability
        t = np.clip(np.asarray(txywh[:, :2]), 1e-4, 1 - 1e-4)
        o[:, 0:2] = np.where(obj[:, None], np.log(t / (1 - t)), 0)
        o[:, 2:4] = np.where(obj[:, None], np.asarray(txywh[:, 2:4]), 0)
        o[:, 4] = np.where(obj, 15.0, -15.0)
        onehot = np.eye(cfg.num_classes)[np.asarray(tcls)]
        o[:, 5:] = np.where(obj[:, None], np.where(onehot > 0, 15.0, -15.0), -15.0)
        outs.append(jnp.asarray(o.reshape(1, h, w, -1)))
    losses = YL.total_loss(outs, gt[None], cls[None], cfg)
    assert float(losses["xy"]) < 1e-4
    assert float(losses["wh"]) < 1e-4
    assert float(losses["cls"]) < 1e-4
    assert float(losses["obj"]) < 1e-4
    assert float(losses["total"]) < 0.1
