"""RetinaNet: anchors, inference shapes, loss sanity, weight mapping."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import retinanet as RN


def small_cfg():
    return RN.RetinaNetConfig(
        pre_nms_top_n=32, detections_per_img=8, num_classes=5)


def test_anchor_counts_and_octaves():
    cfg = RN.RetinaNetConfig()
    anchors = RN.make_anchors_np(cfg, 128, 256)
    assert len(anchors) == 5
    for li, (an, stride) in enumerate(zip(anchors, cfg.anchor_stride)):
        hl, wl = RN.M.fpn_level_hw(128, 256, stride)
        assert an.shape == (hl * wl * 9, 4)
    # first cell of P3: 9 anchors, RATIO-MAJOR order (upstream _ratio_enum
    # then _scale_enum): index r*3+s -> ratio r, octave scale s
    cell = anchors[0][:9]
    w = cell[:, 2] - cell[:, 0] + 1
    h = cell[:, 3] - cell[:, 1] + 1
    areas = (w * h).reshape(3, 3)  # [ratio, octave]
    for r in range(3):
        np.testing.assert_allclose(
            areas[r, 1] / areas[r, 0], 2 ** (2 / 3), rtol=0.1)
        np.testing.assert_allclose(
            areas[r, 2] / areas[r, 0], 2 ** (4 / 3), rtol=0.1)
    ratio = (h / w).reshape(3, 3)  # aspect constant within a ratio row
    np.testing.assert_allclose(ratio[0], ratio[0, 0], rtol=0.15)
    assert ratio[0, 0] < ratio[1, 0] < ratio[2, 0]  # 0.5, 1.0, 2.0


def test_forward_inference_shapes():
    cfg = small_cfg()
    params = RN.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 128, 192, 3))
    hw = jnp.asarray([[100, 150]], jnp.int32)
    out = jax.jit(lambda p, im, hw: RN.forward_inference(p, im, hw, cfg))(
        params, images, hw)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["scores"].shape == (1, 8)
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    if len(b):
        assert b[:, 0::2].max() <= 150 and b[:, 1::2].max() <= 100


def test_prior_prob_bias_init():
    """cls_logits bias makes initial fg probability ~ prior_prob (0.01) so
    the focal loss doesn't explode at step 0 (upstream head init)."""
    cfg = small_cfg()
    params = RN.init_params(jax.random.PRNGKey(0), cfg)
    p = jax.nn.sigmoid(params["cls_logits"]["bias"][0])
    np.testing.assert_allclose(float(p), cfg.prior_prob, rtol=1e-5)


def test_train_losses_finite_and_decrease_on_perfect_match():
    cfg = small_cfg()
    params = RN.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    targets = {
        "boxes": jnp.asarray([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
        "classes": jnp.asarray([[2, -1]], jnp.int32),
    }
    losses = jax.jit(
        lambda p: RN.forward_train_losses(p, images, hw, targets, cfg))(
        params)
    assert np.isfinite(float(losses["total"]))
    assert float(losses["loss_retina_cls"]) > 0
    # gradients flow to both towers
    grads = jax.grad(
        lambda p: RN.forward_train_losses(
            p, images, hw, targets, cfg)["total"])(params)
    gnorm = jnp.sqrt(sum(
        jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_weight_mapping_shapes():
    cfg = RN.RetinaNetConfig()
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{suf}"] = rng.standard_normal(c).astype(np.float32)

    conv("backbone.body.stem.conv1", 64, 3, 7, bias=False)
    bn("backbone.body.stem.bn1", 64)
    cin = 64
    for si, nb in enumerate((3, 4, 6, 3)):
        mid = 64 * 2**si
        cout = mid * 4
        for bi in range(nb):
            base = f"backbone.body.layer{si+1}.{bi}"
            conv(f"{base}.conv1", mid, cin if bi == 0 else cout, 1, bias=False)
            bn(f"{base}.bn1", mid)
            conv(f"{base}.conv2", mid, mid, 3, bias=False)
            bn(f"{base}.bn2", mid)
            conv(f"{base}.conv3", cout, mid, 1, bias=False)
            bn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1, bias=False)
                bn(f"{base}.downsample.1", cout)
        cin = cout
    for i, c in zip((2, 3, 4), (512, 1024, 2048)):
        conv(f"backbone.fpn.fpn_inner{i}", 256, c, 1)
        conv(f"backbone.fpn.fpn_layer{i}", 256, 256, 3)
    conv("backbone.fpn.top_blocks.p6", 256, 2048, 3)
    conv("backbone.fpn.top_blocks.p7", 256, 256, 3)
    for i in (0, 2, 4, 6):
        conv(f"rpn.head.cls_tower.{i}", 256, 256, 3)
        conv(f"rpn.head.bbox_tower.{i}", 256, 256, 3)
    conv("rpn.head.cls_logits", 9 * 80, 256, 3)
    conv("rpn.head.bbox_pred", 9 * 4, 256, 3)

    tree = RN.from_torch_state(sd, cfg)
    init = RN.init_params(jax.random.PRNGKey(0), cfg)
    got = {jax.tree_util.keystr(k): v.shape
           for k, v in jax.tree_util.tree_leaves_with_path(tree)}
    want = {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(init)}
    assert got == want
