import math

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import yolact as Y


def test_priors_match_upstream_semantics():
    cfg = Y.YolactConfig()
    priors = Y.make_priors_np(cfg)
    assert priors.shape == (19248, 4)  # known count for 550 input
    # golden re-derivation (upstream make_priors loop)
    sizes = Y.level_sizes(cfg)
    assert sizes == (69, 35, 18, 9, 5)
    want = []
    for hw, scale in zip(sizes, cfg.scales):
        for j in range(hw):
            for i in range(hw):
                for ar in (1.0, 0.5, 2.0):
                    ars = math.sqrt(ar)
                    w = scale * ars / 550
                    want.append([(i + 0.5) / hw, (j + 0.5) / hw, w, w])
    np.testing.assert_allclose(priors, np.asarray(want, np.float32), rtol=1e-6)


def small_cfg():
    return Y.YolactConfig(img_size=128, num_classes=5, nms_top_k=16,
                          max_num_detections=10)


def test_forward_and_detect_shapes():
    cfg = small_cfg()
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    priors = jnp.asarray(Y.make_priors_np(cfg))
    imgs = jnp.zeros((1, 128, 128, 3), jnp.uint8)
    dets = jax.jit(lambda p, im: Y.full_pipeline(p, priors, im, cfg))(params, imgs)
    n_priors = priors.shape[0]
    s = Y.level_sizes(cfg)
    assert n_priors == 3 * sum(x * x for x in s)
    proto_hw = s[0] * 2
    assert dets["boxes"].shape == (1, 10, 4)
    assert dets["masks"].shape == (1, 10, proto_hw, proto_hw)
    assert dets["scores"].shape == (1, 10)
    m = np.asarray(dets["masks"])
    assert np.all(m >= 0) and np.all(m <= 1)


def test_crop_masks_matches_numpy(rng):
    s, k = 16, 5
    masks = rng.uniform(size=(s, s, k)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0, 0.5, k), rng.uniform(0, 0.5, k),
        rng.uniform(0.5, 1.0, k), rng.uniform(0.5, 1.0, k)], -1).astype(np.float32)
    got = np.asarray(Y._crop_masks(jnp.asarray(masks), jnp.asarray(boxes)))
    want = masks.copy()
    for i in range(k):
        x1 = max(boxes[i, 0] * s - 1, 0)
        x2 = min(boxes[i, 2] * s + 1, s)
        y1 = max(boxes[i, 1] * s - 1, 0)
        y2 = min(boxes[i, 3] * s + 1, s)
        rr = np.arange(s)[:, None]
        cc = np.arange(s)[None, :]
        inside = (rr >= y1) & (rr < y2) & (cc >= x1) & (cc < x2)
        want[:, :, i] = np.where(inside, masks[:, :, i], 0)
    np.testing.assert_allclose(got, want)


def _synth_state_dict(cfg, plus=False):
    """Random dbolya-named state dict with correct shapes.

    plus=True emits the YOLACT++ extras: DCN conv2 (weight+bias on the DCN
    module, offsets under conv2.conv_offset_mask) in stages 2-4 every 3rd
    block, and the FastMaskIoUNet sequential."""
    rng = np.random.default_rng(7)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def conv_nobias(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)

    def bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            arr = rng.uniform(0.5, 1.5, c).astype(np.float32)
            sd[f"{name}.{suf}"] = arr
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    conv_nobias("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    for si, nb in enumerate(blocks):
        mid = 64 * 2**si
        cout = mid * 4
        for bi in range(nb):
            base = f"backbone.layers.{si}.{bi}"
            conv_nobias(f"{base}.conv1", mid, cin if bi == 0 else cout, 1)
            bn(f"{base}.bn1", mid)
            if plus and si in (1, 2, 3) and bi % 3 == 0:
                # DCNv2 module: deformable weight+bias live on conv2 itself,
                # the offset/mask conv under conv2.conv_offset_mask
                conv(f"{base}.conv2", mid, mid, 3)
                conv(f"{base}.conv2.conv_offset_mask", 27, mid, 3)
            else:
                conv_nobias(f"{base}.conv2", mid, mid, 3)
            bn(f"{base}.bn2", mid)
            conv_nobias(f"{base}.conv3", cout, mid, 1)
            bn(f"{base}.bn3", cout)
            if bi == 0:
                conv_nobias(f"{base}.downsample.0", cout, cin, 1)
                bn(f"{base}.downsample.1", cout)
        cin = cout
    if plus:
        cdims = ((8, 1), (16, 8), (32, 16), (64, 32), (128, 64))
        for i, (co, ci) in enumerate(cdims):
            conv(f"maskiou_net.maskiou_net.{2 * i}", co, ci, 3)
        conv("maskiou_net.maskiou_net.10", cfg.num_classes - 1, 128, 1)
    for i, c in enumerate((2048, 1024, 512)):  # lat_layers reversed
        conv(f"fpn.lat_layers.{i}", 256, c, 1)
    for i in range(3):
        conv(f"fpn.pred_layers.{i}", 256, 256, 3)
    for i in range(2):
        conv(f"fpn.downsample_layers.{i}", 256, 256, 3)
    for idx, (cout, cin, k) in zip(
        (0, 2, 4, 8, 10),
        ((256, 256, 3), (256, 256, 3), (256, 256, 3), (256, 256, 3),
         (cfg.mask_dim, 256, 1)),
    ):
        conv(f"proto_net.{idx}", *((cout, cin, k)))
    conv("prediction_layers.0.upfeature.0", 256, 256, 3)
    na = cfg.num_anchors
    conv("prediction_layers.0.bbox_layer", na * 4, 256, 3)
    conv("prediction_layers.0.conf_layer", na * cfg.num_classes, 256, 3)
    conv("prediction_layers.0.mask_layer", na * cfg.mask_dim, 256, 3)
    conv("semantic_seg_conv", cfg.num_classes - 1, 256, 1)
    return sd


def test_weight_mapping_shapes():
    from tpuseg.weights.yolact_map import from_torch_state

    cfg = Y.YolactConfig()  # resnet50 base
    sd = _synth_state_dict(cfg)
    tree = from_torch_state(sd, cfg)
    init = Y.init_params(jax.random.PRNGKey(0), cfg)

    flat_got = jax.tree_util.tree_leaves_with_path(tree)
    flat_want = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_leaves_with_path(init)}
    for path, leaf in flat_got:
        key = jax.tree_util.keystr(path)
        assert key in flat_want, f"unexpected leaf {key}"
        assert tuple(leaf.shape) == tuple(flat_want[key]), (
            f"{key}: {leaf.shape} vs {flat_want[key]}")
    # every init leaf except 'semantic' bias (reference has bias; ours too)
    got_keys = {jax.tree_util.keystr(p) for p, _ in flat_got}
    missing = set(flat_want) - got_keys
    assert not missing, f"unmapped leaves: {missing}"


def test_yolact_plus_pipeline():
    """YOLACT++ variant: 9 anchors/position, DCN backbone, maskiou rescoring."""
    from tpuseg.configs.presets import yolact_model_config
    from tpuseg.engine.config import get_config

    preset = get_config("yolact_plus_base_config")
    full = yolact_model_config(preset)
    assert full.num_anchors == 9
    assert not full.use_square_anchors
    # tiny version for the smoke forward
    cfg = Y.YolactConfig(
        img_size=128, num_classes=5, nms_top_k=8, max_num_detections=5,
        scales=tuple(tuple(s * x / 550 for x in (1, 1.26, 1.587))
                     for s in (24, 48, 96, 192, 384)),
        use_square_anchors=False, dcn_backbone=True, use_maskiou=True)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    assert params["backbone"]["layer2"][0]["conv2_offset"] is not None
    assert params["backbone"]["layer1"][0]["conv2_offset"] is None
    priors = jnp.asarray(Y.make_priors_np(cfg))
    s = Y.level_sizes(cfg)
    assert priors.shape[0] == 9 * sum(x * x for x in s)
    imgs = jnp.zeros((1, 128, 128, 3), jnp.uint8)
    dets = jax.jit(lambda p, im: Y.full_pipeline(p, priors, im, cfg))(params, imgs)
    assert "mask_scores" in dets
    assert dets["mask_scores"].shape == (1, 5)


def test_traditional_nms_variant():
    cfg = Y.YolactConfig(img_size=128, num_classes=5, nms_top_k=16,
                         max_num_detections=10, use_fast_nms=False)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    priors = jnp.asarray(Y.make_priors_np(cfg))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (1, 128, 128, 3), np.uint8))
    dets = jax.jit(lambda p, im: Y.full_pipeline(p, priors, im, cfg))(params, imgs)
    assert dets["boxes"].shape == (1, 10, 4)
    # kept non-degenerate boxes of the same class are mutually below the
    # IoU threshold (random weights emit some zero-area boxes -> NaN IoU)
    v = np.asarray(dets["valid"])[0]
    bx = np.asarray(dets["boxes"])[0][v]
    cl = np.asarray(dets["classes"])[0][v]
    area = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
    bx, cl = bx[area > 1e-6], cl[area > 1e-6]
    from tpuseg.core import boxes as B
    if len(bx) > 1:
        iou = np.asarray(B.iou_matrix(jnp.asarray(bx), jnp.asarray(bx)))
        same = cl[:, None] == cl[None, :]
        np.fill_diagonal(same, False)
        assert (iou[same] <= cfg.nms_iou_thresh + 1e-6).all()



def test_yolact_plus_weight_mapping_roundtrip():
    """A ++-shaped checkpoint (DCN offset convs + maskiou net) must load
    fully and drive the ++ pipeline (VERDICT r1 #8)."""
    from tpuseg.weights.yolact_map import from_torch_state

    cfg = Y.YolactConfig(
        backbone="resnet50", dcn_backbone=True, use_maskiou=True,
        img_size=128, num_classes=5, nms_top_k=8, max_num_detections=5,
        scales=tuple(tuple(s * x / 550 for x in (1, 1.26, 1.587))
                     for s in (24, 48, 96, 192, 384)),
        use_square_anchors=False)
    sd = _synth_state_dict(cfg, plus=True)
    tree = from_torch_state(sd, cfg)

    # DCN offsets landed where the interval rule puts them (OIHW -> HWIO)
    off = tree["backbone"]["layer2"][0]["conv2_offset"]
    assert off is not None
    np.testing.assert_allclose(
        off["weight"],
        sd["backbone.layers.1.0.conv2.conv_offset_mask.weight"].transpose(
            2, 3, 1, 0))
    np.testing.assert_allclose(
        off["bias"], sd["backbone.layers.1.0.conv2.conv_offset_mask.bias"])
    assert tree["backbone"]["layer2"][1]["conv2_offset"] is None
    assert tree["backbone"]["layer1"][0]["conv2_offset"] is None
    assert tree["backbone"]["layer3"][3]["conv2_offset"] is not None
    # deformable conv2 carries the DCN module's own weight + bias
    np.testing.assert_allclose(
        tree["backbone"]["layer2"][0]["conv2"]["weight"],
        sd["backbone.layers.1.0.conv2.weight"].transpose(2, 3, 1, 0))
    assert tree["backbone"]["layer2"][0]["conv2"]["bias"] is not None
    # maskiou net mapped
    assert "maskiou" in tree
    np.testing.assert_allclose(
        tree["maskiou"]["conv2"]["weight"],
        sd["maskiou_net.maskiou_net.4.weight"].transpose(2, 3, 1, 0))
    assert tree["maskiou"]["conv_last"]["weight"].shape == (
        1, 1, 128, cfg.num_classes - 1)

    # the loaded tree drives the ++ pipeline end to end
    priors = jnp.asarray(Y.make_priors_np(cfg))
    imgs = jnp.zeros((1, 128, 128, 3), jnp.uint8)
    tree = jax.tree.map(jnp.asarray, tree)
    dets = jax.jit(lambda p, im: Y.full_pipeline(p, priors, im, cfg))(tree, imgs)
    assert "mask_scores" in dets


def test_yolact_preset_family_builds():
    """Every registered yolact_* preset maps onto a YolactConfig with
    consistent priors (the upstream data/config.py family incl. im400/700)."""
    from tpuseg.configs.presets import yolact_model_config
    from tpuseg.engine.config import get_config
    from tpuseg.models.yolact import make_priors_np

    for name, size in [("yolact_base_config", 550),
                       ("yolact_resnet50_config", 550),
                       ("yolact_darknet53_config", 550),
                       ("yolact_im400_config", 400),
                       ("yolact_im700_config", 700),
                       ("yolact_plus_base_config", 550),
                       ("yolact_plus_resnet50_config", 550)]:
        cfg = yolact_model_config(get_config(name))
        assert cfg.img_size == size, name
        priors = make_priors_np(cfg)
        assert priors.shape[1] == 4 and len(priors) > 1000, name


def test_plus_priors_scale_major_order():
    """yolact++ multi-sub-scale priors are SCALE-major per cell (upstream
    make_priors: for scale in scales: for ar in ars) so the 9 head channel
    groups pair with the right priors."""
    from tpuseg.configs.presets import yolact_model_config
    from tpuseg.engine.config import get_config

    cfg = yolact_model_config(get_config("yolact_plus_base_config"))
    assert cfg.num_anchors == 9
    priors = Y.make_priors_np(cfg)
    cell = priors[:9]  # first position of P3
    w, h = cell[:, 2], cell[:, 3]
    # within one scale group of 3, ratios vary (w != const); across groups
    # the scale rises by 2^(1/3)
    g = (w * h).reshape(3, 3)  # [scale, ratio]
    for s in range(3):
        np.testing.assert_allclose(g[s], g[s, 0], rtol=1e-5)  # area = s^2
    np.testing.assert_allclose(g[1, 0] / g[0, 0], 2 ** (2 / 3), rtol=1e-4)
    np.testing.assert_allclose(g[2, 0] / g[0, 0], 2 ** (4 / 3), rtol=1e-4)
    # ratio order within a group: ar = 1, 0.5, 2 -> w/h = 1, ~0.5, ~2
    np.testing.assert_allclose((w / h)[:3], [1.0, 0.5, 2.0], rtol=1e-5)


def test_maskiou_net_matches_torch_semantics(rng):
    """FastMaskIoUNet math golden: conv stack (s2, relu) -> 1x1 conv to
    classes + relu -> SPATIAL max pool (include_last_relu=True)."""
    import torch
    import torch.nn.functional as F

    import jax

    cfg = Y.YolactConfig(num_classes=5, use_maskiou=True)
    chans = (1, 8, 16, 32, 64, 128)
    params = {}
    tws = []
    for i in range(5):
        w = rng.standard_normal(
            (chans[i + 1], chans[i], 3, 3)).astype(np.float32) * 0.1
        b = rng.standard_normal(chans[i + 1]).astype(np.float32) * 0.1
        params[f"conv{i}"] = {
            "weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b)}
        tws.append((torch.from_numpy(w), torch.from_numpy(b)))
    wl = rng.standard_normal((4, 128, 1, 1)).astype(np.float32) * 0.1
    bl = rng.standard_normal(4).astype(np.float32) * 0.1
    params["conv_last"] = {"weight": jnp.asarray(wl.transpose(2, 3, 1, 0)),
                           "bias": jnp.asarray(bl)}

    masks = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    got = np.asarray(Y.maskiou_net(params, jnp.asarray(masks), cfg))

    x = torch.from_numpy(masks)[:, None]
    with torch.no_grad():
        for w, b in tws:
            x = F.relu(F.conv2d(x, w, b, stride=2, padding=1))
        x = F.relu(F.conv2d(x, torch.from_numpy(wl), torch.from_numpy(bl)))
        want = F.max_pool2d(x, kernel_size=x.shape[2:]).squeeze(-1).squeeze(
            -1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prior_topk_two_stage_exact(rng):
    """prior_topk two-stage candidate selection equals the one-stage path
    whenever <= prior_topk priors pass conf_thresh (the trained-weights
    regime — the bench/serving fast path must be detection-identical)."""
    cfg = small_cfg()
    priors = jnp.asarray(Y.make_priors_np(cfg))
    n = priors.shape[0]
    nc = cfg.num_classes
    # sparse realistic confs: ~40 peaked priors, the rest ~uniform
    # background (softmax max well below conf_thresh after bg margin)
    conf = rng.standard_normal((1, n, nc)).astype(np.float32) * 0.01
    conf[..., 0] += 6.0  # strong background everywhere
    hot = rng.choice(n, 40, replace=False)
    for i in hot:
        conf[0, i, 1 + rng.integers(0, nc - 1)] += 9.0 + rng.uniform(0, 3)
    preds = {
        "loc": jnp.asarray(rng.standard_normal((1, n, 4)).astype(np.float32) * 0.3),
        "conf": jnp.asarray(conf),
        "coeff": jnp.asarray(rng.standard_normal(
            (1, n, cfg.mask_dim)).astype(np.float32)),
        "proto": jnp.asarray(rng.standard_normal(
            (1, cfg.proto_size, cfg.proto_size, cfg.mask_dim)).astype(np.float32)),
    }
    base = jax.jit(lambda p: Y.detect(p, priors, cfg))(preds)
    cfg2 = Y.YolactConfig(**{**cfg.__dict__, "prior_topk": 128})
    fast = jax.jit(lambda p: Y.detect(p, priors, cfg2))(preds)
    v1, v2 = np.asarray(base["valid"][0]), np.asarray(fast["valid"][0])
    np.testing.assert_array_equal(v1, v2)
    for k in ("boxes", "scores", "classes", "masks"):
        np.testing.assert_allclose(np.asarray(base[k][0])[v1],
                                   np.asarray(fast[k][0])[v2],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # oversubscribed regime (every prior survives): stays well-formed and
    # keeps the highest-max-score priors
    cfgo = Y.YolactConfig(**{**cfg.__dict__, "prior_topk": 64,
                             "conf_thresh": -1.0})
    out = jax.jit(lambda p: Y.detect(p, priors, cfgo))(preds)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_prior_topk_two_stage_traditional_nms(rng):
    """Two-stage compaction must also be exact under use_fast_nms=False
    (the reference's traditional per-class greedy NMS path)."""
    cfg0 = small_cfg()
    cfg = Y.YolactConfig(**{**cfg0.__dict__, "use_fast_nms": False})
    priors = jnp.asarray(Y.make_priors_np(cfg))
    n = priors.shape[0]
    nc = cfg.num_classes
    conf = rng.standard_normal((1, n, nc)).astype(np.float32) * 0.01
    conf[..., 0] += 6.0
    hot = rng.choice(n, 30, replace=False)
    for i in hot:
        conf[0, i, 1 + rng.integers(0, nc - 1)] += 9.0 + rng.uniform(0, 3)
    preds = {
        "loc": jnp.asarray(rng.standard_normal((1, n, 4)).astype(np.float32) * 0.3),
        "conf": jnp.asarray(conf),
        "coeff": jnp.asarray(rng.standard_normal(
            (1, n, cfg.mask_dim)).astype(np.float32)),
        "proto": jnp.asarray(rng.standard_normal(
            (1, cfg.proto_size, cfg.proto_size, cfg.mask_dim)).astype(np.float32)),
    }
    base = jax.jit(lambda p: Y.detect(p, priors, cfg))(preds)
    cfg2 = Y.YolactConfig(**{**cfg.__dict__, "prior_topk": 128})
    fast = jax.jit(lambda p: Y.detect(p, priors, cfg2))(preds)
    v1, v2 = np.asarray(base["valid"][0]), np.asarray(fast["valid"][0])
    np.testing.assert_array_equal(v1, v2)
    for k in ("boxes", "scores", "classes", "masks"):
        np.testing.assert_allclose(np.asarray(base[k][0])[v1],
                                   np.asarray(fast[k][0])[v2],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
