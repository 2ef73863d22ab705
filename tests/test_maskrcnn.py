import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import maskrcnn as M


def test_cell_anchors_match_caffe2_golden():
    # classic generate_anchors(base=16, ratios=[.5,1,2], scales=[8]) values
    got = M._generate_cell_anchors(128, (0.5, 1.0, 2.0), base=16)
    want = np.array([
        [-84, -40, 99, 55],
        [-56, -56, 71, 71],
        [-36, -80, 51, 95],
    ], np.float64)
    np.testing.assert_allclose(got, want)


def test_anchor_grid_counts():
    cfg = M.MaskRCNNConfig()
    anchors = M.make_anchors_np(cfg, 128, 192)
    sizes = [(128 // s) * (192 // s) * 3 for s in cfg.anchor_stride]
    assert [a.shape[0] for a in anchors] == sizes


def test_assign_levels():
    boxes = jnp.asarray([
        [0, 0, 50, 50],       # sqrt(2500)=50 -> lvl 2 (small)
        [0, 0, 224, 224],     # canonical -> lvl 4
        [0, 0, 1000, 1000],   # big -> lvl 5 (clamped)
        [0, 0, 112, 112],     # -> lvl 3
    ], jnp.float32)
    lv = np.asarray(M.assign_levels(boxes))
    assert list(lv) == [0, 2, 3, 1]  # 0-based (P2..P5)


def small_cfg():
    return M.MaskRCNNConfig(
        rpn_pre_nms_top_n=64, rpn_post_nms_top_n=64, fpn_post_nms_top_n=32,
        detections_per_img=8, pre_final_nms_topk=128, num_classes=5)


def test_forward_inference_shapes():
    cfg = small_cfg()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 128, 192, 3))
    hw = jnp.asarray([[100, 150]], jnp.int32)
    out = jax.jit(lambda p, im, hw: M.forward_inference(p, im, hw, cfg))(
        params, images, hw)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["masks"].shape == (1, 8, 28, 28)
    assert out["proposals"].shape == (1, 32, 4)
    m = np.asarray(out["masks"])
    assert np.all(m >= 0) and np.all(m <= 1)
    # boxes clipped to image size
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    if len(b):
        assert b[:, 0::2].max() <= 150 and b[:, 1::2].max() <= 100


def test_detections_respect_image_bounds_via_anchors():
    """Padded-region anchors must not produce proposals: shrink the image
    and check proposals stay inside."""
    cfg = small_cfg()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((1, 128, 192, 3)).astype(np.float32))
    hw = jnp.asarray([[64, 96]], jnp.int32)
    out = M.forward_inference(params, images, hw, cfg)
    props = np.asarray(out["proposals"])[np.asarray(out["proposal_valid"])]
    if len(props):
        assert props[:, 0::2].max() <= 95
        assert props[:, 1::2].max() <= 63


def test_paste_mask_matches_torch_masker(rng):
    import torch
    import torch.nn.functional as F

    from tpuseg.engine.maskrcnn_engine import paste_mask_in_image

    def torch_paste(mask, box, im_h, im_w, thresh=0.5, padding=1):
        mask_t = torch.from_numpy(mask)[None, None]
        padded_mask = F.pad(mask_t, (padding,) * 4)
        m = mask.shape[-1]
        scale = float(m + 2 * padding) / m
        w_half = (box[2] - box[0]) * .5 * scale
        h_half = (box[3] - box[1]) * .5 * scale
        x_c = (box[2] + box[0]) * .5
        y_c = (box[3] + box[1]) * .5
        box_exp = np.array([x_c - w_half, y_c - h_half,
                            x_c + w_half, y_c + h_half]).astype(np.int64)
        TO_REMOVE = 1
        w = max(int(box_exp[2] - box_exp[0] + TO_REMOVE), 1)
        h = max(int(box_exp[3] - box_exp[1] + TO_REMOVE), 1)
        mm = F.interpolate(padded_mask, size=(h, w), mode="bilinear",
                           align_corners=False)[0, 0]
        mm = (mm > thresh).to(torch.uint8)
        im_mask = torch.zeros((im_h, im_w), dtype=torch.uint8)
        x_0 = max(box_exp[0], 0)
        x_1 = min(box_exp[2] + 1, im_w)
        y_0 = max(box_exp[1], 0)
        y_1 = min(box_exp[3] + 1, im_h)
        im_mask[y_0:y_1, x_0:x_1] = mm[
            (y_0 - box_exp[1]):(y_1 - box_exp[1]),
            (x_0 - box_exp[0]):(x_1 - box_exp[0])]
        return im_mask.numpy()

    for _ in range(5):
        mask = rng.uniform(size=(28, 28)).astype(np.float32)
        x1, y1 = rng.uniform(-10, 60, 2)
        bw, bh = rng.uniform(5, 80, 2)
        box = np.array([x1, y1, x1 + bw, y1 + bh], np.float32)
        got = paste_mask_in_image(mask, box, 100, 120)
        want = torch_paste(mask, box, 100, 120)
        # cv2 vs torch bilinear: identical algorithm, allow tiny boundary diff
        assert (got != want).mean() < 0.02


def test_conv_transpose_matches_torch(rng):
    import torch

    from tpuseg.nn.layers import conv_transpose2d

    x = rng.standard_normal((2, 7, 9, 6)).astype(np.float32)
    w = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    want = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        torch.from_numpy(b), stride=2).permute(0, 2, 3, 1).numpy()
    got = np.asarray(conv_transpose2d(
        jnp.asarray(x),
        {"weight": jnp.asarray(w.transpose(2, 3, 0, 1)), "bias": jnp.asarray(b)},
        stride=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weight_mapping_shapes():
    from tpuseg.weights.detectron_map import from_torch_state

    cfg = M.MaskRCNNConfig()
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{suf}"] = rng.standard_normal(c).astype(np.float32)

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

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
    for i, c in enumerate((256, 512, 1024, 2048), 1):
        conv(f"backbone.fpn.fpn_inner{i}", 256, c, 1)
        conv(f"backbone.fpn.fpn_layer{i}", 256, 256, 3)
    conv("rpn.head.conv", 256, 256, 3)
    conv("rpn.head.cls_logits", 3, 256, 1)
    conv("rpn.head.bbox_pred", 12, 256, 1)
    lin("roi_heads.box.feature_extractor.fc6", 1024, 256 * 49)
    lin("roi_heads.box.feature_extractor.fc7", 1024, 1024)
    lin("roi_heads.box.predictor.cls_score", 81, 1024)
    lin("roi_heads.box.predictor.bbox_pred", 324, 1024)
    for i in range(1, 5):
        conv(f"roi_heads.mask.feature_extractor.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask.predictor.conv5_mask.weight"] = rng.standard_normal(
        (256, 256, 2, 2)).astype(np.float32)
    sd["roi_heads.mask.predictor.conv5_mask.bias"] = rng.standard_normal(
        256).astype(np.float32)
    conv("roi_heads.mask.predictor.mask_fcn_logits", 81, 256, 1)

    tree = from_torch_state(sd, cfg)
    init = M.init_params(jax.random.PRNGKey(0), cfg)
    got = {jax.tree_util.keystr(k): v.shape
           for k, v in jax.tree_util.tree_leaves_with_path(tree)}
    want = {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(init)}
    assert got == want


def test_c4_forward_inference_shapes():
    from tpuseg.models import maskrcnn_c4 as C4

    cfg = C4.MaskRCNNC4Config(
        rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32, detections_per_img=8,
        pre_final_nms_topk=64, num_classes=5)
    params = C4.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 128, 192, 3))
    hw = jnp.asarray([[100, 150]], jnp.int32)
    out = jax.jit(lambda p, im, hw: C4.forward_inference(p, im, hw, cfg))(
        params, images, hw)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["masks"].shape == (1, 8, 14, 14)
    anchors = C4.make_anchors_np(cfg, 128, 192)
    assert anchors.shape[0] == (128 // 16) * (192 // 16) * 15


def test_c4_weight_mapping_shapes():
    from tpuseg.models import maskrcnn_c4 as C4

    cfg = C4.MaskRCNNC4Config()
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

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def stage(prefix, nb, cin, mid):
        cout = mid * 4
        for bi in range(nb):
            base = f"{prefix}.{bi}"
            conv(f"{base}.conv1", mid, cin if bi == 0 else cout, 1, bias=False)
            bn(f"{base}.bn1", mid)
            conv(f"{base}.conv2", mid, mid, 3, bias=False)
            bn(f"{base}.bn2", mid)
            conv(f"{base}.conv3", cout, mid, 1, bias=False)
            bn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1, bias=False)
                bn(f"{base}.downsample.1", cout)
        return cout

    conv("backbone.body.stem.conv1", 64, 3, 7, bias=False)
    bn("backbone.body.stem.bn1", 64)
    cin = 64
    for si, nb in enumerate((3, 4, 6)):
        cin = stage(f"backbone.body.layer{si+1}", nb, cin, 64 * 2**si)
    stage("roi_heads.box.feature_extractor.head.layer4", 3, 1024, 512)
    conv("rpn.head.conv", 1024, 1024, 3)
    conv("rpn.head.cls_logits", 15, 1024, 1)
    conv("rpn.head.bbox_pred", 60, 1024, 1)
    lin("roi_heads.box.predictor.cls_score", 81, 2048)
    lin("roi_heads.box.predictor.bbox_pred", 324, 2048)
    sd["roi_heads.mask.predictor.conv5_mask.weight"] = rng.standard_normal(
        (2048, 256, 2, 2)).astype(np.float32)
    sd["roi_heads.mask.predictor.conv5_mask.bias"] = rng.standard_normal(
        256).astype(np.float32)
    conv("roi_heads.mask.predictor.mask_fcn_logits", 81, 256, 1)

    tree = C4.from_torch_state(sd, cfg)
    init = C4.init_params(jax.random.PRNGKey(0), cfg)
    got = {jax.tree_util.keystr(k): v.shape
           for k, v in jax.tree_util.tree_leaves_with_path(tree)}
    want = {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(init)}
    assert got == want


def test_faster_rcnn_boxes_only():
    """MASK_ON False (e2e_faster_rcnn_* family): no mask head anywhere —
    params, inference output, and train losses."""
    from tpuseg.models import maskrcnn_loss as ML

    cfg = M.MaskRCNNConfig(
        rpn_pre_nms_top_n=64, rpn_post_nms_top_n=64, fpn_post_nms_top_n=32,
        rpn_pre_nms_top_n_train=64, fpn_post_nms_top_n_train=32,
        detections_per_img=8, pre_final_nms_topk=128, num_classes=5,
        mask_on=False)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    assert "mask_head" not in params
    images = jnp.zeros((1, 128, 192, 3))
    hw = jnp.asarray([[100, 150]], jnp.int32)
    out = jax.jit(lambda p, im, hw: M.forward_inference(p, im, hw, cfg))(
        params, images, hw)
    assert "masks" not in out
    assert out["boxes"].shape == (1, 8, 4)

    targets = {
        "boxes": jnp.asarray([[[10.0, 10, 60, 60], [0, 0, 0, 0]]]),
        "classes": jnp.asarray([[1, -1]], jnp.int32),
        "mask_crops": jnp.zeros((1, 2, 28, 28)),
    }
    loss_cfg = ML.MaskRCNNLossConfig(
        num_classes=cfg.num_classes, roi_batch_per_image=16)
    losses = jax.jit(
        lambda p: M.forward_train_losses(
            p, images, hw, targets, jax.random.PRNGKey(1), cfg, loss_cfg)
    )(params)
    assert "loss_mask" not in losses
    assert np.isfinite(float(losses["total"]))


def test_faster_rcnn_weight_map_skips_mask_head():
    """A boxes-only checkpoint (no roi_heads.mask.* keys) loads under
    mask_on=False and the shapes match init."""
    from tpuseg.weights.detectron_map import from_torch_state

    cfg = M.MaskRCNNConfig(mask_on=False)
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

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

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
    for i, c in enumerate((256, 512, 1024, 2048), 1):
        conv(f"backbone.fpn.fpn_inner{i}", 256, c, 1)
        conv(f"backbone.fpn.fpn_layer{i}", 256, 256, 3)
    conv("rpn.head.conv", 256, 256, 3)
    conv("rpn.head.cls_logits", 3, 256, 1)
    conv("rpn.head.bbox_pred", 12, 256, 1)
    lin("roi_heads.box.feature_extractor.fc6", 1024, 256 * 49)
    lin("roi_heads.box.feature_extractor.fc7", 1024, 1024)
    lin("roi_heads.box.predictor.cls_score", 81, 1024)
    lin("roi_heads.box.predictor.bbox_pred", 324, 1024)

    tree = from_torch_state(sd, cfg)
    assert "mask_head" not in tree
    init = M.init_params(jax.random.PRNGKey(0), cfg)
    got = {jax.tree_util.keystr(k): v.shape
           for k, v in jax.tree_util.tree_leaves_with_path(tree)}
    want = {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(init)}
    assert got == want


def test_c4_anchor_cell_ratio_major():
    """C4 cell anchors are ratio-major (Caffe2 _ratio_enum then _scale_enum)
    so converted checkpoints' 15 RPN channels pair correctly."""
    from tpuseg.models import maskrcnn_c4 as C4

    cfg = C4.MaskRCNNC4Config()
    anchors = C4.make_anchors_np(cfg, 64, 64)
    cell = anchors[:15].reshape(3, 5, 4)  # [ratio, size, 4]
    w = cell[..., 2] - cell[..., 0] + 1
    h = cell[..., 3] - cell[..., 1] + 1
    # within a ratio row, area scales ~4x per size step
    areas = w * h
    for r in range(3):
        ratios = areas[r, 1:] / areas[r, :-1]
        np.testing.assert_allclose(ratios, 4.0, rtol=0.2)
    # rows ordered by aspect 0.5, 1, 2 (h/w ascending)
    aspect = (h / w)[:, 2]
    assert aspect[0] < aspect[1] < aspect[2]
