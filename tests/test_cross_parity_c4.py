"""End-to-end cross-implementation parity for the C4 variant (the config the
reference README demos first: e2e_mask_rcnn_R_50_C4, README.md:263-284, 314).

An INDEPENDENT torch reimplementation of the maskrcnn-benchmark C4
inference path (FrozenBN ResNet stem+layer1-3 -> single-level RPN ->
ADAPTIVE-ratio RoIAlign 14x14 (sampling_ratio=0, the upstream default the
C4 configs inherit) -> res5 box/mask heads) runs the same random-weight
checkpoint as our jit pipeline, loaded through save_torch_file ->
load_detectron_weights(variant="c4"). This closes PARITY caveat 1 with a
detection-for-detection assert (VERDICT r2 next-round #1).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpuseg.models import maskrcnn_c4 as C4
from tests.test_cross_parity import (_t, t_bottleneck, t_clip, t_conv,
                                     t_decode, t_fbn, t_nms)

CANVAS = (224, 320)
NC = 9


def _synth_state(rng):
    sd = {}

    def conv(name, co, ci, k, bias=True, scale=None):
        fan = ci * k * k
        sd[f"{name}.weight"] = (rng.standard_normal((co, ci, k, k)) *
                                (scale or fan ** -0.5)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = (rng.standard_normal(co) * 0.02).astype(
                np.float32)

    def fbn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.7, 1.3, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.7, 1.3, c).astype(np.float32)

    def linear(name, co, ci, scale=1.0):
        sd[f"{name}.weight"] = (rng.standard_normal((co, ci)) *
                                ci ** -0.5 * scale).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(co) * 0.02).astype(
            np.float32)

    def stage(prefix, nb, cin, mid):
        cout = mid * 4
        for bi in range(nb):
            base = f"{prefix}.{bi}"
            conv(f"{base}.conv1", mid, cin if bi == 0 else cout, 1, bias=False)
            fbn(f"{base}.bn1", mid)
            conv(f"{base}.conv2", mid, mid, 3, bias=False)
            fbn(f"{base}.bn2", mid)
            conv(f"{base}.conv3", cout, mid, 1, bias=False)
            fbn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1, bias=False)
                fbn(f"{base}.downsample.1", cout)
        return cout

    body = "backbone.body."
    conv(f"{body}stem.conv1", 64, 3, 7, bias=False)
    fbn(f"{body}stem.bn1", 64)
    cin = 64
    for li, nb in enumerate((3, 4, 6), start=1):
        cin = stage(f"{body}layer{li}", nb, cin, 64 * 2 ** (li - 1))
    # res5 as the shared box/mask feature extractor
    stage("roi_heads.box.feature_extractor.head.layer4", 3, 1024, 512)
    conv("rpn.head.conv", 1024, 1024, 3)
    na = 15  # 5 sizes x 3 ratios
    conv("rpn.head.cls_logits", na, 1024, 1, scale=3e-4)
    conv("rpn.head.bbox_pred", na * 4, 1024, 1, scale=1e-4)
    linear("roi_heads.box.predictor.cls_score", NC, 2048, scale=0.05)
    linear("roi_heads.box.predictor.bbox_pred", NC * 4, 2048, scale=0.05)
    # ConvTranspose2d weight layout [in, out, kh, kw]
    sd["roi_heads.mask.predictor.conv5_mask.weight"] = (
        rng.standard_normal((2048, 256, 2, 2)) * 0.01).astype(np.float32)
    sd["roi_heads.mask.predictor.conv5_mask.bias"] = (
        rng.standard_normal(256) * 0.02).astype(np.float32)
    conv("roi_heads.mask.predictor.mask_fcn_logits", NC, 256, 1)
    return sd


def t_backbone_c4(sd, x):
    body = "backbone.body."
    x = F.relu(t_fbn(sd, f"{body}stem.bn1",
                     t_conv(sd, f"{body}stem.conv1", x, stride=2, padding=3)))
    x = F.max_pool2d(x, 3, 2, padding=1)
    for li, nb in enumerate((3, 4, 6), start=1):
        for bi in range(nb):
            x = t_bottleneck(sd, f"{body}layer{li}.{bi}", x,
                             stride=(2 if (bi == 0 and li > 1) else 1))
    return x  # [1, 1024, H/16, W/16]


def t_res5(sd, x):
    for bi in range(3):
        x = t_bottleneck(sd, f"roi_heads.box.feature_extractor.head.layer4.{bi}",
                         x, stride=(2 if bi == 0 else 1))
    return x


def t_roi_align_adaptive(feat, boxes, scale, out):
    """ROIAlign_cuda semantics with sampling_ratio=0 (adaptive per-roi grid).
    feat [C,H,W], boxes [N,4] -> [N,C,out,out]; per-roi python loop (test
    oracle, N is small)."""
    c, h, w = feat.shape
    res = torch.zeros((len(boxes), c, out, out))
    for i, bx in enumerate(boxes):
        x1 = float(bx[0]) * scale
        y1 = float(bx[1]) * scale
        roi_w = max(float(bx[2]) * scale - x1, 1.0)
        roi_h = max(float(bx[3]) * scale - y1, 1.0)
        gh = max(int(np.ceil(roi_h / out)), 1)
        gw = max(int(np.ceil(roi_w / out)), 1)
        acc = torch.zeros((c, out, out), dtype=torch.float64)
        fd = feat.double()
        for py in range(out):
            for sy in range(gh):
                y = y1 + (py + (sy + 0.5) / gh) * (roi_h / out)
                if y < -1.0 or y > h:
                    continue
                y_c = min(max(y, 0.0), h - 1)
                y0 = int(np.floor(y_c))
                y1i = min(y0 + 1, h - 1)
                ly = y_c - y0
                for px in range(out):
                    for sx in range(gw):
                        x = x1 + (px + (sx + 0.5) / gw) * (roi_w / out)
                        if x < -1.0 or x > w:
                            continue
                        x_c = min(max(x, 0.0), w - 1)
                        x0 = int(np.floor(x_c))
                        x1i = min(x0 + 1, w - 1)
                        lx = x_c - x0
                        acc[:, py, px] += (
                            (1 - ly) * (1 - lx) * fd[:, y0, x0]
                            + (1 - ly) * lx * fd[:, y0, x1i]
                            + ly * (1 - lx) * fd[:, y1i, x0]
                            + ly * lx * fd[:, y1i, x1i])
        res[i] = (acc / (gh * gw)).float()
    return res


def torch_reference_inference(sd, canvas_chw, cfg):
    h, w = canvas_chw.shape[1:]
    x = torch.from_numpy(canvas_chw)[None]
    c4 = t_backbone_c4(sd, x)
    # single-level RPN
    tconv = F.relu(t_conv(sd, "rpn.head.conv", c4, padding=1))
    logits = t_conv(sd, "rpn.head.cls_logits", tconv)[0]
    deltas = t_conv(sd, "rpn.head.bbox_pred", tconv)[0]
    na = logits.shape[0]
    logits = logits.permute(1, 2, 0).reshape(-1)
    deltas = deltas.permute(1, 2, 0).reshape(-1, na, 4).reshape(-1, 4)
    anchors = torch.from_numpy(C4.make_anchors_np(cfg, h, w))
    k = min(cfg.rpn_pre_nms_top_n, len(logits))
    top, idx = torch.topk(logits, k)
    boxes = t_clip(t_decode(deltas[idx], anchors[idx], (1.0, 1.0, 1.0, 1.0)),
                   h, w)
    scores = torch.sigmoid(top)
    keep = t_nms(boxes, scores, cfg.rpn_nms_thresh)[:cfg.rpn_post_nms_top_n]
    proposals = boxes[keep]
    # box head: adaptive RoIAlign -> res5 -> avgpool -> cls/reg
    pooled = t_roi_align_adaptive(c4[0], proposals, 1.0 / cfg.anchor_stride,
                                  cfg.pooler_resolution)
    feats = t_res5(sd, pooled)
    xf = feats.mean(dim=(2, 3))
    cls = F.linear(xf, _t(sd, "roi_heads.box.predictor.cls_score.weight"),
                   _t(sd, "roi_heads.box.predictor.cls_score.bias"))
    reg = F.linear(xf, _t(sd, "roi_heads.box.predictor.bbox_pred.weight"),
                   _t(sd, "roi_heads.box.predictor.bbox_pred.bias"))
    probs = F.softmax(cls, dim=-1)
    dets = []
    for c in range(1, NC):
        d = reg[:, c * 4:(c + 1) * 4]
        bx = t_clip(t_decode(d, proposals, cfg.box_reg_weights), h, w)
        sc = probs[:, c]
        m = sc > cfg.score_thresh
        if not m.any():
            continue
        keep = t_nms(bx[m], sc[m], cfg.nms_thresh)
        for bi, si in zip(bx[m][keep], sc[m][keep]):
            dets.append((float(si), c - 1, bi))
    dets.sort(key=lambda t: -t[0])
    dets = dets[:cfg.detections_per_img]
    det_boxes = torch.stack([d[2] for d in dets]) if dets else torch.zeros(
        (0, 4))
    det_scores = np.asarray([d[0] for d in dets], np.float32)
    det_classes = np.asarray([d[1] for d in dets], np.int64)
    # mask head: adaptive RoIAlign on detections -> res5 -> deconv -> 1x1
    mp = t_roi_align_adaptive(c4[0], det_boxes, 1.0 / cfg.anchor_stride,
                              cfg.pooler_resolution)
    mf = t_res5(sd, mp)
    mx = F.relu(F.conv_transpose2d(
        mf, _t(sd, "roi_heads.mask.predictor.conv5_mask.weight"),
        _t(sd, "roi_heads.mask.predictor.conv5_mask.bias"), stride=2))
    mlog = t_conv(sd, "roi_heads.mask.predictor.mask_fcn_logits", mx)
    masks = torch.sigmoid(
        mlog[torch.arange(len(dets)), torch.from_numpy(det_classes + 1)])
    return {
        "boxes": det_boxes.numpy(),
        "scores": det_scores,
        "classes": det_classes,
        "masks": masks.numpy(),
        "proposals": proposals.numpy(),
    }


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.default_rng(7)
    sd = _synth_state(rng)
    cfg = C4.MaskRCNNC4Config(
        num_classes=NC,
        rpn_pre_nms_top_n=300, rpn_post_nms_top_n=100,
        detections_per_img=20, pre_final_nms_topk=512)
    img = rng.standard_normal((3, *CANVAS)).astype(np.float32) * 40.0
    return sd, cfg, img


def test_c4_cross_implementation_detection_parity(parity_setup, tmp_path):
    sd, cfg, img = parity_setup
    assert cfg.pooler_sampling_ratio == 0  # adaptive is the C4 default
    want = torch_reference_inference(sd, img, cfg)

    from tpuseg.engine.maskrcnn_engine import load_detectron_weights
    from tpuseg.weights.torch_io import save_torch_file

    path = str(tmp_path / "synth_c4.pth")
    save_torch_file(path, sd)
    params = load_detectron_weights(path, cfg, variant="c4")
    params = jax.tree.map(jnp.asarray, params)
    canvas = jnp.asarray(img.transpose(1, 2, 0))[None]
    hw = jnp.asarray([[CANVAS[0], CANVAS[1]]], jnp.int32)
    out = jax.jit(lambda p, im, hw: C4.forward_inference(p, im, hw, cfg))(
        params, canvas, hw)
    valid = np.asarray(out["valid"][0])
    got = {
        "boxes": np.asarray(out["boxes"][0])[valid],
        "scores": np.asarray(out["scores"][0])[valid],
        "classes": np.asarray(out["classes"][0])[valid],
        "masks": np.asarray(out["masks"][0])[valid],
    }
    assert len(got["scores"]) == len(want["scores"]), (
        f"detection count: ours {len(got['scores'])} vs torch "
        f"{len(want['scores'])}")
    np.testing.assert_allclose(got["scores"], want["scores"], rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(got["classes"], want["classes"])
    np.testing.assert_allclose(got["boxes"], want["boxes"], rtol=1e-3,
                               atol=0.05)
    np.testing.assert_allclose(got["masks"], want["masks"], rtol=1e-3,
                               atol=2e-3)
