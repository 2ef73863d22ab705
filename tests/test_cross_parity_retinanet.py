"""End-to-end cross-implementation parity for RetinaNet (maskrcnn-benchmark
``retinanet_R-50-FPN_1x``, the SigmoidFocalLoss consumer — SURVEY §2.1).

An INDEPENDENT torch reimplementation of the RetinaNet inference semantics
(FrozenBN ResNet50 -> P3-P7 FPN with LastLevelP6P7 -> shared 4-conv
class/box towers -> per-level score-threshold + top-k -> decode ->
cross-level class-aware NMS -> top-100) runs the same random-weight
checkpoint as our jit pipeline, loaded through save_torch_file ->
load_detectron_weights(variant="retinanet") (VERDICT r2 next-round #1).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpuseg.models import retinanet as RN
from tests.test_cross_parity import (_t, t_bottleneck, t_clip, t_conv,
                                     t_decode, t_fbn, t_nms)

CANVAS = (224, 320)
NC = 9  # incl background slot; sigmoid head has NC-1 outputs


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

    body = "backbone.body."
    conv(f"{body}stem.conv1", 64, 3, 7, bias=False)
    fbn(f"{body}stem.bn1", 64)
    cin = 64
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        mid = 64 * 2 ** (li - 1)
        cout = mid * 4
        for bi in range(nb):
            base = f"{body}layer{li}.{bi}"
            conv(f"{base}.conv1", mid, cin if bi == 0 else cout, 1, bias=False)
            fbn(f"{base}.bn1", mid)
            conv(f"{base}.conv2", mid, mid, 3, bias=False)
            fbn(f"{base}.bn2", mid)
            conv(f"{base}.conv3", cout, mid, 1, bias=False)
            fbn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1, bias=False)
                fbn(f"{base}.downsample.1", cout)
        cin = cout
    # FPN over C3-C5 only + LastLevelP6P7 (build_resnet_fpn_p3p7_backbone)
    for i, c in zip((2, 3, 4), (512, 1024, 2048)):
        conv(f"backbone.fpn.fpn_inner{i}", 256, c, 1)
        conv(f"backbone.fpn.fpn_layer{i}", 256, 256, 3)
    conv("backbone.fpn.top_blocks.p6", 256, 2048, 3)
    conv("backbone.fpn.top_blocks.p7", 256, 256, 3)
    na = 9  # 3 octave scales x 3 ratios
    for i in (0, 2, 4, 6):
        conv(f"rpn.head.cls_tower.{i}", 256, 256, 3)
        conv(f"rpn.head.bbox_tower.{i}", 256, 256, 3)
    # tame scales: keep sigmoid scores spread around 0.5, no saturated ties
    conv("rpn.head.cls_logits", na * (NC - 1), 256, 3, scale=5e-4)
    conv("rpn.head.bbox_pred", na * 4, 256, 3, scale=3e-4)
    return sd


def t_backbone_p3p7(sd, x):
    body = "backbone.body."
    x = F.relu(t_fbn(sd, f"{body}stem.bn1",
                     t_conv(sd, f"{body}stem.conv1", x, stride=2, padding=3)))
    x = F.max_pool2d(x, 3, 2, padding=1)
    feats = []
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        for bi in range(nb):
            x = t_bottleneck(sd, f"{body}layer{li}.{bi}", x,
                             stride=(2 if (bi == 0 and li > 1) else 1))
        feats.append(x)
    c3, c4, c5 = feats[1:]
    inner = [t_conv(sd, f"backbone.fpn.fpn_inner{i}", f)
             for i, f in zip((2, 3, 4), (c3, c4, c5))]
    last = inner[-1]
    tds = [last]
    for i in (1, 0):
        last = inner[i] + F.interpolate(last, scale_factor=2, mode="nearest")
        tds.insert(0, last)
    pyr = [t_conv(sd, f"backbone.fpn.fpn_layer{i}", t, padding=1)
           for i, t in zip((2, 3, 4), tds)]
    p6 = t_conv(sd, "backbone.fpn.top_blocks.p6", c5, stride=2, padding=1)
    p7 = t_conv(sd, "backbone.fpn.top_blocks.p7", F.relu(p6), stride=2,
                padding=1)
    return pyr + [p6, p7]


def torch_reference_inference(sd, canvas_chw, cfg):
    h, w = canvas_chw.shape[1:]
    x = torch.from_numpy(canvas_chw)[None]
    pyr = t_backbone_p3p7(sd, x)
    anchors = RN.make_anchors_np(cfg, h, w)
    nc = cfg.num_classes - 1
    cand_boxes, cand_scores, cand_classes = [], [], []
    for li, p in enumerate(pyr):
        c = p
        for i in (0, 2, 4, 6):
            c = F.relu(t_conv(sd, f"rpn.head.cls_tower.{i}", c, padding=1))
        logits = t_conv(sd, "rpn.head.cls_logits", c, padding=1)[0]
        t = p
        for i in (0, 2, 4, 6):
            t = F.relu(t_conv(sd, f"rpn.head.bbox_tower.{i}", t, padding=1))
        deltas = t_conv(sd, "rpn.head.bbox_pred", t, padding=1)[0]
        # NCHW [A*nc, H, W] -> flat [(H*W*A), nc] matching NHWC reshape
        scores = torch.sigmoid(logits.permute(1, 2, 0).reshape(-1, nc))
        deltas = deltas.permute(1, 2, 0).reshape(-1, 4)
        an = torch.from_numpy(anchors[li])
        # RetinaNetPostProcessor: threshold, per-level top-k over flat
        # (anchor, class) scores, decode selected
        flat = scores.reshape(-1)
        cand = flat > cfg.score_thresh
        k = min(cfg.pre_nms_top_n, int(cand.sum()))
        if k == 0:
            continue
        masked = torch.where(cand, flat, torch.tensor(-1.0))
        top_s, sel = torch.topk(masked, k)
        a_idx = sel // nc
        cls_idx = sel % nc
        boxes = t_clip(t_decode(deltas[a_idx], an[a_idx],
                                cfg.box_reg_weights), h, w)
        cand_boxes.append(boxes)
        cand_scores.append(top_s)
        cand_classes.append(cls_idx)
    boxes = torch.cat(cand_boxes)
    scores = torch.cat(cand_scores)
    classes = torch.cat(cand_classes)
    # class-aware NMS across levels (boxlist_ml_nms) + top-100
    dets = []
    for c in range(nc):
        m = classes == c
        if not m.any():
            continue
        keep = t_nms(boxes[m], scores[m], cfg.nms_thresh)
        for bi, si in zip(boxes[m][keep], scores[m][keep]):
            dets.append((float(si), c, bi))
    dets.sort(key=lambda t: -t[0])
    dets = dets[:cfg.detections_per_img]
    return {
        "boxes": torch.stack([d[2] for d in dets]).numpy()
        if dets else np.zeros((0, 4), np.float32),
        "scores": np.asarray([d[0] for d in dets], np.float32),
        "classes": np.asarray([d[1] for d in dets], np.int64),
    }


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.default_rng(21)
    sd = _synth_state(rng)
    cfg = RN.RetinaNetConfig(num_classes=NC, pre_nms_top_n=200,
                             detections_per_img=25)
    img = rng.standard_normal((3, *CANVAS)).astype(np.float32) * 40.0
    return sd, cfg, img


def test_retinanet_cross_implementation_detection_parity(parity_setup,
                                                         tmp_path):
    sd, cfg, img = parity_setup
    want = torch_reference_inference(sd, img, cfg)

    from tpuseg.engine.maskrcnn_engine import load_detectron_weights
    from tpuseg.weights.torch_io import save_torch_file

    path = str(tmp_path / "synth_retinanet.pth")
    save_torch_file(path, sd)
    params = load_detectron_weights(path, cfg, variant="retinanet")
    params = jax.tree.map(jnp.asarray, params)
    canvas = jnp.asarray(img.transpose(1, 2, 0))[None]
    hw = jnp.asarray([[CANVAS[0], CANVAS[1]]], jnp.int32)
    out = jax.jit(lambda p, im, hw: RN.forward_inference(p, im, hw, cfg))(
        params, canvas, hw)
    valid = np.asarray(out["valid"][0])
    got = {
        "boxes": np.asarray(out["boxes"][0])[valid],
        "scores": np.asarray(out["scores"][0])[valid],
        "classes": np.asarray(out["classes"][0])[valid],
    }
    assert len(got["scores"]) == len(want["scores"]), (
        f"detection count: ours {len(got['scores'])} vs torch "
        f"{len(want['scores'])}")
    np.testing.assert_allclose(got["scores"], want["scores"], rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(got["classes"], want["classes"])
    np.testing.assert_allclose(got["boxes"], want["boxes"], rtol=1e-3,
                               atol=0.05)
