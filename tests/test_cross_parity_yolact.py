"""YOLACT cross-implementation parity: an INDEPENDENT torch reference of
the whole pipeline (R50 backbone -> YOLACT FPN -> protonet/heads -> SSD
decode -> Fast-NMS -> mask assembly+crop) vs the jit pipeline, with the
weights flowing through the real checkpoint path (dbolya-style state dict
written by save_torch_file, read back by load_torch_file + yolact_map).

This is the YOLACT twin of tests/test_cross_parity.py (Mask R-CNN): it
fails if any weight-map key, layout transpose, resize/upsample mode,
decode variance, NMS rule, or crop convention drifts from the reference
semantics (Yolact.jittor yolact.py / layers/box_utils.py /
layers/functions/detection.py).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpuseg.models import yolact as Y

SEED = 7


def small_cfg():
    return Y.YolactConfig(
        backbone="resnet50", img_size=128, num_classes=5, mask_dim=8,
        fpn_channels=32, nms_top_k=16, max_num_detections=8,
        conf_thresh=0.05)


# ---------------------------------------------------------------------------
# synthetic dbolya-named state dict
# ---------------------------------------------------------------------------


def _synth_state(cfg):
    rng = np.random.default_rng(SEED)
    sd = {}

    def conv(name, cout, cin, k, bias=True):
        # fan-in scaling keeps activations O(1) through the 50-layer
        # backbone so conf softmax stays un-saturated (saturated scores
        # made the detection comparison a tie-break lottery)
        std = 1.0 / np.sqrt(cin * k * k)
        sd[f"{name}.weight"] = (rng.standard_normal(
            (cout, cin, k, k)) * std).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = (rng.standard_normal(cout)
                                  * 0.05).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(c) * 0.05).astype(
            np.float32)
        sd[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)

    conv("backbone.conv1", 64, 3, 7, bias=False)
    bn("backbone.bn1", 64)
    cin = 64
    for si, nb in enumerate((3, 4, 6, 3)):
        mid = 64 * 2**si
        cout = mid * 4
        for bi in range(nb):
            base = f"backbone.layers.{si}.{bi}"
            conv(f"{base}.conv1", mid, cin if bi == 0 else cout, 1,
                 bias=False)
            bn(f"{base}.bn1", mid)
            conv(f"{base}.conv2", mid, mid, 3, bias=False)
            bn(f"{base}.bn2", mid)
            conv(f"{base}.conv3", cout, mid, 1, bias=False)
            bn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1, bias=False)
                bn(f"{base}.downsample.1", cout)
        cin = cout
    fc = cfg.fpn_channels
    # lat_layers built over reversed in_channels: 0 consumes C5
    for i, c in enumerate((2048, 1024, 512)):
        conv(f"fpn.lat_layers.{i}", fc, c, 1)
    for i in range(3):
        conv(f"fpn.pred_layers.{i}", fc, fc, 3)
    for i in range(2):
        conv(f"fpn.downsample_layers.{i}", fc, fc, 3)
    for idx, cout in zip((0, 2, 4, 8), [fc] * 4):
        conv(f"proto_net.{idx}", cout, fc, 3)
    conv("proto_net.10", cfg.mask_dim, fc, 1)
    na = cfg.num_anchors
    conv("prediction_layers.0.upfeature.0", fc, fc, 3)
    conv("prediction_layers.0.bbox_layer", na * 4, fc, 3)
    conv("prediction_layers.0.conf_layer", na * cfg.num_classes, fc, 3)
    conv("prediction_layers.0.mask_layer", na * cfg.mask_dim, fc, 3)
    conv("semantic_seg_conv", cfg.num_classes - 1, fc, 1)
    return sd


# ---------------------------------------------------------------------------
# independent torch reference
# ---------------------------------------------------------------------------


def _t(sd, name):
    return torch.from_numpy(sd[name])


def t_conv(sd, name, x, stride=1, padding=0):
    b = _t(sd, f"{name}.bias") if f"{name}.bias" in sd else None
    return F.conv2d(x, _t(sd, f"{name}.weight"), b, stride=stride,
                    padding=padding)


def t_bn(sd, name, x):
    return F.batch_norm(
        x, _t(sd, f"{name}.running_mean"), _t(sd, f"{name}.running_var"),
        _t(sd, f"{name}.weight"), _t(sd, f"{name}.bias"), training=False,
        eps=1e-5)


def t_bottleneck(sd, base, x, stride):
    out = F.relu(t_bn(sd, f"{base}.bn1", t_conv(sd, f"{base}.conv1", x)))
    # torchvision bottleneck: stride on the 3x3
    out = F.relu(t_bn(sd, f"{base}.bn2",
                      t_conv(sd, f"{base}.conv2", out, stride=stride,
                             padding=1)))
    out = t_bn(sd, f"{base}.bn3", t_conv(sd, f"{base}.conv3", out))
    if f"{base}.downsample.0.weight" in sd:
        idn = t_bn(sd, f"{base}.downsample.1",
                   t_conv(sd, f"{base}.downsample.0", x, stride=stride))
    else:
        idn = x
    return F.relu(out + idn)


def t_backbone(sd, x):
    x = t_conv(sd, "backbone.conv1", x, stride=2, padding=3)
    x = F.relu(t_bn(sd, "backbone.bn1", x))
    x = F.max_pool2d(x, 3, 2, padding=1)
    feats = []
    for si, nb in enumerate((3, 4, 6, 3)):
        for bi in range(nb):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = t_bottleneck(sd, f"backbone.layers.{si}.{bi}", x, stride)
        feats.append(x)
    return feats[1], feats[2], feats[3]  # C3, C4, C5


def t_fpn(sd, c3, c4, c5):
    """yolact.py FPN.forward: reversed laterals with bilinear upsample
    accumulation, relu'd 3x3 pred convs, two stride-2 downsample convs."""
    convouts = [c3, c4, c5]
    out = [None, None, None]
    x = torch.zeros_like(t_conv(sd, "fpn.lat_layers.0", c5))
    for i, j in enumerate(range(2, -1, -1)):  # lat 0 -> C5
        if j < 2:
            x = F.interpolate(x, size=convouts[j].shape[2:],
                              mode="bilinear", align_corners=False)
        x = x + t_conv(sd, f"fpn.lat_layers.{i}", convouts[j])
        out[j] = x
    # pred_layers.0 applies to P5 (forward-iteration over reversed out)
    for i, j in enumerate(range(2, -1, -1)):
        out[j] = F.relu(t_conv(sd, f"fpn.pred_layers.{i}", out[j],
                               padding=1))
    p6 = t_conv(sd, "fpn.downsample_layers.0", out[2], stride=2, padding=1)
    p7 = t_conv(sd, "fpn.downsample_layers.1", p6, stride=2, padding=1)
    return [out[0], out[1], out[2], p6, p7]


def t_protonet(sd, p3):
    x = p3
    for idx in (0, 2, 4):
        x = F.relu(t_conv(sd, f"proto_net.{idx}", x, padding=1))
    x = F.interpolate(x, scale_factor=2, mode="bilinear",
                      align_corners=False)
    x = F.relu(t_conv(sd, "proto_net.8", x, padding=1))
    x = t_conv(sd, "proto_net.10", x)
    return F.relu(x)


def t_head(sd, p, cfg):
    x = F.relu(t_conv(sd, "prediction_layers.0.upfeature.0", p, padding=1))
    b = x.shape[0]

    def flat(t, d):
        # upstream permute(0,2,3,1).reshape(B,-1,d)
        return t.permute(0, 2, 3, 1).reshape(b, -1, d)

    loc = flat(t_conv(sd, "prediction_layers.0.bbox_layer", x, padding=1), 4)
    conf = flat(t_conv(sd, "prediction_layers.0.conf_layer", x, padding=1),
                cfg.num_classes)
    coeff = torch.tanh(
        flat(t_conv(sd, "prediction_layers.0.mask_layer", x, padding=1),
             cfg.mask_dim))
    return loc, conf, coeff


def t_decode(loc, priors, variances=(0.1, 0.2)):
    cxy = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    wh = priors[:, 2:] * torch.exp(loc[:, 2:] * variances[1])
    return torch.cat([cxy - wh / 2, cxy + wh / 2], dim=1)


def t_jaccard(a, b):
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / (area_a + area_b - inter).clamp(min=1e-9)


def t_detect(sd, cfg, preds_loc, preds_conf, preds_coeff, proto, priors):
    """layers/functions/detection.py: per-class top_k, Fast-NMS, global
    cap, mask assembly + crop."""
    scores = F.softmax(preds_conf, dim=-1)[:, 1:].T  # [C-1, N]
    # Detect.__call__ gates priors by their max class score; a surviving
    # prior keeps all its per-class scores
    prior_ok = scores.max(dim=0).values > cfg.conf_thresh
    scores = torch.where(prior_ok[None, :], scores, torch.zeros(()))
    k = min(cfg.nms_top_k, scores.shape[1])
    top_scores, idx = scores.topk(k, dim=1)
    boxes = t_decode(preds_loc, priors)
    cboxes = boxes[idx.reshape(-1)].reshape(-1, k, 4)
    keep = torch.ones_like(top_scores, dtype=torch.bool)
    for c in range(cboxes.shape[0]):
        iou = t_jaccard(cboxes[c], cboxes[c])
        iou = iou.triu(diagonal=1)
        keep[c] = iou.max(dim=0).values <= cfg.nms_iou_thresh
    flat_scores = torch.where(keep, top_scores,
                              torch.zeros(())).reshape(-1)
    order = torch.argsort(-flat_scores)[:cfg.max_num_detections]
    order = order[flat_scores[order] > 0]
    out_boxes = cboxes.reshape(-1, 4)[order]
    classes = (order // k).to(torch.int64)
    pidx = idx.reshape(-1)[order]
    coeff = preds_coeff[pidx]
    m = torch.sigmoid(torch.einsum("khw,nk->nhw", proto, coeff))
    # crop (box_utils.crop, padding=1, exclusive right edge)
    s = m.shape[-1]
    x1 = (out_boxes[:, 0] * s).clamp(min=0) - 1
    y1 = (out_boxes[:, 1] * s).clamp(min=0) - 1
    x2 = (out_boxes[:, 2] * s).clamp(max=s) + 1
    y2 = (out_boxes[:, 3] * s).clamp(max=s) + 1
    x1 = (torch.min(out_boxes[:, 0], out_boxes[:, 2]) * s - 1).clamp(min=0)
    x2 = (torch.max(out_boxes[:, 0], out_boxes[:, 2]) * s + 1).clamp(max=s)
    y1 = (torch.min(out_boxes[:, 1], out_boxes[:, 3]) * s - 1).clamp(min=0)
    y2 = (torch.max(out_boxes[:, 1], out_boxes[:, 3]) * s + 1).clamp(max=s)
    rows = torch.arange(s, dtype=torch.float32)[None, :, None]
    cols = torch.arange(s, dtype=torch.float32)[None, None, :]
    inside = ((rows >= y1[:, None, None]) & (rows < y2[:, None, None])
              & (cols >= x1[:, None, None]) & (cols < x2[:, None, None]))
    m = torch.where(inside, m, torch.zeros(()))
    return {
        "boxes": out_boxes, "scores": flat_scores[order],
        "classes": classes, "masks": m,
    }


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = small_cfg()
    sd = _synth_state(cfg)
    # exercise the real checkpoint path: torch-zip write -> read -> map
    from tpuseg.weights.torch_io import (flatten_state_dict, load_torch_file,
                                         save_torch_file)
    from tpuseg.weights.yolact_map import from_torch_state

    path = str(tmp_path_factory.mktemp("w") / "yolact_tiny.pth")
    save_torch_file(path, sd)
    flat = flatten_state_dict(load_torch_file(path))
    params = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None,
        from_torch_state(flat, cfg),
        is_leaf=lambda x: x is None or isinstance(x, np.ndarray))
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, cfg.img_size, cfg.img_size, 3)).astype(
        np.float32)
    return cfg, sd, params, img


def test_forward_parity(setup):
    """Raw heads (loc/conf/coeff/proto) match the torch reference."""
    cfg, sd, params, img = setup
    preds = jax.jit(lambda p, x: Y.forward(p, x, cfg))(
        params, jnp.asarray(img))

    x_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        c3, c4, c5 = t_backbone(sd, x_t)
        pyr = t_fpn(sd, c3, c4, c5)
        proto_t = t_protonet(sd, pyr[0])
        locs, confs, coeffs = [], [], []
        for p in pyr:
            lo, co, ce = t_head(sd, p, cfg)
            locs.append(lo)
            confs.append(co)
            coeffs.append(ce)
    np.testing.assert_allclose(
        np.asarray(preds["proto"][0]),
        proto_t[0].permute(1, 2, 0).numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(preds["loc"][0]), torch.cat(locs, 1)[0].numpy(),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(preds["conf"][0]), torch.cat(confs, 1)[0].numpy(),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(preds["coeff"][0]), torch.cat(coeffs, 1)[0].numpy(),
        rtol=2e-3, atol=2e-4)


def test_detection_parity(setup):
    """Final detections (boxes/scores/classes/cropped masks) match."""
    cfg, sd, params, img = setup
    priors_np = Y.make_priors_np(cfg)
    preds = jax.jit(lambda p, x: Y.forward(p, x, cfg))(
        params, jnp.asarray(img))
    out = Y.detect({k: v for k, v in preds.items()},
                   jnp.asarray(priors_np), cfg)
    valid = np.asarray(out["valid"][0])

    x_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        c3, c4, c5 = t_backbone(sd, x_t)
        pyr = t_fpn(sd, c3, c4, c5)
        proto_t = t_protonet(sd, pyr[0])[0]
        locs, confs, coeffs = [], [], []
        for p in pyr:
            lo, co, ce = t_head(sd, p, cfg)
            locs.append(lo)
            confs.append(co)
            coeffs.append(ce)
        ref = t_detect(sd, cfg, torch.cat(locs, 1)[0],
                       torch.cat(confs, 1)[0], torch.cat(coeffs, 1)[0],
                       proto_t, torch.from_numpy(priors_np))

    n = int(valid.sum())
    assert n == len(ref["scores"]), (n, len(ref["scores"]))
    assert n > 0, "degenerate test: no detections survived"
    # order: both are global score-descending
    np.testing.assert_allclose(
        np.asarray(out["scores"][0])[:n], ref["scores"].numpy(),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(out["classes"][0])[:n], ref["classes"].numpy())
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0])[:n], ref["boxes"].numpy(),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["masks"][0])[:n], ref["masks"].numpy(),
        rtol=5e-3, atol=5e-4)
