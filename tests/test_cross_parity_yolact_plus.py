"""YOLACT++ cross-implementation parity (VERDICT r3 item 3).

Extends the base YOLACT cross-parity harness (test_cross_parity_yolact)
with the ++ extras: a pure-torch DCNv2 (explicit 4-corner bilinear with
zero padding — independent of tpuseg's gather/one-hot formulations) wired
into every stage-2..4 bottleneck the way dbolya's resnet50_dcnv2_backbone
does (interval 1 — the parity-critical 13-block R50 layout), plus the
FastMaskIoUNet rescoring head. Weights flow through the real checkpoint
path (DCNv2 module names ``conv2.weight``/``conv2.conv_offset_mask.*``,
``maskiou_net.maskiou_net.{0..10}`` — the names the released
``yolact_plus_resnet50_54_800000.pth`` uses, README.md:216-221).

A wrong block-level wiring (which block gets DCN, offset-conv placement,
offset/mask channel order, maskiou plumbing) passes the op-level fixtures
in test_deform_conv.py but fails here detection-for-detection.
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import test_cross_parity_yolact as base
from tpuseg.models import yolact as Y

SEED = 11


def plus_cfg():
    cfg = base.small_cfg()
    return Y.YolactConfig(
        backbone=cfg.backbone, img_size=cfg.img_size,
        num_classes=cfg.num_classes, mask_dim=cfg.mask_dim,
        fpn_channels=cfg.fpn_channels, nms_top_k=cfg.nms_top_k,
        max_num_detections=cfg.max_num_detections,
        conf_thresh=cfg.conf_thresh,
        dcn_backbone=True, use_maskiou=True)


# ---------------------------------------------------------------------------
# synthetic ++ state dict: base dict + DCN offset convs + FastMaskIoUNet
# ---------------------------------------------------------------------------


def _synth_state_plus(cfg):
    sd = base._synth_state(cfg)
    rng = np.random.default_rng(SEED)
    # DCNv2 in every block of stages 2-4 (dbolya resnet50_dcnv2_backbone:
    # dcn_layers cover the whole stage, dcn_interval=1).  The DCN module
    # carries its own bias (unlike the plain conv2) and an offset conv
    # producing 27 = 3*k*k channels; offsets ~N(0, 0.3) keep sampling
    # positions near the taps so bilinear weights stay well-conditioned.
    for si, nb in enumerate((3, 4, 6, 3)):
        if si == 0:
            continue
        mid = 64 * 2**si
        for bi in range(nb):
            nm = f"backbone.layers.{si}.{bi}.conv2"
            sd[f"{nm}.bias"] = (rng.standard_normal(mid) * 0.05).astype(
                np.float32)
            sd[f"{nm}.conv_offset_mask.weight"] = (
                rng.standard_normal((27, mid, 3, 3))
                * (0.3 / np.sqrt(mid * 9))).astype(np.float32)
            sd[f"{nm}.conv_offset_mask.bias"] = (
                rng.standard_normal(27) * 0.1).astype(np.float32)
    # FastMaskIoUNet: Sequential (conv s2 + relu) x5 -> 1x1 conv + relu
    cin = 1
    for i, ch in enumerate((8, 16, 32, 64, 128)):
        base_conv = f"maskiou_net.maskiou_net.{2 * i}"
        std = 1.0 / np.sqrt(cin * 9)
        sd[f"{base_conv}.weight"] = (rng.standard_normal(
            (ch, cin, 3, 3)) * std).astype(np.float32)
        sd[f"{base_conv}.bias"] = (rng.standard_normal(ch) * 0.05).astype(
            np.float32)
        cin = ch
    sd["maskiou_net.maskiou_net.10.weight"] = (rng.standard_normal(
        (cfg.num_classes - 1, 128, 1, 1)) / np.sqrt(128)).astype(np.float32)
    sd["maskiou_net.maskiou_net.10.bias"] = (
        rng.standard_normal(cfg.num_classes - 1) * 0.05).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# independent torch DCNv2 (explicit zero-pad bilinear; NOT grid_sample, NOT
# tpuseg's hat-matrix formulation)
# ---------------------------------------------------------------------------


def t_deform_conv(x, om, weight, bias, stride=1, padding=1, dilation=1):
    """x [1,C,H,W], om [1,27,Ho,Wo] raw offset-conv output -> [1,Cout,Ho,Wo].

    DCNv2 semantics: om splits into (o1, o2, mask_logits); offset channels
    are tap-interleaved (channel 2t = dy_t, 2t+1 = dx_t); modulation is
    sigmoid(mask_logits); sampling is bilinear with zero outside the image.
    """
    _, cin, h, w = x.shape
    k = 3
    kk = k * k
    ho, wo = om.shape[2], om.shape[3]
    off = om[0, : 2 * kk].reshape(kk, 2, ho, wo)
    mod = torch.sigmoid(om[0, 2 * kk:])  # [kk, Ho, Wo]
    oy = torch.arange(ho, dtype=torch.float32) * stride - padding
    ox = torch.arange(wo, dtype=torch.float32) * stride - padding
    tap_y = torch.arange(k, dtype=torch.float32).repeat_interleave(k)
    tap_x = torch.arange(k, dtype=torch.float32).repeat(k)
    sy = oy[None, :, None] + dilation * tap_y[:, None, None] + off[:, 0]
    sx = ox[None, None, :] + dilation * tap_x[:, None, None] + off[:, 1]
    y0 = torch.floor(sy)
    x0 = torch.floor(sx)
    vals = torch.zeros((cin, kk, ho, wo))
    for iy, wy in ((y0, y0 + 1 - sy), (y0 + 1, sy - y0)):
        for ix, wx in ((x0, x0 + 1 - sx), (x0 + 1, sx - x0)):
            ok = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
            iyc = iy.long().clamp(0, h - 1)
            ixc = ix.long().clamp(0, w - 1)
            v = x[0][:, iyc, ixc]  # [C, kk, Ho, Wo]
            v = torch.where(ok[None], v, torch.zeros(()))
            vals = vals + v * (wy * wx)[None]
    cols = vals * mod[None]
    out = torch.einsum("cthw,oct->ohw", cols,
                       weight.reshape(weight.shape[0], cin, kk))
    if bias is not None:
        out = out + bias[:, None, None]
    return out[None]


def t_bottleneck_plus(sd, name, x, stride):
    """Bottleneck with DCNv2 on the 3x3 when the checkpoint carries an
    offset conv for it (exactly how the loader decides)."""
    off_name = f"{name}.conv2.conv_offset_mask"
    if f"{off_name}.weight" not in sd:
        return base.t_bottleneck(sd, name, x, stride)
    out = F.relu(base.t_bn(sd, f"{name}.bn1",
                           base.t_conv(sd, f"{name}.conv1", x)))
    om = base.t_conv(sd, off_name, out, stride=stride, padding=1)
    out = t_deform_conv(
        out, om, base._t(sd, f"{name}.conv2.weight"),
        base._t(sd, f"{name}.conv2.bias"), stride=stride, padding=1)
    out = F.relu(base.t_bn(sd, f"{name}.bn2", out))
    out = base.t_bn(sd, f"{name}.bn3", base.t_conv(sd, f"{name}.conv3", out))
    if f"{name}.downsample.0.weight" in sd:
        idn = base.t_bn(sd, f"{name}.downsample.1",
                        base.t_conv(sd, f"{name}.downsample.0", x,
                                    stride=stride))
    else:
        idn = x
    return F.relu(out + idn)


def t_backbone_plus(sd, x):
    x = base.t_conv(sd, "backbone.conv1", x, stride=2, padding=3)
    x = F.relu(base.t_bn(sd, "backbone.bn1", x))
    x = F.max_pool2d(x, 3, 2, padding=1)
    feats = []
    for si, nb in enumerate((3, 4, 6, 3)):
        for bi in range(nb):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = t_bottleneck_plus(sd, f"backbone.layers.{si}.{bi}", x,
                                  stride)
        feats.append(x)
    return feats[1], feats[2], feats[3]


def t_maskiou_net(sd, masks):
    """FastMaskIoUNet: [N,S,S] -> [N, C-1] (1x1 conv + relu BEFORE the
    spatial max pool, include_last_relu=True)."""
    x = masks[:, None]
    for i in range(5):
        x = F.relu(base.t_conv(sd, f"maskiou_net.maskiou_net.{2 * i}", x,
                               stride=2, padding=1))
    x = F.relu(base.t_conv(sd, "maskiou_net.maskiou_net.10", x))
    return torch.amax(x, dim=(2, 3))


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


def _setup(tmp_path):
    cfg = plus_cfg()
    sd = _synth_state_plus(cfg)
    from tpuseg.weights.torch_io import (flatten_state_dict, load_torch_file,
                                         save_torch_file)
    from tpuseg.weights.yolact_map import from_torch_state

    path = str(tmp_path / "yolact_plus_tiny.pth")
    save_torch_file(path, sd)
    flat = flatten_state_dict(load_torch_file(path))
    params = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None,
        from_torch_state(flat, cfg),
        is_leaf=lambda x: x is None or isinstance(x, np.ndarray))
    assert "maskiou" in params, "weight map dropped the FastMaskIoUNet"
    n_dcn = sum(
        1 for lyr in ("layer2", "layer3", "layer4")
        for blk in params["backbone"][lyr]
        if blk.get("conv2_offset") is not None)
    assert n_dcn == 13, f"expected the 13-block DCN layout, got {n_dcn}"
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, cfg.img_size, cfg.img_size, 3)).astype(
        np.float32)
    return cfg, sd, params, img


def _torch_predict(sd, cfg, img):
    x_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        c3, c4, c5 = t_backbone_plus(sd, x_t)
        pyr = base.t_fpn(sd, c3, c4, c5)
        proto_t = base.t_protonet(sd, pyr[0])
        locs, confs, coeffs = [], [], []
        for p in pyr:
            lo, co, ce = base.t_head(sd, p, cfg)
            locs.append(lo)
            confs.append(co)
            coeffs.append(ce)
    return (proto_t, torch.cat(locs, 1), torch.cat(confs, 1),
            torch.cat(coeffs, 1))


def test_plus_forward_parity(tmp_path):
    """Raw ++ heads match torch through the 13-DCN-block backbone."""
    cfg, sd, params, img = _setup(tmp_path)
    preds = jax.jit(lambda p, x: Y.forward(p, x, cfg))(
        params, jnp.asarray(img))
    proto_t, loc_t, conf_t, coeff_t = _torch_predict(sd, cfg, img)
    np.testing.assert_allclose(
        np.asarray(preds["proto"][0]),
        proto_t[0].permute(1, 2, 0).numpy(), rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(preds["loc"][0]), loc_t[0].numpy(), rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(preds["conf"][0]), conf_t[0].numpy(), rtol=3e-3,
        atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(preds["coeff"][0]), coeff_t[0].numpy(), rtol=3e-3,
        atol=3e-4)


def test_plus_detection_parity(tmp_path):
    """Final ++ detections incl. maskiou-rescored scores match."""
    cfg, sd, params, img = _setup(tmp_path)
    priors_np = Y.make_priors_np(cfg)
    preds = jax.jit(lambda p, x: Y.forward(p, x, cfg))(
        params, jnp.asarray(img))
    out = Y.detect(dict(preds), jnp.asarray(priors_np), cfg,
                   params_miou=params["maskiou"])
    assert "mask_scores" in out, "use_maskiou did not produce mask_scores"
    valid = np.asarray(out["valid"][0])
    n = int(valid.sum())

    proto_t, loc_t, conf_t, coeff_t = _torch_predict(sd, cfg, img)
    with torch.no_grad():
        ref = base.t_detect(sd, cfg, loc_t[0], conf_t[0], coeff_t[0],
                            proto_t[0], torch.from_numpy(priors_np))
        iou_p = t_maskiou_net(sd, ref["masks"])
        cls_iou = iou_p.gather(1, ref["classes"][:, None])[:, 0]
        ref_mask_scores = ref["scores"] * cls_iou

    assert n == len(ref["scores"]), (n, len(ref["scores"]))
    assert n > 0, "degenerate test: no detections survived"
    np.testing.assert_allclose(
        np.asarray(out["scores"][0])[:n], ref["scores"].numpy(),
        rtol=3e-3, atol=3e-4)
    np.testing.assert_array_equal(
        np.asarray(out["classes"][0])[:n], ref["classes"].numpy())
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0])[:n], ref["boxes"].numpy(),
        rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(out["masks"][0])[:n], ref["masks"].numpy(),
        rtol=8e-3, atol=8e-4)
    np.testing.assert_allclose(
        np.asarray(out["mask_scores"][0])[:n], ref_mask_scores.numpy(),
        rtol=8e-3, atol=8e-4)
