"""End-to-end cross-implementation parity for Pose2Seg (Pose2Seg.jittor —
SURVEY §2.3: dilated resnet50FPN -> AffineAlign -> skeleton concat ->
resnet10units seg head -> softmax -> inverse-affine paste).

An INDEPENDENT torch reimplementation (torchvision-style ResNet50 with
dilated C5, P2 FPN with bilinear upsample-add, F.affine_grid/F.grid_sample
align + paste) consumes the same upstream-named checkpoint through its own
reader and must agree pixel-for-pixel with our single-jit pipeline fed via
save_torch_file -> pose2seg_from_torch (the last.pkl mapper). This extends
detection-level cross-parity to the 5th model family (VERDICT r2 "proxy
covers 2 of 5").
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpuseg.models import pose2seg as P2S

SIZE = 128       # canvas (stride-4 features: 32x32)
ALIGN = 32
PASTE = 64
NP_ = 2          # real people
MAXP = 3         # padded slot count


def _synth_state(rng):
    sd = {}

    def conv(name, co, ci, k, bias=False, scale=None):
        fan = ci * k * k
        sd[f"{name}.weight"] = (rng.standard_normal((co, ci, k, k)) *
                                (scale or fan ** -0.5)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = (rng.standard_normal(co) * 0.02).astype(
                np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.7, 1.3, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.7, 1.3, c).astype(np.float32)

    # torchvision-named resnet50 under backbone. (stride on conv2,
    # dilated layer4)
    conv("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    cin = 64
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        mid = 64 * 2 ** (li - 1)
        cout = mid * 4
        for bi in range(nb):
            base = f"backbone.layer{li}.{bi}"
            conv(f"{base}.conv1", mid, cin if bi == 0 else cout, 1)
            bn(f"{base}.bn1", mid)
            conv(f"{base}.conv2", mid, mid, 3)
            bn(f"{base}.bn2", mid)
            conv(f"{base}.conv3", cout, mid, 1)
            bn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1)
                bn(f"{base}.downsample.1", cout)
        cin = cout
    # FPN convs beside the resnet (upstream resnet50FPN names)
    conv("backbone.toplayer", 256, 2048, 1, bias=True)
    conv("backbone.latlayer1", 256, 1024, 1, bias=True)
    conv("backbone.latlayer2", 256, 512, 1, bias=True)
    conv("backbone.latlayer3", 256, 256, 1, bias=True)
    conv("backbone.smooth1", 256, 256, 3, bias=True)
    conv("backbone.smooth2", 256, 256, 3, bias=True)
    conv("backbone.smooth3", 256, 256, 3, bias=True)
    # segnet (resnet10units): conv1/bn1 stem, sequential units, classifier
    seg_in = 256 + 55  # cat_skeleton
    conv("segnet.conv1", 256, seg_in, 3)
    bn("segnet.bn1", 256)
    for i in range(10):
        base = f"segnet.layers.{i}"
        conv(f"{base}.conv1", 64, 256, 1)
        bn(f"{base}.bn1", 64)
        conv(f"{base}.conv2", 64, 64, 3)
        bn(f"{base}.bn2", 64)
        conv(f"{base}.conv3", 256, 64, 1)
        bn(f"{base}.bn3", 256)
    conv("segnet.classifier", 2, 256, 1, bias=True)
    return sd


# ---------------------------------------------------------------------------
# independent torch reference
# ---------------------------------------------------------------------------


def _t(sd, n):
    return torch.from_numpy(sd[n])


def t_conv(sd, n, x, stride=1, padding=0, dilation=1):
    b = _t(sd, f"{n}.bias") if f"{n}.bias" in sd else None
    return F.conv2d(x, _t(sd, f"{n}.weight"), b, stride, padding, dilation)


def t_bn(sd, n, x):
    w, b = _t(sd, f"{n}.weight"), _t(sd, f"{n}.bias")
    rm, rv = _t(sd, f"{n}.running_mean"), _t(sd, f"{n}.running_var")
    return (x - rm[None, :, None, None]) / torch.sqrt(
        rv[None, :, None, None] + 1e-5) * w[None, :, None, None] \
        + b[None, :, None, None]


def t_bottleneck(sd, base, x, stride, dilation=1):
    out = F.relu(t_bn(sd, f"{base}.bn1", t_conv(sd, f"{base}.conv1", x)))
    out = F.relu(t_bn(sd, f"{base}.bn2",
                      t_conv(sd, f"{base}.conv2", out, stride=stride,
                             padding=dilation, dilation=dilation)))
    out = t_bn(sd, f"{base}.bn3", t_conv(sd, f"{base}.conv3", out))
    if f"{base}.downsample.0.weight" in sd:
        idn = t_bn(sd, f"{base}.downsample.1",
                   t_conv(sd, f"{base}.downsample.0", x, stride=stride))
    else:
        idn = x
    return F.relu(out + idn)


def torch_reference(sd, img_chw, theta, inv_theta, skel):
    x = torch.from_numpy(img_chw)[None]
    x = F.relu(t_bn(sd, "backbone.bn1",
                    t_conv(sd, "backbone.conv1", x, stride=2, padding=3)))
    x = F.max_pool2d(x, 3, 2, padding=1)
    feats = []
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        dil = 2 if li == 4 else 1
        stride = 1 if (li == 1 or dil > 1) else 2
        for bi in range(nb):
            x = t_bottleneck(sd, f"backbone.layer{li}.{bi}", x,
                             stride if bi == 0 else 1, dil)
        feats.append(x)
    c2, c3, c4, c5 = feats
    p5 = t_conv(sd, "backbone.toplayer", c5)
    up = lambda t, ref: F.interpolate(t, size=ref.shape[2:], mode="bilinear",
                                      align_corners=False)
    p4 = t_conv(sd, "backbone.latlayer1", c4) + up(p5, c4)
    p3 = t_conv(sd, "backbone.latlayer2", c3) + up(p4, c3)
    p2 = t_conv(sd, "backbone.latlayer3", c2) + up(p3, c2)
    p2 = t_conv(sd, "backbone.smooth3", p2, padding=1)
    # AffineAlign: per-person crop from the shared feature map
    n = theta.shape[0]
    feat_rep = p2.expand(n, -1, -1, -1)
    grid = F.affine_grid(torch.from_numpy(theta), (n, p2.shape[1], ALIGN,
                                                   ALIGN),
                         align_corners=False)
    aligned = F.grid_sample(feat_rep, grid, align_corners=False,
                            padding_mode="zeros")
    aligned = torch.cat([aligned, torch.from_numpy(skel)], dim=1)
    # segnet
    s = F.relu(t_bn(sd, "segnet.bn1",
                    t_conv(sd, "segnet.conv1", aligned, padding=1)))
    for i in range(10):
        base = f"segnet.layers.{i}"
        h = F.relu(t_bn(sd, f"{base}.bn1", t_conv(sd, f"{base}.conv1", s)))
        h = F.relu(t_bn(sd, f"{base}.bn2",
                        t_conv(sd, f"{base}.conv2", h, padding=1)))
        h = t_bn(sd, f"{base}.bn3", t_conv(sd, f"{base}.conv3", h))
        s = F.relu(s + h)
    logits = t_conv(sd, "segnet.classifier", s)  # [N, 2, A, A]
    fg = F.softmax(logits, dim=1)[:, 1:2]
    # inverse-affine paste onto the paste grid
    pgrid = F.affine_grid(torch.from_numpy(inv_theta), (n, 1, PASTE, PASTE),
                          align_corners=False)
    masks = F.grid_sample(fg, pgrid, align_corners=False,
                          padding_mode="zeros")[:, 0]
    return logits.permute(0, 2, 3, 1).detach().numpy(), masks.detach().numpy()


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.default_rng(11)
    sd = _synth_state(rng)
    img = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    # plausible similarity crops: scale ~0.4-0.6, small rotation + shift
    theta = np.zeros((NP_, 2, 3), np.float32)
    inv_theta = np.zeros((NP_, 2, 3), np.float32)
    for i in range(NP_):
        ang = rng.uniform(-0.3, 0.3)
        s = rng.uniform(1.6, 2.4)  # crop zoom in normalized coords
        tx, ty = rng.uniform(-0.3, 0.3, 2)
        A = np.asarray([[np.cos(ang) * s, -np.sin(ang) * s, tx],
                        [np.sin(ang) * s, np.cos(ang) * s, ty]], np.float32)
        theta[i] = A
        # exact inverse of the 2x3 affine
        M = np.linalg.inv(np.vstack([A, [0, 0, 1]]))
        inv_theta[i] = M[:2].astype(np.float32)
    skel = rng.standard_normal((NP_, 55, ALIGN, ALIGN)).astype(np.float32)
    return sd, img, theta, inv_theta, skel


def test_pose2seg_cross_implementation_parity(parity_setup, tmp_path):
    sd, img, theta, inv_theta, skel = parity_setup
    want_logits, want_masks = torch_reference(sd, img, theta, inv_theta, skel)

    from tpuseg.engine.pose2seg_engine import pose2seg_from_torch
    from tpuseg.weights.torch_io import (flatten_state_dict, load_torch_file,
                                         save_torch_file)

    path = str(tmp_path / "synth_last.pkl")
    save_torch_file(path, sd)
    cfg = P2S.Pose2SegConfig(input_size=SIZE, align_size=ALIGN,
                             max_people=MAXP, paste_size=PASTE)
    params, cfg = pose2seg_from_torch(
        flatten_state_dict(load_torch_file(path)), cfg)
    assert cfg.cat_skeleton  # inferred from segnet.conv1 input channels
    params = jax.tree.map(jnp.asarray, params)

    # pad people to MAXP slots
    th = np.zeros((1, MAXP, 2, 3), np.float32)
    ith = np.zeros((1, MAXP, 2, 3), np.float32)
    sk = np.zeros((1, MAXP, ALIGN, ALIGN, 55), np.float32)
    th[0, :NP_] = theta
    ith[0, :NP_] = inv_theta
    sk[0, :NP_] = skel.transpose(0, 2, 3, 1)
    pv = np.zeros((1, MAXP), bool)
    pv[0, :NP_] = True

    out = jax.jit(lambda p, im, a, b, v, s: P2S.forward(
        p, im, a, b, v, cfg, skel_feats=s))(
        params, jnp.asarray(img.transpose(1, 2, 0))[None],
        jnp.asarray(th), jnp.asarray(ith), jnp.asarray(pv), jnp.asarray(sk))
    got_logits = np.asarray(out["aligned_logits"][0, :NP_])
    got_masks = np.asarray(out["masks"][0, :NP_])
    np.testing.assert_allclose(got_logits, want_logits, rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(got_masks, want_masks, rtol=1e-3, atol=2e-3)
    # padded slots are zeroed
    np.testing.assert_array_equal(np.asarray(out["masks"][0, NP_:]), 0.0)
