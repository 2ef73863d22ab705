"""End-to-end cross-implementation parity for YOLOv3 (yolo.jittor — SURVEY
§2.4: Darknet-53 + 3-scale heads, decode, confidence filter, per-class NMS).

An INDEPENDENT torch reimplementation parses the same synthetic darknet
``.weights`` file (sequential cfg-order binary — the reference's release
format) with its own reader, builds the network layer-by-layer in cfg
order, and must agree detection-for-detection with our jit pipeline fed
through weights/darknet_io.load_yolov3_weights (VERDICT r2 next-round #1).
Any drift in reader layer order, BN folding, leaky slope, grid/anchor
decode, score composition, or NMS convention fails the assert.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpuseg.models import yolov3 as Y

SIZE = 160  # input (divisible by 32); heads at 5x5, 10x10, 20x20
NC = 80


# ---------------------------------------------------------------------------
# synthetic .weights writer (sane statistics so the forward pass is tame)
# ---------------------------------------------------------------------------


def write_synth_weights(path, rng):
    blob = [np.asarray([0, 2, 0], np.int32).tobytes(),
            np.asarray([0], np.int64).tobytes()]

    def conv_bn(cout, cin, k, w_scale=None):
        blob.append((rng.standard_normal(cout) * 0.05).astype(
            np.float32).tobytes())  # bn bias (beta)
        blob.append(rng.uniform(0.7, 1.3, cout).astype(
            np.float32).tobytes())  # bn weight (gamma)
        blob.append((rng.standard_normal(cout) * 0.05).astype(
            np.float32).tobytes())  # running_mean
        blob.append(rng.uniform(0.7, 1.3, cout).astype(
            np.float32).tobytes())  # running_var
        scale = w_scale or (cin * k * k) ** -0.5
        blob.append((rng.standard_normal((cout, cin, k, k)) * scale).astype(
            np.float32).tobytes())

    def conv_bias(cout, cin, k, w_scale):
        blob.append((rng.standard_normal(cout) * 0.02).astype(
            np.float32).tobytes())
        blob.append((rng.standard_normal((cout, cin, k, k)) * w_scale).astype(
            np.float32).tobytes())

    # darknet53 backbone in cfg order
    conv_bn(32, 3, 3)
    cin = 32
    for cch, nblocks in ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)):
        conv_bn(cch, cin, 3)  # downsample s2
        for _ in range(nblocks):
            conv_bn(cch // 2, cch, 1)
            conv_bn(cch, cch // 2, 3)
        cin = cch
    out_ch = 3 * (5 + NC)
    # neck0 + head0
    for co, ci, k in ((512, 1024, 1), (1024, 512, 3), (512, 1024, 1),
                      (1024, 512, 3), (512, 1024, 1)):
        conv_bn(co, ci, k)
    conv_bn(1024, 512, 3)
    conv_bias(out_ch, 1024, 1, 3e-3)  # small: tame exp(twh) + spread scores
    conv_bn(256, 512, 1)  # branch0
    for co, ci, k in ((256, 768, 1), (512, 256, 3), (256, 512, 1),
                      (512, 256, 3), (256, 512, 1)):
        conv_bn(co, ci, k)
    conv_bn(512, 256, 3)
    conv_bias(out_ch, 512, 1, 3e-3)
    conv_bn(128, 256, 1)  # branch1
    for co, ci, k in ((128, 384, 1), (256, 128, 3), (128, 256, 1),
                      (256, 128, 3), (128, 256, 1)):
        conv_bn(co, ci, k)
    conv_bn(256, 128, 3)
    conv_bias(out_ch, 256, 1, 3e-3)
    with open(path, "wb") as f:
        f.write(b"".join(blob))


# ---------------------------------------------------------------------------
# independent torch reference: own .weights reader + cfg-order network
# ---------------------------------------------------------------------------


class _TorchReader:
    def __init__(self, path):
        with open(path, "rb") as f:
            np.fromfile(f, np.int32, 3)
            np.fromfile(f, np.int64, 1)
            self.data = np.fromfile(f, np.float32)
        self.pos = 0

    def take(self, n):
        out = self.data[self.pos:self.pos + n]
        assert len(out) == n
        self.pos += n
        return torch.from_numpy(out.copy())


def _read_conv_bn(r, cout, cin, k):
    beta = r.take(cout)
    gamma = r.take(cout)
    mean = r.take(cout)
    var = r.take(cout)
    w = r.take(cout * cin * k * k).reshape(cout, cin, k, k)
    return (w, gamma, beta, mean, var)


def _apply_conv_bn(x, layer, stride=1):
    w, gamma, beta, mean, var = layer
    pad = w.shape[-1] // 2
    x = F.conv2d(x, w, None, stride, pad)
    x = (x - mean[None, :, None, None]) / torch.sqrt(
        var[None, :, None, None] + 1e-5)
    x = x * gamma[None, :, None, None] + beta[None, :, None, None]
    return F.leaky_relu(x, 0.1)


def torch_reference(path, img_nchw, cfg):
    r = _TorchReader(path)
    x = torch.from_numpy(img_nchw)

    x = _apply_conv_bn(x, _read_conv_bn(r, 32, 3, 3))
    cin = 32
    route = {}
    for si, (cch, nblocks) in enumerate(
            ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4))):
        x = _apply_conv_bn(x, _read_conv_bn(r, cch, cin, 3), stride=2)
        for _ in range(nblocks):
            h = _apply_conv_bn(x, _read_conv_bn(r, cch // 2, cch, 1))
            h = _apply_conv_bn(h, _read_conv_bn(r, cch, cch // 2, 3))
            x = x + h
        cin = cch
        if si >= 2:
            route[f"c{si + 1}"] = x

    out_ch = 3 * (5 + NC)

    def convset(x, specs):
        for co, ci, k in specs:
            x = _apply_conv_bn(x, _read_conv_bn(r, co, ci, k))
        return x

    def head(x, mid, cin_h):
        h = _apply_conv_bn(x, _read_conv_bn(r, mid, cin_h, 3))
        b = r.take(out_ch)
        w = r.take(out_ch * mid * 1 * 1).reshape(out_ch, mid, 1, 1)
        return F.conv2d(h, w, b)

    outs = []
    x = convset(route["c5"], ((512, 1024, 1), (1024, 512, 3), (512, 1024, 1),
                              (1024, 512, 3), (512, 1024, 1)))
    outs.append(head(x, 1024, 512))
    b = _apply_conv_bn(x, _read_conv_bn(r, 256, 512, 1))
    b = F.interpolate(b, scale_factor=2, mode="nearest")
    x = torch.cat([b, route["c4"]], dim=1)
    x = convset(x, ((256, 768, 1), (512, 256, 3), (256, 512, 1),
                    (512, 256, 3), (256, 512, 1)))
    outs.append(head(x, 512, 256))
    b = _apply_conv_bn(x, _read_conv_bn(r, 128, 256, 1))
    b = F.interpolate(b, scale_factor=2, mode="nearest")
    x = torch.cat([b, route["c3"]], dim=1)
    x = convset(x, ((128, 384, 1), (256, 128, 3), (128, 256, 1),
                    (256, 128, 3), (128, 256, 1)))
    outs.append(head(x, 256, 128))
    assert r.pos == len(r.data), "torch reader leftover"

    # decode: sigmoid(txy) + grid, exp(twh) * pixel anchors, obj*cls scores
    all_boxes, all_scores, all_cls = [], [], []
    for out, anchors, stride in zip(outs, Y.ANCHORS, Y.STRIDES):
        _, _, h, w = out.shape
        o = out[0].permute(1, 2, 0).reshape(h, w, 3, 5 + NC)
        gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        bx = (torch.sigmoid(o[..., 0]) + gx[..., None]) * stride
        by = (torch.sigmoid(o[..., 1]) + gy[..., None]) * stride
        aw = torch.tensor([a[0] for a in anchors], dtype=torch.float32)
        ah = torch.tensor([a[1] for a in anchors], dtype=torch.float32)
        bw = torch.exp(o[..., 2]) * aw
        bh = torch.exp(o[..., 3]) * ah
        boxes = torch.stack([bx - bw / 2, by - bh / 2,
                             bx + bw / 2, by + bh / 2], -1).reshape(-1, 4)
        obj = torch.sigmoid(o[..., 4]).reshape(-1)
        cls = torch.sigmoid(o[..., 5:]).reshape(-1, NC)
        cls_conf, cls_id = cls.max(-1)
        all_boxes.append(boxes)
        all_scores.append(obj * cls_conf)
        all_cls.append(cls_id)
    boxes = torch.cat(all_boxes)
    scores = torch.cat(all_scores)
    classes = torch.cat(all_cls)
    # postprocess: conf threshold -> top-k prefilter -> per-class NMS (plain
    # IoU, no +1 extents) -> top max_det
    m = scores > cfg.conf_thresh
    boxes, scores, classes = boxes[m], scores[m], classes[m]
    order = torch.argsort(scores, descending=True)[:cfg.pre_nms_topk]
    boxes, scores, classes = boxes[order], scores[order], classes[order]

    def iou(a, b):
        area_a = (a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0)
        area_b = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
        lt = torch.maximum(a[:, None, :2], b[None, :, :2])
        rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (area_a[:, None] + area_b[None, :] - inter).clamp(min=1e-9)

    dets = []
    for c in classes.unique():
        mc = classes == c
        bc, sc = boxes[mc], scores[mc]
        order_c = torch.argsort(sc, descending=True)
        mat = iou(bc[order_c], bc[order_c])
        n = len(order_c)
        alive = torch.ones(n, dtype=torch.bool)
        for i in range(n):
            if not alive[i]:
                continue
            alive &= ~((mat[i] > cfg.nms_thresh) & (torch.arange(n) > i))
        for bi, si in zip(bc[order_c][alive], sc[order_c][alive]):
            dets.append((float(si), int(c), bi))
    dets.sort(key=lambda t: -t[0])
    dets = dets[:cfg.max_det]
    return {
        "boxes": torch.stack([d[2] for d in dets]).numpy()
        if dets else np.zeros((0, 4), np.float32),
        "scores": np.asarray([d[0] for d in dets], np.float32),
        "classes": np.asarray([d[1] for d in dets], np.int64),
    }


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory):
    rng = np.random.default_rng(33)
    path = str(tmp_path_factory.mktemp("w") / "synth_yolov3.weights")
    write_synth_weights(path, rng)
    img = (rng.uniform(0, 1, (1, 3, SIZE, SIZE))).astype(np.float32)
    return path, img


def test_yolov3_cross_implementation_detection_parity(parity_setup):
    path, img = parity_setup
    cfg = Y.YoloV3Config(num_classes=NC, input_size=SIZE, conf_thresh=0.05,
                         max_det=50)
    want = torch_reference(path, img, cfg)

    from tpuseg.weights.darknet_io import load_yolov3_weights

    params = load_yolov3_weights(
        path, Y.init_params(jax.random.PRNGKey(0), cfg))
    params = jax.tree.map(jnp.asarray, params)
    images = jnp.asarray(img.transpose(0, 2, 3, 1))
    out = jax.jit(lambda p, im: Y.detect(p, im, cfg))(params, images)
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
