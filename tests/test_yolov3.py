import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import yolov3 as Y


def small_cfg():
    return Y.YoloV3Config(num_classes=4, input_size=128, pre_nms_topk=256,
                          max_det=20)


def test_forward_shapes_and_detect():
    cfg = small_cfg()
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 128, 128, 3))
    outs = Y.forward(params, x, cfg)
    assert [o.shape for o in outs] == [
        (2, 4, 4, 27), (2, 8, 8, 27), (2, 16, 16, 27)]
    dets = jax.jit(lambda p, x: Y.detect(p, x, cfg))(params, x)
    assert dets["boxes"].shape == (2, 20, 4)
    assert dets["scores"].shape == (2, 20)
    assert dets["classes"].shape == (2, 20)
    # scores of invalid slots are zero
    s = np.asarray(dets["scores"])
    v = np.asarray(dets["valid"])
    assert np.all(s[~v] == 0)


def np_decode_level(out, anchors, stride, num_classes, scale):
    b, h, w, _ = out.shape
    na = len(anchors)
    out = out.reshape(b, h, w, na, 5 + num_classes)
    sig = lambda v: 1 / (1 + np.exp(-v))  # noqa: E731
    boxes = np.zeros((b, h, w, na, 4))
    for yy in range(h):
        for xx in range(w):
            for ai, (aw, ah) in enumerate(anchors):
                t = out[:, yy, xx, ai]
                bx = (sig(t[:, 0]) + xx) * stride
                by = (sig(t[:, 1]) + yy) * stride
                bw = np.exp(t[:, 2]) * aw * scale
                bh = np.exp(t[:, 3]) * ah * scale
                boxes[:, yy, xx, ai] = np.stack(
                    [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], -1)
    return boxes.reshape(b, -1, 4), sig(out[..., 4]).reshape(b, -1), \
        sig(out[..., 5:]).reshape(b, -1, num_classes)


def test_decode_matches_numpy(rng):
    cfg = small_cfg()
    outs = [
        jnp.asarray(rng.standard_normal((1, 4, 4, 27)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 8, 8, 27)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 16, 16, 27)).astype(np.float32)),
    ]
    boxes, obj, cls = Y.decode(outs, cfg)
    want_parts = [
        np_decode_level(np.asarray(o), a, s, cfg.num_classes, 1.0)
        for o, a, s in zip(outs, Y.ANCHORS, Y.STRIDES)
    ]
    want_boxes = np.concatenate([p[0] for p in want_parts], 1)
    want_obj = np.concatenate([p[1] for p in want_parts], 1)
    want_cls = np.concatenate([p[2] for p in want_parts], 1)
    np.testing.assert_allclose(np.asarray(boxes), want_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(obj), want_obj, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls), want_cls, rtol=1e-5, atol=1e-6)


def test_darknet_weights_roundtrip(tmp_path, rng):
    """Synthesize a .weights file in cfg order and check exact loading."""
    import jax.tree_util as jtu
    from tpuseg.weights import darknet_io as D

    cfg = small_cfg()
    params = Y.init_params(jax.random.PRNGKey(1), cfg)
    params_np = jax.tree.map(np.asarray, params)

    blob = [np.array([0, 2, 0], np.int32).tobytes(),
            np.array([0], np.int64).tobytes()]
    count = 0

    def emit_conv_bn(p):
        nonlocal count
        w = p["conv"]["weight"]
        cout = w.shape[3]
        for name in ("bias", "weight", "running_mean", "running_var"):
            arr = rng.standard_normal(cout).astype(np.float32)
            p["bn"][name] = arr
            blob.append(arr.tobytes())
        wd = rng.standard_normal((cout, w.shape[2], w.shape[0], w.shape[1])
                                 ).astype(np.float32)
        p["conv"]["weight"] = wd.transpose(2, 3, 1, 0)
        blob.append(wd.tobytes())
        count += 1

    def emit_conv_bias(p):
        w = p["weight"]
        cout = w.shape[3]
        arr = rng.standard_normal(cout).astype(np.float32)
        p["bias"] = arr
        blob.append(arr.tobytes())
        wd = rng.standard_normal((cout, w.shape[2], w.shape[0], w.shape[1])
                                 ).astype(np.float32)
        p["weight"] = wd.transpose(2, 3, 1, 0)
        blob.append(wd.tobytes())

    for layer in D._backbone_layers(params_np["backbone"]):
        emit_conv_bn(layer)
    for p in params_np["neck0"]:
        emit_conv_bn(p)
    emit_conv_bn(params_np["head0"]["conv"])
    emit_conv_bias(params_np["head0"]["out"])
    emit_conv_bn(params_np["branch0"])
    for p in params_np["neck1"]:
        emit_conv_bn(p)
    emit_conv_bn(params_np["head1"]["conv"])
    emit_conv_bias(params_np["head1"]["out"])
    emit_conv_bn(params_np["branch1"])
    for p in params_np["neck2"]:
        emit_conv_bn(p)
    emit_conv_bn(params_np["head2"]["conv"])
    emit_conv_bias(params_np["head2"]["out"])

    path = str(tmp_path / "synth.weights")
    with open(path, "wb") as f:
        f.write(b"".join(blob))

    loaded = D.load_yolov3_weights(path, Y.init_params(jax.random.PRNGKey(2), cfg))
    leaves_got = jtu.tree_leaves(loaded)
    leaves_want = jtu.tree_leaves(params_np)
    assert len(leaves_got) == len(leaves_want)
    for a, b in zip(leaves_got, leaves_want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
