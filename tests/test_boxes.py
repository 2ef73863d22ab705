import numpy as np
import jax.numpy as jnp

from tpuseg.core import boxes as B


def rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def test_iou_matrix_matches_numpy(rng):
    a = rand_boxes(rng, 37)
    b = rand_boxes(rng, 23)
    got = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_conversions_roundtrip(rng):
    a = rand_boxes(rng, 50)
    for fwd, bwd in [
        (B.xyxy_to_xywh, B.xywh_to_xyxy),
        (B.xyxy_to_cxcywh, B.cxcywh_to_xyxy),
    ]:
        out = np.asarray(bwd(fwd(jnp.asarray(a))))
        np.testing.assert_allclose(out, a, rtol=1e-5, atol=1e-4)


def test_rcnn_coder_roundtrip(rng):
    anchors = rand_boxes(rng, 64)
    gt = rand_boxes(rng, 64)
    deltas = B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    back = B.decode_boxes(deltas, jnp.asarray(anchors))
    # the +1 extent (encode) and -1 far corner (decode) conventions cancel:
    # roundtrip is exact up to f32 exp/log noise
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=5e-3)


def test_ssd_coder_roundtrip(rng):
    priors = rand_boxes(rng, 64) / 100.0
    priors_cs = np.asarray(B.xyxy_to_cxcywh(jnp.asarray(priors)))
    gt = rand_boxes(rng, 64) / 100.0
    loc = B.ssd_encode(jnp.asarray(gt), jnp.asarray(priors_cs))
    back = B.ssd_decode(loc, jnp.asarray(priors_cs))
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-4)


def test_masked_topk(rng):
    scores = jnp.asarray(rng.standard_normal(20).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=20) > 0.5)
    top, idx, tvalid = B.masked_topk(scores, valid, 8)
    nvalid = int(np.sum(np.asarray(valid)))
    assert int(tvalid.sum()) == min(8, nvalid)
    got = np.asarray(top)[np.asarray(tvalid)]
    want = np.sort(np.asarray(scores)[np.asarray(valid)])[::-1][: min(8, nvalid)]
    np.testing.assert_allclose(got, want)


def test_clip_and_nonempty():
    bx = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [3.0, 3.0, 3.0, 9.0]])
    clipped = B.clip_to_image(bx, 8, 8)
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 8, 8], [3, 3, 3, 8]]
    )
    mask = B.nonempty_mask(clipped)
    assert list(np.asarray(mask)) == [True, False]


def test_iof_matrix_transpose_equivalence(rng):
    a = np.abs(rng.standard_normal((7, 4)).astype(np.float32)) * 50
    b = np.abs(rng.standard_normal((5, 4)).astype(np.float32)) * 50
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    import jax.numpy as jnp

    from tpuseg.core import boxes as box_ops

    plain = np.asarray(box_ops.iof_matrix(jnp.asarray(a), jnp.asarray(b)))
    trans = np.asarray(box_ops.iof_matrix(jnp.asarray(a), jnp.asarray(b),
                                          transpose=True))
    np.testing.assert_allclose(trans, plain.T, rtol=1e-6, atol=1e-6)
