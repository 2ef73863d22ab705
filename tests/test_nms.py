import numpy as np
import jax.numpy as jnp

from tpuseg.ops import nms as N
from tests.test_boxes import rand_boxes, np_iou


def np_greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS golden (matches csrc/cuda/nms.cu semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if scores[j] < scores[i] or (scores[j] == scores[i] and j > i):
                if iou[i, j] > thresh:
                    suppressed[j] = True
    return keep


def test_nms_reference_matches_numpy(rng):
    boxes = rand_boxes(rng, 100, size=50.0)
    scores = rng.standard_normal(100).astype(np.float32)
    for t in (0.3, 0.5, 0.7):
        got = np.asarray(
            N.nms_mask_reference(jnp.asarray(boxes), jnp.asarray(scores), t)
        )
        want = np_greedy_nms(boxes, scores, t)
        np.testing.assert_array_equal(got, want)


def test_tiled_nms_matches_reference(rng):
    # sizes straddling tile boundaries, heavy overlap to force deep chains
    for n in (1, 7, 128, 129, 300, 1000):
        boxes = rand_boxes(rng, n, size=30.0)
        scores = rng.standard_normal(n).astype(np.float32)
        ref = np.asarray(
            N.nms_mask_reference(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        got = np.asarray(
            N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"n={n}")


def test_nms_respects_validity(rng):
    boxes = rand_boxes(rng, 64, size=40.0)
    scores = rng.standard_normal(64).astype(np.float32)
    valid = rng.uniform(size=64) > 0.3
    got = np.asarray(
        N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
    )
    assert not np.any(got & ~valid)
    # equals NMS run on only the valid subset
    sub = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(got[valid], sub)


def test_suppression_chain_resurrection():
    # a suppresses b, b suppresses c, a does not suppress c => keep {a, c}
    # IoU(a,b)=IoU(b,c)=0.43 > 0.3; IoU(a,c)=0.11 < 0.3
    boxes = np.array(
        [[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_batched_nms_no_cross_class_suppression(rng):
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    classes = np.array([0, 0, 1, 1], np.int32)
    keep = np.asarray(
        N.batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.5
        )
    )
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_nms_topk_shapes(rng):
    boxes = rand_boxes(rng, 200, size=60.0)
    scores = rng.uniform(size=200).astype(np.float32)
    b, s, idx, v = N.nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 50)
    assert b.shape == (50, 4) and s.shape == (50,) and v.shape == (50,)
    kept = np.asarray(
        N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    ).sum()
    assert int(np.asarray(v).sum()) == min(50, int(kept))


def np_fast_nms(boxes, scores, thresh, top_k):
    c, n = scores.shape
    k = min(top_k, n)
    out = []
    for ci in range(c):
        order = np.argsort(-scores[ci], kind="stable")[:k]
        bx = boxes[order]
        iou = np_iou(bx, bx)
        iou = np.triu(iou, k=1)
        keep = iou.max(axis=0) <= thresh if k > 1 else np.ones(k, bool)
        out.append((order, keep, scores[ci][order]))
    return out


def test_fast_nms_matches_numpy(rng):
    boxes = rand_boxes(rng, 80, size=40.0)
    scores = rng.uniform(size=(5, 80)).astype(np.float32)
    cb, cs, cc, idx, keep = N.fast_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, top_k=20
    )
    golden = np_fast_nms(boxes, scores, 0.5, 20)
    for ci in range(5):
        order, gkeep, gscores = golden[ci]
        np.testing.assert_array_equal(np.asarray(idx)[ci], order)
        np.testing.assert_array_equal(np.asarray(keep)[ci], gkeep)
        np.testing.assert_allclose(np.asarray(cs)[ci], gscores, rtol=1e-6)


def test_nms_to_remove_extents(rng):
    """detectron nms.cu uses +1 extents (TO_REMOVE=1): small adjacent boxes
    suppress differently than with exclusive corners."""
    import jax.numpy as jnp

    from tpuseg.core import boxes as box_ops
    from tpuseg.ops.nms import nms_mask, nms_mask_reference

    # two 3px boxes overlapping by 2px each axis: exclusive IoU = 4/14 ~ .29,
    # +1-extent IoU = 9/23 ~ .39 -> at threshold 0.35 they disagree
    boxes = jnp.asarray([[0, 0, 3, 3], [1, 1, 4, 4]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    iou_ex = float(box_ops.iou_matrix(boxes[:1], boxes[1:])[0, 0])
    iou_p1 = float(box_ops.iou_matrix(boxes[:1], boxes[1:], to_remove=1.0)[0, 0])
    assert iou_ex < 0.35 < iou_p1
    keep_ex = np.asarray(nms_mask(boxes, scores, 0.35))
    keep_p1 = np.asarray(nms_mask(boxes, scores, 0.35, to_remove=1.0))
    assert list(keep_ex) == [True, True]
    assert list(keep_p1) == [True, False]
    ref_p1 = np.asarray(nms_mask_reference(boxes, scores, 0.35, to_remove=1.0))
    assert list(ref_p1) == [True, False]

    # larger random check: tiled == sequential golden under to_remove=1
    n = 300
    b = rng.uniform(0, 50, (n, 2)).astype(np.float32)
    wh = rng.uniform(1, 20, (n, 2)).astype(np.float32)
    bx = jnp.asarray(np.concatenate([b, b + wh], 1))
    sc = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    got = np.asarray(nms_mask(bx, sc, 0.5, to_remove=1.0))
    want = np.asarray(nms_mask_reference(bx, sc, 0.5, to_remove=1.0))
    np.testing.assert_array_equal(got, want)
