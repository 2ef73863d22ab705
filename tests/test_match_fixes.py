"""Regression tests for the fourth review batch.

Pins the anchor-matching canvas-invariance semantics: padded-canvas
anchors (absent from the reference's per-image anchor grids,
maskrcnn-benchmark anchor_generator.py grid_anchors) are excluded from
the IoU match matrix itself, so they can neither match nor absorb a
gt's low-quality forcing; straddling-but-real anchors stay in the
matrix and are discarded after matching, as upstream.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import maskrcnn as M
from tpuseg.models import maskrcnn_loss as ML
from tpuseg.models import retinanet as R


def _retina_labels(rcfg, ch, cw, hw, gtb, gtv):
    per_level = [jnp.asarray(a) for a in R.make_anchors_np(rcfg, ch, cw)]
    anchors = jnp.concatenate(per_level, 0)
    ins_l = []
    for li, an in enumerate(per_level):
        stride = rcfg.anchor_stride[li]
        hl, wl = M.fpn_level_hw(ch, cw, stride)
        ins_l.append(M.anchor_inside_mask(
            hw, stride, hl, wl, an.shape[0] // (hl * wl)))
    ins = jnp.concatenate(ins_l, 1)[0]
    _, lab = ML.match_targets(
        gtb, gtv, anchors, rcfg.fg_iou, rcfg.bg_iou, True, anchor_valid=ins)
    lab = jnp.where(ins, lab, -1)
    return np.asarray(lab), np.asarray(ins)


def test_retinanet_matching_canvas_invariant():
    """The positive/ignore assignment of real-extent anchors must not
    depend on how much padding the static canvas adds."""
    rcfg = R.RetinaNetConfig()
    hw = jnp.array([[360, 480]], jnp.int32)
    gtb = jnp.array([[10.0, 20.0, 200.0, 300.0], [0.0, 0.0, 480.0, 360.0]])
    gtv = jnp.array([True, True])

    lab_s, ins_s = _retina_labels(rcfg, 384, 512, hw, gtb, gtv)
    lab_b, ins_b = _retina_labels(rcfg, 512, 640, hw, gtb, gtv)
    assert ins_s.sum() == ins_b.sum()
    assert (lab_s == 1).sum() == (lab_b == 1).sum()
    assert (lab_s == 1).sum() > 0
    # the labels of the shared (inside) anchors agree element-for-element
    assert np.array_equal(lab_s[ins_s], lab_b[ins_b])


def test_match_targets_anchor_valid_transfers_forcing():
    """If a gt's best-IoU anchor is excluded via anchor_valid, the
    low-quality forcing must fall to the best VALID anchor instead of
    being lost."""
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gtv = jnp.array([True])
    # anchor 0 overlaps best, anchor 1 second-best, anchor 2 far away;
    # all below the fg threshold so only forcing can make a positive
    anchors = jnp.array([
        [0.0, 0.0, 30.0, 30.0],
        [0.0, 0.0, 40.0, 40.0],
        [100.0, 100.0, 130.0, 130.0],
    ])
    _, lab_all = ML.match_targets(gt, gtv, anchors, 0.7, 0.3, True)
    assert int(lab_all[0]) == 1 and int(lab_all[1]) != 1
    valid = jnp.array([False, True, True])
    _, lab_masked = ML.match_targets(gt, gtv, anchors, 0.7, 0.3, True,
                                     anchor_valid=valid)
    assert int(lab_masked[1]) == 1, "forcing must transfer to the best valid"
    assert int(lab_masked[0]) != 1


def test_balanced_sample_exact_batch_size():
    """Sampler output is exactly batch_size slots, positives first."""
    lab = jnp.concatenate([jnp.ones((40,), jnp.int32),
                           jnp.zeros((1960,), jnp.int32)])
    si, sp, sv = ML.balanced_sample(lab, jax.random.PRNGKey(3), 512, 0.25)
    assert si.shape == (512,)
    assert int(sv.sum()) == 512
    assert int(sp.sum()) == 40
    assert bool(np.asarray(sp)[:40].all())
    # positive cap honored when positives abound
    lab2 = jnp.ones((2000,), jnp.int32)
    _, sp2, sv2 = ML.balanced_sample(lab2, jax.random.PRNGKey(4), 512, 0.25)
    assert int(sp2.sum()) == 128  # 512 * 0.25


def test_yolov3_edge_centered_gt_offset():
    """A gt centered exactly on the right/bottom image edge lands in the
    last (clamped) cell with target offset 1.0, not 0.0 — `gx - floor(gx)`
    would train the center a full stride to the left."""
    from tpuseg.models.yolov3 import YoloV3Config
    from tpuseg.models.yolov3_loss import build_targets

    cfg = YoloV3Config()
    level_hw = [(13, 13), (26, 26), (52, 52)]
    # center exactly at (416, 416), the bottom-right image corner
    boxes = jnp.array([[316.0, 316.0, 516.0, 516.0]])  # 200x200 gt
    classes = jnp.array([5], jnp.int32)
    tgt = build_targets(boxes, classes, level_hw, cfg)
    assigned = [np.asarray(t[0]) for t in tgt]
    counts = [int(a.sum()) for a in assigned]
    assert sum(counts) == 1, counts
    li = counts.index(1)
    idx = int(assigned[li].argmax())
    h, w = level_hw[li]
    cell = idx // 3
    cj, ci = cell // w, cell % w
    assert (cj, ci) == (h - 1, w - 1), (cj, ci)
    txywh = np.asarray(tgt[li][1])
    stride = [32, 16, 8][li]
    assert abs(txywh[idx, 0] - (416.0 / stride - (w - 1))) < 1e-5
    assert abs(txywh[idx, 1] - (416.0 / stride - (h - 1))) < 1e-5
    assert txywh[idx, 0] >= 1.0  # the clamped-cell offset, not 0.0
