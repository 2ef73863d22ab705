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


def test_yolact_claim_compaction_equivalence():
    """match_priors' iterative claiming now runs on a per-gt top-G
    compaction of the [G, N] overlap matrix. Exactness argument: at most
    G-1 priors are excluded before a gt claims, so every round's winner is
    inside the gt's own G best priors. Pin equivalence against the
    original full-matrix loop on adversarial cases: many gts sharing one
    best prior, exact overlap ties, crowds, and padded gts."""
    import jax
    import jax.numpy as jnp

    from tpuseg.core import boxes as box_ops
    from tpuseg.models import yolact_loss as YL

    def match_reference(gt_boxes, gt_classes, gt_crowd, priors, cfg):
        # the pre-round-5 full-matrix claiming, verbatim
        n = priors.shape[0]
        priors_xyxy = box_ops.cxcywh_to_xyxy(priors)
        valid_gt = (gt_classes >= 0) & ~gt_crowd
        overlaps = box_ops.iou_matrix(gt_boxes, priors_xyxy)
        overlaps = jnp.where(valid_gt[:, None], overlaps, -1.0)
        bto = jnp.max(overlaps, axis=0)
        bti = jnp.argmax(overlaps, axis=0)
        g = gt_boxes.shape[0]

        def claim(_, state):
            ov, bto, bti = state
            per_gt_best = jnp.max(ov, axis=1)
            j = jnp.argmax(per_gt_best)
            i = jnp.argmax(ov[j])
            ok = per_gt_best[j] >= 0.0
            ov = jnp.where(ok, ov.at[:, i].set(-1.0).at[j, :].set(-1.0), ov)
            bto = jnp.where(ok, bto.at[i].set(2.0), bto)
            bti = jnp.where(ok, bti.at[i].set(j), bti)
            return ov, bto, bti

        _, bto, bti = jax.lax.fori_loop(0, g, claim, (overlaps, bto, bti))
        conf = gt_classes[bti] + 1
        conf = jnp.where(bto < cfg.pos_thresh, -1, conf)
        conf = jnp.where(bto < cfg.neg_thresh, 0, conf)
        crowd_valid = (gt_classes >= 0) & gt_crowd
        crowd_iof = box_ops.iof_matrix(priors_xyxy, gt_boxes)
        crowd_iof = jnp.where(crowd_valid[None, :], crowd_iof, 0.0)
        crowd_hit = jnp.max(crowd_iof, axis=1) > cfg.crowd_iou_threshold
        conf = jnp.where((conf <= 0) & crowd_hit, -1, conf)
        matched = gt_boxes[bti]
        loc_t = box_ops.ssd_encode(matched, priors)
        return conf, bti, loc_t

    cfg = YL.YolactLossConfig()
    rng = np.random.default_rng(7)
    n, g = 600, 12
    cxy = rng.uniform(0.1, 0.9, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    priors = jnp.asarray(np.concatenate([cxy, wh], -1).astype(np.float32))

    cases = []
    # case 1: every gt identical -> all share one best prior (pure ties)
    b = np.tile(np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32), (g, 1))
    cases.append((b, np.full(g, 3, np.int32), np.zeros(g, bool)))
    # case 2: random gts, half padded, two crowds
    xy = rng.uniform(0, 0.5, (g, 2)).astype(np.float32)
    wh2 = rng.uniform(0.1, 0.5, (g, 2)).astype(np.float32)
    b = np.concatenate([xy, xy + wh2], -1)
    cls = rng.integers(0, 10, g).astype(np.int32)
    cls[g // 2:] = -1
    crowd = np.zeros(g, bool)
    crowd[1] = crowd[3] = True
    cases.append((b, cls, crowd))
    # case 3: clusters of near-identical gts (claiming must spread them)
    base = rng.uniform(0.1, 0.5, (3, 2)).astype(np.float32)
    b = np.concatenate([np.repeat(base, 4, 0),
                        np.repeat(base, 4, 0) + 0.3], -1)
    cases.append((b, np.arange(g, dtype=np.int32) % 5, np.zeros(g, bool)))

    for bi, (b, cls, crowd) in enumerate(cases):
        args = (jnp.asarray(b), jnp.asarray(cls), jnp.asarray(crowd),
                priors, cfg)
        conf_n, idx_n, loc_n = YL.match_priors(*args)
        conf_o, idx_o, loc_o = match_reference(*args)
        np.testing.assert_array_equal(np.asarray(conf_n), np.asarray(conf_o),
                                      err_msg=f"conf case {bi}")
        np.testing.assert_array_equal(np.asarray(idx_n), np.asarray(idx_o),
                                      err_msg=f"idx case {bi}")
        np.testing.assert_allclose(np.asarray(loc_n), np.asarray(loc_o),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"loc case {bi}")
