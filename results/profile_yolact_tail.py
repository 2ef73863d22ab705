#!/usr/bin/env python
"""Per-stage YOLACT-550 detect-tail profile on the real chip.

Breaks the post-backbone "detect tail" (models/yolact.py::detect) into its
component costs: prior compaction + decode + softmax, Fast-NMS IoU
matrices, global top-k, mask assembly (proto @ coeff + sigmoid + crop).
Each stage jitted alone — relative map only (fused pipeline is faster
than the sum).

NOTE: the s_* stage functions below hand-expand models/yolact.py::detect
(prior gate, softmax transpose, global topk, the compacted-slot ->
prior_map -> coeff double indirection). detect() is the source of truth;
main() asserts the recomposed stages reproduce Y.detect's outputs at
startup so any drift in detect() fails the profile instead of silently
mis-attributing time.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import boxes as box_ops
from tpuseg.models import yolact as Y
from tpuseg.ops import nms as nms_ops


def _sync(out):
    """Scalar host readback of the last output (bench.py::_sync pattern —
    block_until_ready is unreliable on the axon tunnel backend)."""
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])


def timeit(fn, args, iters=20, warm=3):
    out = fn(*args)
    _sync(out)
    for _ in range(warm):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    batch = 32
    cfg = Y.YolactConfig(backbone="resnet50", prior_topk=2048)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, 550, 550, 3)).astype(np.float32))
    priors = jnp.asarray(Y.make_priors_np(cfg))

    def _to32(preds):
        return {k: v.astype(jnp.float32) for k, v in preds.items()}

    def full(p, im):
        preds = Y.forward(p, im.astype(jnp.bfloat16), cfg)
        return Y.detect(_to32(preds), priors, cfg)  # bench.py headline path

    t_full = timeit(jax.jit(full), (params, images))
    print(f"full fwd+detect: {t_full*1e3:8.2f} ms  ({batch/t_full:.1f} img/s)")

    jf = jax.jit(lambda p, im: Y.forward(p, im.astype(jnp.bfloat16), cfg))
    preds = jf(params, images)
    t = timeit(jf, (params, images))
    print(f"forward (backbone+FPN+heads+proto): {t*1e3:8.2f} ms")

    jd = jax.jit(lambda pr: Y.detect(_to32(pr), priors, cfg))
    t = timeit(jd, (preds,))
    print(f"detect tail total (incl f32 cast): {t*1e3:8.2f} ms")
    preds = jax.jit(_to32)(preds)

    # --- decompose the tail ---------------------------------------------
    conf = preds["conf"]
    loc = preds["loc"]

    def s_compact(loc, conf):
        def per_image(l, c):
            lse = jax.nn.logsumexp(c, axis=-1)
            log_max_s = jnp.max(c[:, 1:], axis=-1) - lse
            prior_ok = log_max_s > jnp.log(jnp.float32(cfg.conf_thresh))
            _, pidx, pv = box_ops.masked_topk(log_max_s, prior_ok,
                                              cfg.prior_topk)
            scores = jax.nn.softmax(c[pidx], -1)[:, 1:].T
            scores = jnp.where(pv[None, :], scores, 0.0)
            boxes = box_ops.ssd_decode(l[pidx], priors[pidx], cfg.variances)
            return boxes, scores, pidx
        return jax.vmap(per_image)(loc, conf)

    jc = jax.jit(s_compact)
    boxes_b, scores_b, pidx_b = jc(loc, conf)
    t = timeit(jc, (loc, conf))
    print(f"  compact+decode+softmax: {t*1e3:8.2f} ms")

    def s_fastnms(boxes, scores):
        return jax.vmap(
            lambda b, s: nms_ops.fast_nms(b, s, cfg.nms_iou_thresh,
                                          cfg.nms_top_k)
        )(boxes, scores)

    jn = jax.jit(s_fastnms)
    cboxes, cscores, cclasses, cidx, keep = jn(boxes_b, scores_b)
    t = timeit(jn, (boxes_b, scores_b))
    print(f"  fast_nms (topk + IoU matrices): {t*1e3:8.2f} ms")

    def s_topk(cboxes, cscores, cclasses, cidx, keep):
        def per_image(cb, cs, cc, ci, k):
            flat_scores = jnp.where(k, cs, 0.0).reshape(-1)
            top_s, sel, valid = box_ops.masked_topk(
                flat_scores, flat_scores > 0.0, cfg.max_num_detections)
            return cb.reshape(-1, 4)[sel], top_s, cc.reshape(-1)[sel], \
                ci.reshape(-1)[sel], valid
        return jax.vmap(per_image)(cboxes, cscores, cclasses, cidx, keep)

    jt = jax.jit(s_topk)
    ob, os_, oc, osel, ov = jt(cboxes, cscores, cclasses, cidx, keep)
    t = timeit(jt, (cboxes, cscores, cclasses, cidx, keep))
    print(f"  global topk: {t*1e3:8.2f} ms")

    proto = preds["proto"]
    coeff = preds["coeff"]

    def s_mask(proto, coeff, pidx, sel, ob):
        def per_image(pr, co, pi, sl, b):
            out_coeff = co[pi[sl]]
            m = jnp.einsum("hwk,nk->hwn", pr, out_coeff)
            m = jax.nn.sigmoid(m)
            m = Y._crop_masks(m, b)
            return jnp.transpose(m, (2, 0, 1))
        return jax.vmap(per_image)(proto, coeff, pidx, sel, ob)

    jm = jax.jit(s_mask)
    masks = jm(proto, coeff, pidx_b, osel, ob)
    t = timeit(jm, (proto, coeff, pidx_b, osel, ob))
    print(f"  mask assembly (einsum+sigmoid+crop): {t*1e3:8.2f} ms")

    # Drift guard: recomposed stages must reproduce Y.detect (the source
    # of truth) on the same predictions, or the per-stage times above are
    # mis-attributed.
    ref = jax.jit(lambda pr: Y.detect(pr, priors, cfg))(preds)
    vm = np.asarray(ov, bool)
    # valid-mask equality FIRST: a validity drift would otherwise surface
    # as (or hide behind) a confusing value mismatch in the masked checks
    np.testing.assert_array_equal(vm, np.asarray(ref["valid"], bool))
    for name, ours, theirs in [("boxes", ob, ref["boxes"]),
                               ("scores", os_, ref["scores"]),
                               ("classes", oc, ref["classes"]),
                               ("masks", masks, ref["masks"])]:
        a, b = np.asarray(ours, np.float32), np.asarray(theirs, np.float32)
        a, b = a[vm], b[vm]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=f"stage drift vs Y.detect: {name}")
    print("  drift guard: staged outputs == Y.detect outputs")

    print(f"  dtypes: proto={proto.dtype} coeff={coeff.dtype} "
          f"conf={conf.dtype} loc={loc.dtype}")


if __name__ == "__main__":
    main()
