import numpy as np
import jax.numpy as jnp

from tpuseg.ops import sampling as S
from tpuseg.ops.pallas.roi_align_pl import multilevel_roi_align_pallas


def _setup(rng, n=16, c=128):
    feats = tuple(
        jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
        for hw in (64, 32, 16, 8)
    )
    strides = (4, 8, 16, 32)
    # boxes sized so the FPN level rule keeps extents inside the window
    levels = rng.integers(0, 4, n).astype(np.int32)
    px_sizes = np.array([100, 200, 420, 900])[levels]  # px per level
    xy = rng.uniform(0, 150, (n, 2)).astype(np.float32)
    wh = (px_sizes[:, None] * rng.uniform(0.5, 1.0, (n, 2))).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    bi = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    return feats, strides, boxes, bi, jnp.asarray(levels)


def test_pallas_roi_align_matches_jnp_interpret(rng):
    feats, strides, boxes, bi, levels = _setup(rng)
    want = np.asarray(S.multilevel_roi_align(
        feats, boxes, bi, levels, output_size=7, sampling_ratio=2,
        strides=strides))
    got = np.asarray(multilevel_roi_align_pallas(
        feats, boxes, bi, levels, output_size=7, sampling_ratio=2,
        strides=strides, rows=32, span=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_mask_resolution_interpret(rng):
    feats, strides, boxes, bi, levels = _setup(rng, n=8)
    want = np.asarray(S.multilevel_roi_align(
        feats, boxes, bi, levels, output_size=14, sampling_ratio=2,
        strides=strides))
    got = np.asarray(multilevel_roi_align_pallas(
        feats, boxes, bi, levels, output_size=14, sampling_ratio=2,
        strides=strides, rows=32, span=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_differentiable_pooler_grads_match_jnp(rng):
    import jax

    from tpuseg.ops.pallas.roi_align_pl import make_differentiable_pooler

    feats, strides, boxes, bi, levels = _setup(rng, n=6, c=128)
    pooler = make_differentiable_pooler(7, 2, strides, interpret=True)

    def loss_pallas(f):
        return jnp.sum(pooler(f, boxes, bi, levels) ** 2)

    def loss_jnp(f):
        return jnp.sum(S.multilevel_roi_align(
            f, boxes, bi, levels, output_size=7, sampling_ratio=2,
            strides=strides) ** 2)

    g_pl = jax.grad(loss_pallas)(feats)
    g_np = jax.grad(loss_jnp)(feats)
    for a, b in zip(g_pl, g_np):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_extreme_aspect_boxes_clamp_to_fitting_level(rng):
    """A high-aspect RoI whose extent overflows its canonical level's DMA
    window must pool from a coarser level, not zero-dilute (ADVICE r1 high).
    Both paths (Pallas, jnp) must agree after the shared clamp."""
    from tpuseg.ops.pallas.roi_align_pl import clamp_levels_to_window

    feats, strides, _, _, _ = _setup(rng, n=4)
    # 4 pathological boxes: wide, tall, huge at fine level, normal control
    boxes = jnp.asarray(np.array([
        [4.0, 100.0, 252.0, 112.0],   # 248x12 px -> canonical lvl 0, 62 cells
        [100.0, 4.0, 118.0, 250.0],   # 18x246 px -> tall version
        [0.0, 0.0, 255.0, 255.0],     # whole image
        [40.0, 40.0, 90.0, 96.0],     # normal box, must NOT be clamped
    ], np.float32))
    bi = jnp.asarray(np.zeros(4, np.int32))
    from tpuseg.models.maskrcnn import assign_levels
    raw = assign_levels(boxes)
    clamped = clamp_levels_to_window(feats, boxes, raw, strides,
                                     rows=32, span=32)
    raw_np, cl_np = np.asarray(raw), np.asarray(clamped)
    assert cl_np[0] > raw_np[0], (raw_np, cl_np)  # wide box bumped up
    assert cl_np[3] == raw_np[3], (raw_np, cl_np)  # control untouched
    assert np.all(cl_np >= raw_np)

    want = np.asarray(S.multilevel_roi_align(
        feats, boxes, bi, clamped, output_size=7, sampling_ratio=2,
        strides=strides))
    got = np.asarray(multilevel_roi_align_pallas(
        feats, boxes, bi, raw, output_size=7, sampling_ratio=2,
        strides=strides, rows=32, span=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # sanity: output is not zero-diluted
    assert np.all(np.abs(got).mean(axis=(1, 2, 3)) > 1e-3)


def test_bf16_path_error_bound(rng):
    """The bf16 fast path (maskless window + single-pass bf16 interpolation
    matmuls) must stay at the bf16 feature-quantization error order against
    the exact f32 oracle, and must not leak stale-window garbage."""
    from tpuseg.ops.pallas.roi_align_pl import clamp_levels_to_window

    feats, strides, boxes, bi, levels = _setup(rng)
    feats_bf = tuple(f.astype(jnp.bfloat16) for f in feats)
    # bf16 halves the itemsize -> doubles the column alignment, so the
    # kernel's internal window clamp can bump more boxes than for f32;
    # give the oracle the identically clamped levels
    lv = clamp_levels_to_window(feats_bf, boxes, levels, strides,
                                rows=32, span=32)
    want = np.asarray(S.multilevel_roi_align(
        feats, boxes, bi, lv, output_size=7, sampling_ratio=2,
        strides=strides))
    got = np.asarray(multilevel_roi_align_pallas(
        feats_bf, boxes, bi, levels, output_size=7, sampling_ratio=2,
        strides=strides, rows=32, span=32, interpret=True)
    ).astype(np.float32)
    # unit-scale N(0,1) features: bf16 eps is 2^-8; interpolation sums of
    # ~4 bf16 products keep the error at a few eps
    err = np.abs(got - want)
    assert np.isfinite(got).all()
    assert err.max() < 0.06, err.max()
    assert err.mean() < 0.005, err.mean()
