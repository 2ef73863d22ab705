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
