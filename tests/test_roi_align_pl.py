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
