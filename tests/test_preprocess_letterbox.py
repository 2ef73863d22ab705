"""letterbox_preprocess: the separable-matmul form must reproduce the
gather formulation it replaced, bit-comparably (both exact f32)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.ops.preprocess import letterbox_preprocess


def _gather_letterbox(images_u8, hw, size):
    """The original per-pixel-gather implementation (test oracle)."""
    from tpuseg.ops.sampling import _bilinear_corners, _gather_weighted

    b, ih, iw, c = images_u8.shape
    h = hw[:, 0].astype(jnp.float32)
    w = hw[:, 1].astype(jnp.float32)
    scale = size / jnp.maximum(h, w)
    pad_y = (size - h * scale) * 0.5
    pad_x = (size - w * scale) * 0.5
    yy = jnp.arange(size, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    sy = (yy + 0.5 - pad_y[:, None, None]) / scale[:, None, None] - 0.5
    sx = (xx + 0.5 - pad_x[:, None, None]) / scale[:, None, None] - 0.5
    sy = jnp.broadcast_to(sy, (b, size, size))
    sx = jnp.broadcast_to(sx, (b, size, size))
    inside = ((sy > -1.0) & (sy < h[:, None, None])
              & (sx > -1.0) & (sx < w[:, None, None]))
    sy_c = jnp.clip(sy, 0.0, jnp.maximum(h[:, None, None] - 1.0, 0.0))
    sx_c = jnp.clip(sx, 0.0, jnp.maximum(w[:, None, None] - 1.0, 0.0))
    idx4, w4 = _bilinear_corners(sy_c, sx_c, ih, iw)

    def per_image(feat, idx4_i, w4_i):
        return _gather_weighted(feat.reshape(ih * iw, c), idx4_i, w4_i)

    out = jax.vmap(per_image)(images_u8.astype(jnp.float32), idx4, w4) / 255.0
    return jnp.where(inside[..., None], out, 0.5)


def test_letterbox_matmul_matches_gather_oracle(rng):
    imgs = rng.integers(0, 255, (3, 120, 160, 3)).astype(np.uint8)
    # per-image true sizes: landscape, portrait (padded), square-ish
    hw = np.asarray([[120, 160], [120, 80], [90, 100]], np.int32)
    for i, (h, w) in enumerate(hw):
        imgs[i, h:, :, :] = 0
        imgs[i, :, w:, :] = 0
    got = np.asarray(letterbox_preprocess(
        jnp.asarray(imgs), jnp.asarray(hw), size=96))
    want = np.asarray(_gather_letterbox(
        jnp.asarray(imgs), jnp.asarray(hw), 96))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # gray padding present for the portrait image's side bars
    assert np.allclose(got[1, :, :10], 0.5)
    # content region is not gray
    assert np.abs(got[0, 40:50, 40:50] - 0.5).max() > 0.05
