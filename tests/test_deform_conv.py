import numpy as np
import jax.numpy as jnp

from tpuseg.ops.deform_conv import deform_conv2d


def np_deform_conv(x, offsets, mask, weight, bias, k, stride, pad, dil):
    b, h, w, cin = x.shape
    ho = (h + 2 * pad - dil * (k - 1) - 1) // stride + 1
    wo = (w + 2 * pad - dil * (k - 1) - 1) // stride + 1
    kk = k * k
    cout = weight.shape[-1]
    out = np.zeros((b, ho, wo, cout))
    off = offsets.reshape(b, ho, wo, kk, 2)
    m = mask.reshape(b, ho, wo, kk)

    def sample(img, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        val = np.zeros(img.shape[-1])
        for (yy, wy) in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
            for (xx, wx) in ((x0, 1 - (x_ - x0)), (x0 + 1, x_ - x0)):
                if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                    val += wy * wx * img[yy, xx]
        return val

    for bi in range(b):
        for yo in range(ho):
            for xo in range(wo):
                acc = np.zeros(cout)
                for t in range(kk):
                    i, j = t // k, t % k
                    sy = yo * stride - pad + i * dil + off[bi, yo, xo, t, 0]
                    sx = xo * stride - pad + j * dil + off[bi, yo, xo, t, 1]
                    v = sample(x[bi], sy, sx) * m[bi, yo, xo, t]
                    acc += v @ weight[i, j]
                out[bi, yo, xo] = acc + (bias if bias is not None else 0)
    return out


def test_deform_conv_matches_golden(rng):
    b, h, w, cin, cout, k = 1, 8, 9, 4, 6, 3
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offsets = (rng.standard_normal((b, h, w, 2 * k * k)) * 1.5).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, (b, h, w, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias)))
    want = np_deform_conv(x, offsets, mask, weight, bias, k, 1, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offsets_equals_conv(rng):
    """With zero offsets and mask=1, DCN == plain conv."""
    from tpuseg.nn import layers as L

    b, h, w, cin, cout, k = 2, 10, 10, 3, 5, 3
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    offsets = np.zeros((b, h, w, 2 * k * k), np.float32)
    mask = np.ones((b, h, w, k * k), np.float32)
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask),
        jnp.asarray(weight)))
    want = np.asarray(L.conv2d(jnp.asarray(x), {"weight": jnp.asarray(weight),
                                                "bias": None}, padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
