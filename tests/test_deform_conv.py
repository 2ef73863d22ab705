import numpy as np
import jax.numpy as jnp

from tpuseg.ops.deform_conv import dcn_block, deform_conv2d


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


def test_dcn_offset_mask_channel_layout():
    """Pins the conv_offset_mask channel contract (PARITY.md caveat 4).

    DCNv2's CUDA `modulated_deformable_im2col` reads the offset tensor
    INTERLEAVED: channel 2t = dy of tap t, channel 2t+1 = dx of tap t
    (`data_offset_h_ptr = (2 * (i*kw + j)) * H*W + ...`), and the
    modulation mask occupies the LAST k*k channels of the 3*k*k offset-conv
    output. (Upstream yolact's `o1, o2, mask = chunk(3); cat((o1, o2))` is
    a channel shuffle the trained offset-conv weights absorb — the binary
    contract the kernel sees is the interleaved one pinned here, identical
    to torchvision.ops.deform_conv2d's documented layout.)

    Probe: identity weight on the center tap of a ramp image. dy=+1 on the
    center tap must shift rows; dx=+1 must shift columns; a mask value on
    the center tap must scale the output.
    """
    k, kk = 3, 9
    h = w = 8
    center = 4  # tap index (1,1) of a 3x3 kernel
    ramp_y = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))
    ramp_x = np.tile(np.arange(w, dtype=np.float32)[None, :], (h, 1))
    weight = np.zeros((k, k, 1, 1), np.float32)
    weight[1, 1, 0, 0] = 1.0  # identity: output = center-tap sample

    def run(img, dy, dx, mval):
        offsets = np.zeros((1, h, w, 2 * kk), np.float32)
        offsets[..., 2 * center] = dy      # even channel of tap t -> dy
        offsets[..., 2 * center + 1] = dx  # odd channel -> dx
        mask = np.ones((1, h, w, kk), np.float32)
        mask[..., center] = mval
        out = deform_conv2d(
            jnp.asarray(img[None, :, :, None]), jnp.asarray(offsets),
            jnp.asarray(mask), jnp.asarray(weight))
        return np.asarray(out)[0, :, :, 0]

    # dy=+1: rows shift (interior; border rows sample zero-padding)
    got = run(ramp_y, 1.0, 0.0, 1.0)
    np.testing.assert_allclose(got[:-1, :], ramp_y[1:, :], atol=1e-6)
    # dx=+1: columns shift
    got = run(ramp_x, 0.0, 1.0, 1.0)
    np.testing.assert_allclose(got[:, :-1], ramp_x[:, 1:], atol=1e-6)
    # mask on the center tap scales the output
    got = run(ramp_y, 0.0, 0.0, 0.5)
    np.testing.assert_allclose(got, 0.5 * ramp_y, atol=1e-6)


def test_dcn_block_splits_offset_conv_channels():
    """dcn_block: first 2*k*k offset-conv channels are the (interleaved)
    offsets, last k*k are mask LOGITS (sigmoid applied inside)."""
    from tpuseg.nn import layers as L

    k, kk = 3, 9
    h = w = 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((k, k, 2, 4)).astype(
        np.float32) * 0.1)
    # offset conv with ZERO weights and a chosen constant bias -> constant
    # offset/mask planes; compare against calling deform_conv2d directly
    bias = np.zeros(3 * kk, np.float32)
    bias[2 * 2] = 0.7        # dy of tap 2
    bias[2 * kk + 5] = 1.3   # mask logit of tap 5
    p = {
        "offset": {"weight": jnp.zeros((k, k, 2, 3 * kk), jnp.float32),
                   "bias": jnp.asarray(bias)},
        "weight": weight,
        "bias": None,
    }
    got = np.asarray(dcn_block(x, p))
    offsets = np.zeros((1, h, w, 2 * kk), np.float32)
    offsets[..., 2 * 2] = 0.7
    mask = np.full((1, h, w, kk), 0.5, np.float32)  # sigmoid(0)
    mask[..., 5] = 1.0 / (1.0 + np.exp(-1.3))
    want = np.asarray(deform_conv2d(
        x, jnp.asarray(offsets), jnp.asarray(mask), weight))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_deform_conv_onehot_matches_gather(rng):
    """Pallas one-hot sampling path (interpreted) == gather path, incl.
    far out-of-bounds offsets (zero-padding border) and stride/dilation."""
    for (h, w, cin, cout, stride, dil, oscale) in (
            (8, 9, 4, 6, 1, 1, 1.5),
            (10, 7, 8, 8, 2, 1, 3.0),
            (9, 9, 4, 4, 1, 2, 25.0),  # most samples fully outside
    ):
        b, k = 2, 3
        ho = (h + 2 * dil - dil * 2 - 1) // stride + 1
        wo = (w + 2 * dil - dil * 2 - 1) // stride + 1
        x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
        offsets = (rng.standard_normal((b, ho, wo, 2 * k * k)) *
                   oscale).astype(np.float32)
        mask = rng.uniform(0.2, 1.0, (b, ho, wo, k * k)).astype(np.float32)
        weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
        bias = rng.standard_normal(cout).astype(np.float32)
        args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask),
                jnp.asarray(weight), jnp.asarray(bias))
        kw = dict(stride=stride, padding=dil, dilation=dil)
        want = np.asarray(deform_conv2d(*args, method="gather", **kw))
        got = np.asarray(deform_conv2d(*args, method="onehot", **kw))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dcn_sample_pallas_matches_ref(rng):
    """dcn_sample kernel (interpret) == chunked jnp reference, with S not a
    multiple of the tile."""
    from tpuseg.ops.pallas.dcn_pl import (_dcn_sample_ref, dcn_sample,
                                          hat_matrix)

    b, h, w, c, s = 2, 7, 11, 4, 333
    feats = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-2, h + 1, (b, s)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-2, w + 1, (b, s)).astype(np.float32))
    wy = hat_matrix(sy, h, dtype=jnp.float32)
    wx = hat_matrix(sx, w, dtype=jnp.float32)
    want = np.asarray(_dcn_sample_ref(feats, wy, wx, chunk=64))
    got = np.asarray(dcn_sample(feats, wy, wx, True, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dcn_sample_grads_match_ref(rng):
    """custom_vjp backward == autodiff through the jnp reference."""
    from tpuseg.ops.pallas.dcn_pl import (_dcn_sample_ref, dcn_sample,
                                          hat_matrix)
    import jax

    b, h, w, c, s = 1, 5, 6, 3, 17
    feats = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, h, (b, s)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-1, w, (b, s)).astype(np.float32))
    wy = hat_matrix(sy, h, dtype=jnp.float32)
    wx = hat_matrix(sx, w, dtype=jnp.float32)

    def loss_k(f, a, bm):
        return jnp.sum(jnp.sin(dcn_sample(f, a, bm, True, True)))

    def loss_r(f, a, bm):
        return jnp.sum(jnp.sin(_dcn_sample_ref(f, a, bm, chunk=8)))

    g_k = jax.grad(loss_k, argnums=(0, 1, 2))(feats, wy, wx)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(feats, wy, wx)
    for a, b_ in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_deform_conv_windowed_matches_gather(rng):
    """Windowed kernel path (interpreted) == gather path on geometries that
    trigger windowing (h >= 32, w > 32): small offsets (pure window),
    mixed large offsets (escape correction), stride 2, and huge offsets
    everywhere (over-budget -> dense cond fallback)."""
    from tpuseg.ops import deform_conv as D

    b, k = 2, 3
    for (h, w, stride, oscale, n_big) in (
            (40, 48, 1, 1.5, 0),       # all in-window
            (40, 48, 1, 1.5, 30),      # some escapes -> exact correction
            (47, 41, 2, 1.0, 5),       # stride-2 geometry + a few escapes
    ):
        cin = cout = 4
        ho = (h + 2 - 2 - 1) // stride + 1
        wo = (w + 2 - 2 - 1) // stride + 1
        assert D._win_geometry(h, w, k * k, stride, 1) is not None
        x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
        offsets = (rng.standard_normal((b, ho, wo, 2 * k * k)) *
                   oscale).astype(np.float32)
        if n_big:
            flat = offsets.reshape(-1)
            pick = rng.choice(flat.size, n_big, replace=False)
            flat[pick] = rng.uniform(8, 25, n_big) * rng.choice(
                [-1, 1], n_big)
        mask = rng.uniform(0.2, 1.0, (b, ho, wo, k * k)).astype(np.float32)
        weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
        args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask),
                jnp.asarray(weight), None)
        kw = dict(stride=stride, padding=1, dilation=1)
        want = np.asarray(deform_conv2d(*args, method="gather", **kw))
        got = np.asarray(deform_conv2d(*args, method="onehot", **kw))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deform_conv_windowed_overflow_falls_back_dense(rng):
    """When more samples escape than the correction budget, the cond picks
    the dense kernel and the result is still exact."""
    from tpuseg.ops import deform_conv as D

    b, k, h, w, cin, cout = 1, 3, 40, 48, 4, 4
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    # every offset large: all samples escape their tile windows
    offsets = (rng.uniform(10, 20, (b, h, w, 2 * k * k)) *
               rng.choice([-1.0, 1.0], (b, h, w, 2 * k * k))
               ).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, (b, h, w, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    assert D._win_geometry(h, w, k * k, 1, 1) is not None
    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask),
            jnp.asarray(weight), None)
    want = np.asarray(deform_conv2d(*args, method="gather"))
    got = np.asarray(deform_conv2d(*args, method="onehot"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deform_conv_windowed_grads_match_gather(rng):
    """Gradients through the windowed custom-vjp path (x, offsets, mask,
    weight) == autodiff through the gather formulation."""
    import jax

    b, k, h, w, cin, cout = 1, 3, 40, 48, 3, 2
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    offsets = jnp.asarray(
        (rng.standard_normal((b, h, w, 2 * k * k)) * 1.5).astype(np.float32))
    mask = jnp.asarray(
        rng.uniform(0.2, 1.0, (b, h, w, k * k)).astype(np.float32))
    weight = jnp.asarray(
        rng.standard_normal((k, k, cin, cout)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, h, w, cout)).astype(np.float32))

    def loss(method):
        def f(x_, o_, m_, w_):
            out = deform_conv2d(x_, o_, m_, w_, None, method=method)
            return jnp.sum(out * cot)
        return f

    g_win = jax.grad(loss("onehot"), argnums=(0, 1, 2, 3))(
        x, offsets, mask, weight)
    g_ref = jax.grad(loss("gather"), argnums=(0, 1, 2, 3))(
        x, offsets, mask, weight)
    for a, bb, name in zip(g_win, g_ref, ("x", "offsets", "mask", "weight")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_deform_conv_windowed_c64_unaligned_width(rng):
    """c % 128 != 0 exercises the derived x-origin alignment (ax = 2 for
    c=64) and the width padding that keeps aligned windows covering the
    rightmost columns (aligning max_base down instead would strand them
    as always-escaping samples). Windowed onehot (interpret) must equal
    the gather formulation, including samples at the right edge."""
    b, h, w, cin = 1, 40, 37, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    k = 3
    kk = k * k
    ho = wo = None
    weight = jnp.asarray(
        rng.standard_normal((k, k, cin, 32)).astype(np.float32) * 0.1)
    ho, wo = h, w  # stride 1, padding 1
    offsets = jnp.asarray(
        rng.uniform(-1.5, 1.5, (b, ho, wo, 2 * kk)).astype(np.float32))
    mask = jnp.asarray(
        rng.uniform(0.2, 1.0, (b, ho, wo, kk)).astype(np.float32))

    got = deform_conv2d(x, offsets, mask, weight, method="onehot")
    want = deform_conv2d(x, offsets, mask, weight, method="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
