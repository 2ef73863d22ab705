"""Bilinear sampling primitives: RoIAlign, RoIPool, grid_sample.

TPU-native replacements for the reference's CUDA sampling ops:
  - detectron.jittor ``detectron/layers/roi_align.py`` (upstream
    csrc/cuda/ROIAlign_cuda.cu) — :func:`roi_align`
  - detectron.jittor ``detectron/layers/roi_pool.py`` — :func:`roi_pool`
  - Pose2Seg.jittor ``modeling/affine_align.py::affine_align_gpu``
    (torch ``affine_grid``+``grid_sample``) — :func:`grid_sample`,
    :func:`affine_align`

Layout is NHWC throughout (TPU-native; channels on the 128-lane axis).
Everything is statically shaped: N rois are processed as a padded [N, 4]
tensor; invalid rois produce zeros.

The implementations express the sparse gather as flat one-dimensional takes of
the feature map, which XLA lowers to dynamic-gather; a Pallas kernel for the
hot Mask R-CNN configuration lives in ``tpuseg/ops/pallas/roi_align_pl.py``
and is validated against this version.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_corners(y, x, height, width):
    """Corner indices + weights with ROIAlign_cuda.cu border semantics.

    Points with y < -1 or y > H (resp. x) contribute zero; otherwise
    coordinates clamp into the valid range and the four corners are
    (low, low+1) clipped to the border.
    Returns (idx4 [..., 4] linear h*W+w indices, w4 [..., 4] weights).
    """
    out_of_range = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = jnp.clip(y, 0.0, height - 1)
    x = jnp.clip(x, 0.0, width - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, height - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    w4 = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], axis=-1)
    w4 = jnp.where(out_of_range[..., None], 0.0, w4)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)
    idx4 = jnp.stack(
        [
            y0i * width + x0i,
            y0i * width + x1i,
            y1i * width + x0i,
            y1i * width + x1i,
        ],
        axis=-1,
    )
    return idx4, w4


def _bilinear_corners_zeropad(y, x, height, width):
    """Corner indices + weights with torch grid_sample zero-padding semantics.

    Each of the four corners contributes only if it lies inside the map;
    out-of-bounds corners are masked to weight 0 (no coordinate clamping).
    """
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = y0 + 1
    x1 = x0 + 1
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    w4 = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], axis=-1)
    ys = jnp.stack([y0, y0, y1, y1], axis=-1)
    xs = jnp.stack([x0, x1, x0, x1], axis=-1)
    inside = (ys >= 0) & (ys <= height - 1) & (xs >= 0) & (xs <= width - 1)
    w4 = jnp.where(inside, w4, 0.0)
    ysi = jnp.clip(ys, 0, height - 1).astype(jnp.int32)
    xsi = jnp.clip(xs, 0, width - 1).astype(jnp.int32)
    return ysi * width + xsi, w4


def _corners_1d(t, extent):
    """1-D half of :func:`_bilinear_corners` (same border semantics).

    Returns (idx2 [..., 2] int32, w2 [..., 2]); the 2-D corner weights are
    the outer product w2y x w2x and the 2-D linear indices are
    idx2y * width + idx2x, so a bilinear sample factorises into separable
    per-axis interpolation matrices.
    """
    oob = (t < -1.0) | (t > extent)
    t = jnp.clip(t, 0.0, extent - 1)
    t0 = jnp.floor(t)
    t1 = jnp.minimum(t0 + 1, extent - 1)
    lt = t - t0
    w2 = jnp.stack([1.0 - lt, lt], axis=-1)
    w2 = jnp.where(oob[..., None], 0.0, w2)
    return jnp.stack([t0, t1], axis=-1).astype(jnp.int32), w2


def _interp_matrix(coord, slot_valid, inv_g, extent, p, s):
    """Per-roi separable interpolation matrix A [n, p, extent].

    ``coord`` [n, p*s] holds the sample-point coordinates (feature units),
    ``slot_valid`` [n, p*s] masks slots beyond the roi's adaptive grid, and
    ``inv_g`` [n] is 1/g (the per-axis share of the bin average).
    A[i, b, e] = sum over bin b's live slots of the linear hat weight each
    sample places on feature row/col e, divided by g — so
    pooled = Ay @ F @ Ax^T reproduces sample-then-average exactly.
    """
    n = coord.shape[0]
    idx2, w2 = _corners_1d(coord, extent)  # [n, p*s, 2]
    w2 = jnp.where(slot_valid[..., None], w2, 0.0) * inv_g[:, None, None]
    oh = jax.nn.one_hot(idx2, extent, dtype=w2.dtype)  # [n, p*s, 2, E]
    a = jnp.einsum("nsk,nske->nse", w2, oh)  # [n, p*s, E]
    return a.reshape(n, p, s, extent).sum(axis=2)


def _gather_weighted(feat_flat_c, idx4, w4, compute_dtype=jnp.float32):
    """feat_flat_c: [H*W, C]; idx4/w4: [..., 4] -> [..., C]."""
    g = jnp.take(feat_flat_c, idx4, axis=0)  # [..., 4, C]
    return jnp.sum(
        g.astype(compute_dtype) * w4[..., None].astype(compute_dtype), axis=-2
    )


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "aligned", "chunk",
                     "group_size"),
)
def roi_align(
    features: jax.Array,
    rois: jax.Array,
    batch_idx: jax.Array,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    chunk: int = 256,
    group_size: int | None = None,
) -> jax.Array:
    """RoIAlign. features [B,H,W,C], rois [N,4] xyxy image coords -> [N,P,P,C].

    Semantics follow upstream ROIAlign_cuda.cu. ``sampling_ratio > 0`` uses a
    static per-bin grid; ``sampling_ratio == 0`` reproduces the reference's
    ADAPTIVE mode (per-roi grid = ceil(roi_extent / output_size) per axis) in
    static shapes: a static upper-bound lattice derived from the feature
    extent with per-roi sample masking and a weighted (sum / gh*gw) average —
    exact because no roi clipped to the canvas can need a denser grid than
    the bound. ``aligned=False`` reproduces maskrcnn-benchmark (no half-pixel
    offset, extents clamped to >= 1).

    ``group_size=R`` declares that ``batch_idx == repeat(arange(B), R)``
    (rois grouped contiguously per image, N == B*R) and routes the adaptive
    mode through a separable-matmul formulation: per-roi interpolation
    matrices Ay [P,H] / Ax [P,W] (bilinear hats x slot mask, bin-average
    folded in) so pooled = Ay @ F @ Ax^T — two MXU matmuls per roi instead
    of a [P*S, P*S] sample lattice whose gather (30 GB of intermediates at
    C4 geometry) the TPU compiler cannot schedule. Identical semantics;
    required for large-extent adaptive pooling on TPU.
    """
    b, h, w, c = features.shape
    n = rois.shape[0]
    p = output_size
    feat_flat = features.reshape(b * h * w, c)

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    if sampling_ratio > 0:
        s = sampling_ratio
        gh = gw = jnp.full((n,), s, jnp.float32)
    else:
        # adaptive: gh = ceil(roi_h / p) per roi (ROIAlign_cuda.cu ratio-0).
        # Static bound: an image-spanning roi needs ceil(extent / p) samples.
        s = -(-max(h, w) // p)
        gh = jnp.clip(jnp.ceil(roi_h / p), 1, s)
        gw = jnp.clip(jnp.ceil(roi_w / p), 1, s)

    # sample point offsets within a roi: (p*s) points per axis; slot i of
    # bin bb sits at bb + (i+0.5)/g bin-units (slots >= g are masked off)
    bins = jnp.arange(p, dtype=features.dtype)
    slots = jnp.arange(s, dtype=features.dtype)
    gy = bins[None, :, None] + (slots[None, None, :] + 0.5) / gh[:, None, None]
    gx = bins[None, :, None] + (slots[None, None, :] + 0.5) / gw[:, None, None]
    ys = (y1[:, None] + gy.reshape(n, p * s) * bin_h[:, None])
    xs = (x1[:, None] + gx.reshape(n, p * s) * bin_w[:, None])
    vy = jnp.broadcast_to(slots[None, None, :] < gh[:, None, None],
                          (n, p, s)).reshape(n, p * s)
    vx = jnp.broadcast_to(slots[None, None, :] < gw[:, None, None],
                          (n, p, s)).reshape(n, p * s)
    inv_count = 1.0 / (gh * gw)  # [N]

    if group_size is not None:  # separable-matmul path, any sampling ratio
        return _roi_align_matmul(features, ys, xs, vy, vx, 1.0 / gh, 1.0 / gw,
                                 group_size, p, s)

    def one_chunk(args):
        ys_c, xs_c, vy_c, vx_c, ic_c, bi_c = args  # [n_c, P*S] ..., [n_c]
        yy = ys_c[:, :, None]  # [n_c, PS, 1]
        xx = xs_c[:, None, :]  # [n_c, 1, PS]
        yy, xx = jnp.broadcast_arrays(yy, xx)
        idx4, w4 = _bilinear_corners(yy, xx, h, w)
        w4 = jnp.where((vy_c[:, :, None] & vx_c[:, None, :])[..., None],
                       w4, 0.0)
        idx4 = idx4 + (bi_c[:, None, None, None] * (h * w))
        out = _gather_weighted(feat_flat, idx4, w4)  # [n_c, PS, PS, C]
        nc = out.shape[0]
        out = out.reshape(nc, p, s, p, s, c).sum(axis=(2, 4))
        return (out * ic_c[:, None, None, None]).astype(features.dtype)

    pad = (-n) % chunk
    ys_p = jnp.pad(ys, ((0, pad), (0, 0)))
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    vy_p = jnp.pad(vy, ((0, pad), (0, 0)))
    vx_p = jnp.pad(vx, ((0, pad), (0, 0)))
    ic_p = jnp.pad(inv_count, ((0, pad),), constant_values=1.0)
    bi_p = jnp.pad(batch_idx.astype(jnp.int32), ((0, pad),))
    nchunks = (n + pad) // chunk
    out = jax.lax.map(
        one_chunk,
        (
            ys_p.reshape(nchunks, chunk, p * s),
            xs_p.reshape(nchunks, chunk, p * s),
            vy_p.reshape(nchunks, chunk, p * s),
            vx_p.reshape(nchunks, chunk, p * s),
            ic_p.reshape(nchunks, chunk),
            bi_p.reshape(nchunks, chunk),
        ),
    )
    return out.reshape(nchunks * chunk, p, p, c)[:n]


def _roi_align_matmul(features, ys, xs, vy, vx, inv_gh, inv_gw, group_size,
                      p, s):
    """Adaptive RoIAlign as pooled = Ay @ F @ Ax^T (see roi_align docstring).

    Rois must be grouped contiguously per image (``group_size`` per image).
    Chunks are aligned to image boundaries so each matmul reads exactly one
    image's feature map, fetched by chunk index — the map stays the
    stationary MXU operand instead of being re-gathered per roi.
    """
    b, h, w, c = features.shape
    n, ps = ys.shape
    r = group_size
    assert n == b * r, (n, b, r)
    dt = features.dtype

    # interpolation matrices in n-chunks (the one-hot transient is [nc,
    # p*s, 2, E]); totals are small ([N, P, E] f32)
    nc = min(512, n)
    padn = (-n) % nc
    def mk(args):
        co_y, vy_c, igh, co_x, vx_c, igw = args
        return (_interp_matrix(co_y, vy_c, igh, h, p, s),
                _interp_matrix(co_x, vx_c, igw, w, p, s))
    ay, ax = jax.lax.map(mk, tuple(
        jnp.pad(a, ((0, padn),) + ((0, 0),) * (a.ndim - 1)).reshape(
            (n + padn) // nc, nc, *a.shape[1:])
        for a in (ys, vy, inv_gh, xs, vx, inv_gw)))
    ay = ay.reshape(-1, p, h)[:n]
    ax = ax.reshape(-1, p, w)[:n]

    # image-aligned roi chunks: [B, R] -> [B * ceil(R/rc), rc]
    rc = min(64, r)
    padr = (-r) % rc
    ay_g = jnp.pad(ay.reshape(b, r, p, h), ((0, 0), (0, padr), (0, 0), (0, 0)))
    ax_g = jnp.pad(ax.reshape(b, r, p, w), ((0, 0), (0, padr), (0, 0), (0, 0)))
    ncr = (r + padr) // rc
    ay_ch = ay_g.reshape(b * ncr, rc, p, h)
    ax_ch = ax_g.reshape(b * ncr, rc, p, w)
    img_of_chunk = jnp.repeat(jnp.arange(b, dtype=jnp.int32), ncr)

    # contract x FIRST (w -> p shrinks the materialized intermediate by
    # w/h vs y-first) and store it in the feature dtype: the per-chunk
    # [rc, p, h, c] buffer is what this formulation is bound on — profile
    # (results/profile_c4.py) measured the y-first f32 variant at
    # 13.9 ms/img (9.6 GB/img of HBM round-trip at C4's 50x84x1024 map);
    # x-first + bf16 store cuts the traffic ~3.3x. bf16 storage adds only
    # feature-quantization-order error and only on the bf16 inference
    # path; f32 features keep an exact f32 chain.
    ft_all = features.transpose(0, 2, 1, 3).reshape(b, w, h * c)

    def one(args):
        ayc, axc, bi = args
        ft = jax.lax.dynamic_index_in_dim(
            ft_all, bi, axis=0, keepdims=False)  # [w, h*c]
        cols = jnp.einsum("rqw,wk->rqk", axc.astype(dt), ft,
                          preferred_element_type=dt)
        cols = cols.reshape(rc, p, h, c)
        out = jnp.einsum("rqhc,rph->rpqc", cols, ayc.astype(dt),
                         preferred_element_type=jnp.float32)
        return out.astype(dt)

    out = jax.lax.map(one, (ay_ch, ax_ch, img_of_chunk))
    return out.reshape(b, ncr * rc, p, p, c)[:, :r].reshape(n, p, p, c)


@functools.partial(jax.jit,
                   static_argnames=("output_size", "chunk", "oversample"))
def roi_pool(
    features: jax.Array,
    rois: jax.Array,
    batch_idx: jax.Array,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    chunk: int = 256,
    oversample: int | None = None,
) -> jax.Array:
    """RoIPool (max pooling; C4 models). Same I/O contract as roi_align.

    Follows ROIPool_cuda.cu exactly: integer bin boundaries
    ``[floor(b*bin) .. ceil((b+1)*bin))`` offset by the rounded RoI origin
    and clamped; empty bins yield 0. Each bin evaluates a static lattice of
    ``oversample`` candidate cells per axis with out-of-bin cells masked to
    -inf before the max — exact iff every bin spans <= oversample cells.
    The default derives oversample from the static feature extent
    (``ceil(max(h, w)/output_size) + 2`` covers even an image-spanning
    RoI's widest bin), so results are exact for every RoI. Pass a smaller
    value only as an explicit speed/exactness trade.
    """
    b, h, w, c = features.shape
    n = rois.shape[0]
    p = output_size
    feat_flat = features.reshape(b * h * w, c)

    x1 = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    # widest possible bin = ceil(extent/p) + 1 cells (floor/ceil boundary
    # expansion); +1 more for slack — all static, derived from the feature
    # shape
    s = oversample if oversample is not None else (-(-max(h, w) // p) + 2)
    bins = jnp.arange(p, dtype=jnp.int32)
    k = jnp.arange(s)

    def axis_lattice(start, roi_sz, extent):
        # [N, P] clamped integer bin boundaries. floor(b*sz/p) and
        # ceil((b+1)*sz/p) over integer sz are computed in exact integer
        # arithmetic (float eval is unstable: XLA's fused f32 contraction
        # can land (b+1)*sz/p just above an integer and ceil one row too
        # far — observed on the CPU backend)
        lo = jnp.clip(bins[None, :] * roi_sz[:, None] // p
                      + start[:, None], 0, extent)
        hi = jnp.clip(-((-(bins[None, :] + 1) * roi_sz[:, None]) // p)
                      + start[:, None], 0, extent)
        idx = lo[:, :, None] + k[None, None, :]  # [N, P, S]
        valid = k[None, None, :] < (hi - lo)[:, :, None]
        return jnp.clip(idx, 0, extent - 1).astype(jnp.int32), valid

    ys, yv = axis_lattice(y1, roi_h, h)  # [N, P, S]
    xs, xv = axis_lattice(x1, roi_w, w)
    ys = ys.reshape(n, p * s)
    xs = xs.reshape(n, p * s)
    yv = yv.reshape(n, p * s)
    xv = xv.reshape(n, p * s)

    def one_chunk(args):
        ys_c, xs_c, yv_c, xv_c, bi_c = args
        lin = (
            bi_c[:, None, None] * (h * w)
            + ys_c[:, :, None] * w
            + xs_c[:, None, :]
        )  # [nc, PS, PS]
        g = jnp.take(feat_flat, lin, axis=0)  # [nc, PS, PS, C]
        m = (yv_c[:, :, None] & xv_c[:, None, :])[..., None]
        g = jnp.where(m, g, -jnp.inf)
        nc = g.shape[0]
        out = g.reshape(nc, p, s, p, s, c).max(axis=(2, 4))
        return jnp.where(jnp.isfinite(out), out, 0.0)  # empty bins -> 0

    pad = (-n) % chunk
    ys_p = jnp.pad(ys, ((0, pad), (0, 0)))
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    yv_p = jnp.pad(yv, ((0, pad), (0, 0)))
    xv_p = jnp.pad(xv, ((0, pad), (0, 0)))
    bi_p = jnp.pad(batch_idx.astype(jnp.int32), ((0, pad),))
    nchunks = (n + pad) // chunk
    out = jax.lax.map(
        one_chunk,
        (
            ys_p.reshape(nchunks, chunk, p * s),
            xs_p.reshape(nchunks, chunk, p * s),
            yv_p.reshape(nchunks, chunk, p * s),
            xv_p.reshape(nchunks, chunk, p * s),
            bi_p.reshape(nchunks, chunk),
        ),
    )
    return out.reshape(nchunks * chunk, p, p, c)[:n]


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "strides", "chunk"),
)
def multilevel_roi_align(
    feats: tuple,
    boxes: jax.Array,
    batch_idx: jax.Array,
    levels: jax.Array,
    output_size: int = 7,
    sampling_ratio: int = 2,
    strides: tuple = (4, 8, 16, 32),
    chunk: int = 256,
) -> jax.Array:
    """FPN pooler: each box pooled from its assigned level, ONE fused gather.

    feats: tuple of [B, Hl, Wl, C] maps; levels [N] in [0, L). Equivalent to
    per-level :func:`roi_align` + one-hot sum (detectron Pooler semantics)
    but gathers once from a concatenated flat pyramid — 1/L the gather
    volume of the masking approach.
    """
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = boxes.shape[0]
    p = output_size
    s = sampling_ratio
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in feats], axis=1
    )  # [B, sum(Hl*Wl), C]
    total = flat.shape[1]
    flat = flat.reshape(b * total, c)
    level_off = np.cumsum([0] + [h * w for h, w in shapes])[:-1]

    hs = jnp.asarray([h for h, _ in shapes], boxes.dtype)
    ws = jnp.asarray([w for _, w in shapes], boxes.dtype)
    offs = jnp.asarray(level_off, jnp.int32)
    scales = jnp.asarray([1.0 / st for st in strides], boxes.dtype)

    lvl_h = hs[levels]  # [N]
    lvl_w = ws[levels]
    lvl_off = offs[levels]
    lvl_scale = scales[levels]

    x1 = boxes[:, 0] * lvl_scale
    y1 = boxes[:, 1] * lvl_scale
    x2 = boxes[:, 2] * lvl_scale
    y2 = boxes[:, 3] * lvl_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    grid = (jnp.arange(p * s, dtype=boxes.dtype) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / p)[:, None]  # [N, PS]
    xs = x1[:, None] + grid[None, :] * (roi_w / p)[:, None]

    base = batch_idx.astype(jnp.int32) * total + lvl_off  # [N]

    def one_chunk(args):
        ys_c, xs_c, base_c, h_c, w_c = args
        yy = jnp.broadcast_to(ys_c[:, :, None], ys_c.shape + (p * s,))
        xx = jnp.broadcast_to(xs_c[:, None, :], ys_c.shape + (p * s,))
        h3 = h_c[:, None, None]
        w3 = w_c[:, None, None]
        # bilinear with per-box dynamic extents (ROIAlign border semantics)
        oob = (yy < -1.0) | (yy > h3) | (xx < -1.0) | (xx > w3)
        y = jnp.clip(yy, 0.0, h3 - 1)
        x = jnp.clip(xx, 0.0, w3 - 1)
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        y1i = jnp.minimum(y0 + 1, h3 - 1)
        x1i = jnp.minimum(x0 + 1, w3 - 1)
        ly = y - y0
        lx = x - x0
        hy = 1.0 - ly
        hx = 1.0 - lx
        w4 = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], -1)
        w4 = jnp.where(oob[..., None], 0.0, w4)
        yi = jnp.stack([y0, y0, y1i, y1i], -1).astype(jnp.int32)
        xi = jnp.stack([x0, x1i, x0, x1i], -1).astype(jnp.int32)
        idx4 = base_c[:, None, None, None] + yi * w3.astype(jnp.int32)[..., None] + xi
        out = _gather_weighted(flat, idx4, w4)
        nc = out.shape[0]
        return out.reshape(nc, p, s, p, s, c).mean(axis=(2, 4)).astype(
            feats[0].dtype)

    pad = (-n) % chunk
    args = (
        jnp.pad(ys, ((0, pad), (0, 0))),
        jnp.pad(xs, ((0, pad), (0, 0))),
        jnp.pad(base, ((0, pad),)),
        jnp.pad(lvl_h, ((0, pad),), constant_values=1),
        jnp.pad(lvl_w, ((0, pad),), constant_values=1),
    )
    nchunks = (n + pad) // chunk
    out = jax.lax.map(
        one_chunk, tuple(a.reshape((nchunks, chunk) + a.shape[1:]) for a in args)
    )
    return out.reshape(nchunks * chunk, p, p, c)[:n]


# grid_sample sources with h*w*C at or below this take the dense one-hot
# matmul path (MXU) instead of per-sample gathers; tests flip it to 0 to
# compare both paths
_DENSE_GRID_SAMPLE_MAX = 16384


def grid_sample(
    features: jax.Array, grid: jax.Array, align_corners: bool = False
) -> jax.Array:
    """torch-style bilinear grid_sample, zero padding.

    features [B,H,W,C]; grid [B,Hg,Wg,2] with (x, y) in [-1, 1].
    Reference: Pose2Seg's affine_align_gpu uses the framework grid_sample.
    """
    b, h, w, c = features.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    if h * w * c <= _DENSE_GRID_SAMPLE_MAX:
        # dense one-hot contraction: for small sources the per-sample
        # 4-corner gathers (1..C lanes wide) are TPU-hostile — the
        # Pose2Seg paste (64 people x 256^2 samples from 64x64x1 maps)
        # costs 210 ms as gathers vs ~2 ms as matmuls. Zero-padding
        # factors per axis: a corner is in-bounds iff its row AND column
        # are, so masked row/column one-hot matrices reproduce
        # _bilinear_corners_zeropad exactly.
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = (y - y0).astype(jnp.float32)
        fx = (x - x0).astype(jnp.float32)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        y1i = y0i + 1
        x1i = x0i + 1
        ih = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, h), 3)
        iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)
        wy0 = jnp.where((y0i >= 0) & (y0i <= h - 1), 1.0 - fy, 0.0)
        wy1 = jnp.where((y1i >= 0) & (y1i <= h - 1), fy, 0.0)
        wx0 = jnp.where((x0i >= 0) & (x0i <= w - 1), 1.0 - fx, 0.0)
        wx1 = jnp.where((x1i >= 0) & (x1i <= w - 1), fx, 0.0)
        ohy = ((ih == y0i[..., None]).astype(jnp.float32) * wy0[..., None]
               + (ih == y1i[..., None]).astype(jnp.float32) * wy1[..., None])
        ohx = ((iw == x0i[..., None]).astype(jnp.float32) * wx0[..., None]
               + (iw == x1i[..., None]).astype(jnp.float32) * wx1[..., None])
        featr = features.astype(jnp.float32).reshape(b, h, w * c)
        tmp = jnp.einsum("bijh,bhx->bijx", ohy, featr,
                         precision=jax.lax.Precision.HIGHEST)
        tmp = tmp.reshape(tmp.shape[:3] + (w, c))
        out = jnp.einsum("bijw,bijwc->bijc", ohx, tmp,
                         precision=jax.lax.Precision.HIGHEST)
        return out.astype(features.dtype)
    idx4, w4 = _bilinear_corners_zeropad(y, x, h, w)

    def per_image(feat, idx4_i, w4_i):
        return _gather_weighted(feat.reshape(h * w, c), idx4_i, w4_i)

    out = jax.vmap(per_image)(features, idx4, w4)
    return out.astype(features.dtype)


def affine_grid(theta: jax.Array, out_h: int, out_w: int, align_corners=False):
    """torch.nn.functional.affine_grid: theta [B,2,3] -> grid [B,H,W,2]."""
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, out_w)
        ys = jnp.linspace(-1.0, 1.0, out_h)
    else:
        xs = (jnp.arange(out_w) * 2.0 + 1.0) / out_w - 1.0
        ys = (jnp.arange(out_h) * 2.0 + 1.0) / out_h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # [H, W, 3]
    return jnp.einsum("hwk,bjk->bhwj", base, theta)


# --------------------------------------------------------------------------
# Windowed point sampling (shared TPU fast path; also used by deform_conv)
# --------------------------------------------------------------------------

_WIN_RY, _WIN_RX = 32, 32  # window rows/cols for sample_cols_windowed
# feature maps above this (padded) byte size can't sit VMEM-resident for
# the window kernel; callers fall back to the gather formulation
_WIN_VMEM_BUDGET = 10 * 2**20


def _axis_window(coords, extent, r, align, max_base=None):
    """Per-tile window origin + per-sample in-window flag for one axis.

    coords [B, nt, T]; a sample's hat support is {floor(c), floor(c)+1} ∩
    [0, extent). ``max_base`` is the largest allowed origin — when the
    axis is padded so aligned windows can reach the bottom rows, it is
    already a multiple of ``align`` (else align-down of extent-r would
    strand the last rows outside every window: measured 3485/42849
    always-escaping samples on the 69x69 stage at ZERO offsets, which sent
    the whole batch down the dense fallback). Returns (base [B, nt] int32,
    in_window [B, nt, T] bool — vacuously true for samples with no support
    on this axis)."""
    if max_base is None:
        max_base = max(extent - r, 0)
    c0 = jnp.floor(coords)
    has = (coords > -1.0) & (coords < extent)
    lo = jnp.clip(c0, 0, extent - 1)
    hi = jnp.clip(c0 + 1, 0, extent - 1)
    base = jnp.min(jnp.where(has, lo, extent), axis=-1)
    base = jnp.clip(base, 0, max_base)
    base = ((base.astype(jnp.int32) // align) * align)
    bb = base[..., None].astype(jnp.float32)
    in_w = (~has) | ((lo >= bb) & (hi <= bb + (r - 1)))
    return base, in_w


def _cols_gather_flat(features, sy, sx):
    """Gather formulation of point sampling (zero-padding border):
    features [B,h,w,c], sy/sx [B,S] pixel coords -> [B,S,c] f32. The
    reference semantics for the windowed path and its backward rule."""
    b, h, w, c = features.shape
    idx4, w4 = _bilinear_corners_zeropad(
        sy.astype(jnp.float32), sx.astype(jnp.float32), h, w)
    return jax.vmap(_gather_weighted)(
        features.reshape(b, h * w, c).astype(jnp.float32), idx4, w4)


@jax.custom_vjp
def _cols_gather_scan(features, sy, sx):
    """_cols_gather_flat with a memory-safe VJP: one whole-S ``jax.vjp``
    materialises a [B, S, 4, c] broadcast temp (4.3 GB at Pose2Seg's
    16x16x64x64x256 align), so the backward scans sample chunks,
    recomputing per-chunk and accumulating d_features."""
    return _cols_gather_flat(features, sy, sx)


def _cgs_fwd(features, sy, sx):
    return _cols_gather_flat(features, sy, sx), (features, sy, sx)


def _cgs_bwd(res, dcols, chunk=4096):
    features, sy, sx = res
    b, h, w, c = features.shape
    s = sy.shape[1]
    f32 = jnp.float32
    ff = features.reshape(b, h * w, c).astype(f32)
    s_pad = -(-s // chunk) * chunk

    def flat(a):
        a = jnp.pad(a.astype(f32), ((0, 0), (0, s_pad - s)))
        return a.reshape(b, -1, chunk).transpose(1, 0, 2)

    dc = jnp.pad(dcols.astype(f32), ((0, 0), (0, s_pad - s), (0, 0)))
    dc = dc.reshape(b, -1, chunk, c).transpose(1, 0, 2, 3)

    def chunk_cols(ff_, syk, sxk):
        idx4, w4 = _bilinear_corners_zeropad(syk, sxk, h, w)
        return jax.vmap(_gather_weighted)(ff_, idx4, w4)

    def step(df_acc, args):
        syk, sxk, dck = args
        dfk, dsyk, dsxk = jax.vjp(chunk_cols, ff, syk, sxk)[1](dck)
        return df_acc + dfk, (dsyk, dsxk)

    df, (dsy, dsx) = jax.lax.scan(
        step, jnp.zeros_like(ff), (flat(sy), flat(sx), dc))

    def unflat(a, ref):
        a = a.transpose(1, 0, 2).reshape(b, s_pad)[:, :s]
        return a.astype(ref.dtype)

    return (df.reshape(features.shape).astype(features.dtype),
            unflat(dsy, sy), unflat(dsx, sx))


_cols_gather_scan.defvjp(_cgs_fwd, _cgs_bwd)


def _sample_cols_windowed_impl(features, sy, sx, esc_budget, interpret,
                               ry, rx):
    from tpuseg.ops.pallas.dcn_pl import dcn_sample_windowed, hat_matrix

    b, h, w, c = features.shape
    _, nt, t = sy.shape
    s = nt * t
    # x window origins must keep the kernel's lane-slice offset (xb*c)
    # 128-aligned
    ax = 128 // int(np.gcd(c, 128))
    # pad the map so ALIGNED window origins can still cover the bottom
    # rows / rightmost columns (aligning the x max_base down instead would
    # strand (w-rx) % ax columns outside every window as always-escaping
    # samples); padded cells are zero = the zero-pad border contribution
    h_pad = ((max(h - ry, 0) + 7) // 8) * 8 + ry
    w_pad = ((max(w - rx, 0) + ax - 1) // ax) * ax + rx
    fp = jnp.pad(features,
                 ((0, 0), (0, h_pad - h), (0, w_pad - w), (0, 0)))
    syf = sy.astype(jnp.float32)
    sxf = sx.astype(jnp.float32)
    ybase, in_y = _axis_window(syf, h, ry, 8, max_base=h_pad - ry)
    xbase, in_x = _axis_window(sxf, w, rx, ax, max_base=w_pad - rx)
    in_w = in_y & in_x
    esc = (~in_w) & (syf > -1.0) & (syf < h) & (sxf > -1.0) & (sxf < w)
    cnt = esc.reshape(b, s).sum(-1)
    eb = min(esc_budget, s)

    def windowed():
        wdt = features.dtype
        wy = hat_matrix(syf - ybase[..., None].astype(jnp.float32), ry,
                        dtype=jnp.float32)
        wy = (wy * in_w.astype(jnp.float32)[..., None]).astype(wdt)
        wx = hat_matrix(sxf - xbase[..., None].astype(jnp.float32), rx,
                        dtype=wdt)
        cols = dcn_sample_windowed(fp, wy, wx, ybase, xbase,
                                   interpret=interpret)

        def correct(cols):
            # exact values for escaped samples, scattered over the zeroed
            # rows the kernel produced for them
            idx = jax.vmap(lambda e: jnp.nonzero(
                e, size=eb, fill_value=s)[0])(esc.reshape(b, s))
            take = lambda a: jnp.take_along_axis(
                a.reshape(b, s), jnp.minimum(idx, s - 1), 1)
            vals = _cols_gather_flat(features, take(syf), take(sxf))
            flat = cols.reshape(b, s, c)
            flat = jax.vmap(
                lambda f, i, v: f.at[i].set(v, mode="drop"))(
                    flat, idx, vals)
            return flat.reshape(b, nt, t, c)

        return jax.lax.cond(jnp.max(cnt) > 0, correct, lambda x: x, cols)

    def dense():
        return _cols_gather_scan(
            features, syf.reshape(b, s), sxf.reshape(b, s)
        ).reshape(b, nt, t, c)

    return jax.lax.cond(jnp.max(cnt) <= eb, windowed, dense)


def sample_cols_windowed(features, sy, sx, esc_budget=4096, interpret=False,
                         ry=_WIN_RY, rx=_WIN_RX):
    """Window-limited bilinear point sampling on the MXU.

    features [B,h,w,c]; sy/sx [B,nt,T] pixel coords, pre-tiled so each
    tile's T samples are spatially coherent (the caller's job — e.g.
    8x8 output blocks of an affine crop). Each tile contracts only a
    [ry, rx*c] window of the map (Pallas kernel, map VMEM-resident per
    image); samples whose 2x2 support escapes their tile's window get
    exact gather values scattered over the kernel's zeros, and a batch
    with more than ``esc_budget`` escapes falls back to the full gather
    formulation. Zero-padding border semantics (torch grid_sample
    padding_mode='zeros'). Differentiable throughout: the window kernel
    carries a transposed-kernel VJP (dcn_pl._make_win_bwd_kernel), the
    escape correction is plain (small) autodiff, and the dense fallback
    scans sample chunks (_cols_gather_scan). Returns [B,nt,T,c] f32.

    ``ry``/``rx`` size the window. Caution before tuning them: tile
    merges that grow the window were BOTH measured losers on chip (see
    affine_align) — rx scales the per-sample VPU x-reduction (8x16
    blocks + rx=48: 1.5x MACs, Pose2Seg 130 -> 106 img/s) and ry-only
    growth is neutral because the kernel is VPU/DMA-bound, not
    MXU-bound.
    """
    w = features.shape[2]
    if rx > w:
        # the y axis is padded so ry > h is legal; x is not — the kernel
        # lane-slices [xb*c, rx*c) out of a w*c-wide block
        raise ValueError(
            f"rx={rx} exceeds the feature map width {w}: the kernel "
            "would lane-slice past the map block")
    return _sample_cols_windowed_impl(features, sy, sx, esc_budget,
                                      interpret, ry, rx)


def _affine_align_eligible(h, w, c, out_size, itemsize):
    """The windowed sampler pays off when the map is big enough that the
    dense one-hot path is out of the question but still fits VMEM."""
    h_pad = ((max(h - _WIN_RY, 0) + 7) // 8) * 8 + _WIN_RY
    return (out_size % 8 == 0 and h >= _WIN_RY and w >= _WIN_RX
            and c % 128 == 0
            and h * w * c > _DENSE_GRID_SAMPLE_MAX
            and h_pad * w * c * itemsize <= _WIN_VMEM_BUDGET)


def affine_align(
    features: jax.Array,
    theta: jax.Array,
    out_size: int,
    align_corners: bool = False,
) -> jax.Array:
    """Pose2Seg AffineAlign: crop per-person aligned windows.

    features [B,H,W,C]; theta [B,N,2,3] normalized affine matrices
    (one per person slot, padded) -> [B,N,out,out,C].

    For big-but-VMEM-resident maps (the Pose2Seg bf16 geometry,
    128x128x256) the per-sample gathers are HBM-bound — 87 ms of the
    192 ms pipeline (results/profile_pose2seg.py). Affine crop samples
    are spatially coherent, so 8x8 output blocks route through
    :func:`sample_cols_windowed` ([32, 32*C] windows on the MXU); crops
    whose scale outruns the window slack self-correct via the escape
    path (Pose2Seg's scale is bounded by the person fitting the canvas:
    <= ~2 source px per output px at 128->64).
    """
    b, h, w, c = features.shape
    n = theta.shape[1]
    grid = affine_grid(
        theta.reshape(b * n, 2, 3), out_size, out_size, align_corners
    ).reshape(b, n, out_size, out_size, 2)
    if _affine_align_eligible(h, w, c, out_size, features.dtype.itemsize):
        from tpuseg.ops import pallas as pallas_pkg

        gx, gy = grid[..., 0], grid[..., 1]
        if align_corners:
            x = (gx + 1.0) * 0.5 * (w - 1)
            y = (gy + 1.0) * 0.5 * (h - 1)
        else:
            x = ((gx + 1.0) * w - 1.0) * 0.5
            y = ((gy + 1.0) * h - 1.0) * 0.5
        o = out_size
        # 8x8 output blocks with the default 32x32 window. Two measured
        # negative results on chip (round 5, Pose2Seg bs=16 geometry) so
        # tile-merging is not retried: (a) 8x16 blocks + rx=48 (2x MXU
        # M-fill, 1.5x MACs): 130 -> 106 img/s — the per-sample VPU
        # x-reduction scales with Rx and dominates; (b) 16x8 blocks +
        # ry=48 (2x M-fill, 1.5x MXU MACs, VPU unchanged): 128.4 ~
        # neutral — the kernel is VPU/DMA-bound, not MXU-bound, so
        # filling the matmul M-dim buys nothing.
        by, bx, ry = 8, 8, _WIN_RY

        def tile(a):  # [B, N, O, O] -> [B, N*(O/by)*(O/bx), by*bx]
            a = a.reshape(b, n, o // by, by, o // bx, bx)
            return a.transpose(0, 1, 2, 4, 3, 5).reshape(
                b, n * (o // by) * (o // bx), by * bx)

        interp = (pallas_pkg.pallas_interpret()
                  or jax.default_backend() != "tpu")
        cols = sample_cols_windowed(features, tile(y), tile(x),
                                    interpret=interp, ry=ry)
        cols = cols.reshape(b, n, o // by, o // bx, by, bx, c)
        out = cols.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, n, o, o, c)
        return out.astype(features.dtype)
    # vmap over the person axis with the feature map SHARED: an explicit
    # jnp.repeat(features, n) would materialize an N-fold copy of the map
    # in HBM (256 MB/image at Pose2Seg's 512 canvas, max_people=16) just
    # to bilinear-sample N small crops — broadcasting through vmap lets
    # XLA gather/contract from the single copy
    out = jax.vmap(lambda g: grid_sample(features, g, align_corners),
                   in_axes=1, out_axes=1)(grid)
    return out  # [B, N, out, out, C]
