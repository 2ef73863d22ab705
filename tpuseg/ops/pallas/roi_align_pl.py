"""Pallas multi-level RoIAlign kernel (the north-star native kernel).

Replaces the XLA-gather pooler (tpuseg.ops.sampling.multilevel_roi_align)
on the hot Mask R-CNN path. Design:

  * FPN levels stay as separate [B, H_l, W_l', C] HBM buffers (W padded to a
    multiple of 8 for Mosaic slice alignment — no big flat-buffer copy).
  * The FPN level-assignment rule bounds every roi's extent on its own
    level, so a static ROWS x SPAN window always covers the roi + bilinear
    halo. Each grid step (one box) issues ONE strided 3-D DMA
    (rows x span x C) from its level, selected by four static branches.
  * Windows are double-buffered: step i waits for its own window while the
    DMA for box i+1 is already in flight (scalar-prefetched indices).
  * Bilinear resampling is SEPARABLE: sparse interpolation matrices
    Ay [PS, ROWS] / Ax [PS, SPAN] built from iota comparisons, applied as
    two small MXU matmuls + SxS bin averaging — zero scalar gathers.
  * Out-of-range samples (ROIAlign_cuda border semantics) zero out via the
    Ay/Ax rows, preserving the CUDA kernel's product semantics.
  * f32 features: masked window + HIGHEST-precision matmuls (exact f32
    interpolation, matches the jnp oracle to ~3e-7). bf16 features (the
    model's TPU inference dtype): single-pass bf16 matmuls + maskless
    window (stale data is annihilated by the exact-zero one-hot rows) —
    ~1.8x the f32-path throughput; error stays at the bf16 feature
    quantization order (bounded by test_bf16_path_error_bound).

Validated against the jnp pooler in interpret mode and on TPU
(tests/test_roi_align_pl.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_pair(p, s, rows, span, row_start, col_start, height, width,
                 x1, y1, bin_w, bin_h):
    """Folded interpolation matrices ay [P, ROWS] / ax [P, SPAN] (f32) for
    one roi — shared by the forward and backward kernels so the transpose
    is built from bit-identical weights."""
    ps = p * s
    grid = (
        jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)[:, 0]
        .astype(jnp.float32) + 0.5
    ) / s
    ys = y1 + grid * bin_h
    xs = x1 + grid * bin_w
    h_f = height.astype(jnp.float32)
    w_f = width.astype(jnp.float32)
    y_oob = (ys < -1.0) | (ys > h_f)
    x_oob = (xs < -1.0) | (xs > w_f)
    yc = jnp.clip(ys, 0.0, h_f - 1.0)
    xc = jnp.clip(xs, 0.0, w_f - 1.0)
    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    ly = yc - y0
    lx = xc - x0
    y0l = y0.astype(jnp.int32) - row_start
    x0l = x0.astype(jnp.int32) - col_start
    y1l = jnp.minimum(y0.astype(jnp.int32) + 1, height - 1) - row_start
    x1l = jnp.minimum(x0.astype(jnp.int32) + 1, width - 1) - col_start

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (ps, rows), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (ps, span), 1)
    wy0 = jnp.where(y_oob, 0.0, 1.0 - ly)
    wy1 = jnp.where(y_oob, 0.0, ly)
    wx0 = jnp.where(x_oob, 0.0, 1.0 - lx)
    wx1 = jnp.where(x_oob, 0.0, lx)
    ay = (
        (r_iota == y0l[:, None]).astype(jnp.float32) * wy0[:, None]
        + (r_iota == y1l[:, None]).astype(jnp.float32) * wy1[:, None]
    )
    ax = (
        (c_iota == x0l[:, None]).astype(jnp.float32) * wx0[:, None]
        + (c_iota == x1l[:, None]).astype(jnp.float32) * wx1[:, None]
    )
    # fold the s x s sample average into the interpolation matrices
    # (pooling is linear: mean_jk Ay_j T Ax_k^T = (mean_j Ay_j) T
    # (mean_k Ax_k)^T) -> matmul rows shrink ps -> p, s^2 FLOP cut
    ay = ay.reshape(p, s, rows).sum(axis=1) * (1.0 / s)  # [P, ROWS]
    ax = ax.reshape(p, s, span).sum(axis=1) * (1.0 / s)  # [P, SPAN]
    return ay, ax


def _make_kernel(p, s, rows, span, level_shapes, c, align, level_rows,
                 level_span, nbuf, group):
    """level_shapes: list of (H_l, W_l_padded) static per level;
    level_rows/level_span: per-level DMA window bounds (the canonical FPN
    assignment bounds roi extents on levels below the clamped top, so
    their windows are smaller than the worst case).

    Each grid step processes ``group`` rois (amortizing the per-step
    mechanics that dominate once the matmuls are tiny) with ``nbuf`` slot
    groups — (nbuf-1)*group window DMAs stay in flight while a step
    computes."""
    num_levels = len(level_shapes)
    ps = p * s

    def kernel(
        # scalar prefetch (whole arrays — needed for the DMA lookahead)
        level_ref,  # [N] int32
        bidx_ref,  # [N] int32
        row_start_ref,  # [N] int32
        col_start_ref,  # [N] int32 (aligned)
        # blocked per-step inputs
        hw_ref,  # [G, 1, 4] int32 SMEM: true (H, W, window_rows, window_span)
        boxf_ref,  # [G, 1, 4] f32 SMEM block: x1, y1, bin_w, bin_h (cells)
        *refs,
    ):
        lvl_refs = refs[:num_levels]
        out_ref = refs[num_levels]  # [G, p, p, c]
        tile_ref = refs[num_levels + 1]  # [nbuf, G, ROWS, SPAN, C] VMEM
        sems = refs[num_levels + 2]  # DMA sems [nbuf, G]

        i = pl.program_id(0)
        n = pl.num_programs(0)

        def issue(jstep, slot):
            for g in range(group):
                j = jstep * group + g
                lv = level_ref[j]
                bi = bidx_ref[j]
                r0 = row_start_ref[j]
                c0 = pl.multiple_of(col_start_ref[j], align)
                for li, (hl, wl) in enumerate(level_shapes):
                    rl = min(rows, hl, level_rows[li])
                    sl = min(span, wl, level_span[li])

                    @pl.when(lv == li)
                    def _():
                        pltpu.make_async_copy(
                            lvl_refs[li].at[
                                bi, pl.ds(r0, rl), pl.ds(c0, sl), :],
                            tile_ref.at[slot, g, pl.ds(0, rl),
                                        pl.ds(0, sl), :],
                            sems.at[slot, g],
                        ).start()

        def wait(jstep, slot):
            for g in range(group):
                j = jstep * group + g
                lv = level_ref[j]
                for li, (hl, wl) in enumerate(level_shapes):
                    rl = min(rows, hl, level_rows[li])
                    sl = min(span, wl, level_span[li])

                    @pl.when(lv == li)
                    def _():
                        pltpu.make_async_copy(
                            lvl_refs[li].at[0, pl.ds(0, rl), pl.ds(0, sl), :],
                            tile_ref.at[slot, g, pl.ds(0, rl),
                                        pl.ds(0, sl), :],
                            sems.at[slot, g],
                        ).wait()

        # bf16 features skip the per-roi window mask (below): the one-hot
        # interpolation rows are exact zeros outside the roi's window, so
        # stale finite data from earlier steps contributes exactly 0 — only
        # never-written VMEM could hold non-finite garbage, killed once here.
        small = jnp.dtype(tile_ref.dtype).itemsize <= 2

        @pl.when(i == 0)
        def _():
            if small:
                tile_ref[...] = jnp.zeros_like(tile_ref)
            issue(0, 0)
            for j in range(1, nbuf - 1):
                @pl.when(j < n)
                def _():
                    issue(j, j)

        @pl.when(i + nbuf - 1 < n)
        def _():
            issue(i + nbuf - 1, (i + nbuf - 1) % nbuf)

        wait(i, i % nbuf)

        for g in range(group):
            j_abs = i * group + g
            ay, ax = _interp_pair(
                p, s, rows, span, row_start_ref[j_abs], col_start_ref[j_abs],
                hw_ref[g, 0, 0], hw_ref[g, 0, 1], boxf_ref[g, 0, 0],
                boxf_ref[g, 0, 1], boxf_ref[g, 0, 2], boxf_ref[g, 0, 3])

            if small:
                # bf16 fast path: the features already carry bf16
                # quantization, so the interpolation matmuls run single-pass
                # bf16 (ay/ax rounding is the same order as the feature
                # quantization; bounded by tests/test_roi_align_pl.py::
                # test_bf16_path_error_bound). Stale window regions are
                # guarded by the exact-zero one-hot rows + step-0 zero-init
                # instead of a per-roi mask.
                tile = tile_ref[i % nbuf, g]  # [ROWS, SPAN, C] bf16
                tmp = jax.lax.dot_general(
                    ay.astype(tile.dtype), tile.reshape(rows, span * c),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(p, span, c)
                full = jax.lax.dot_general(
                    ax, tmp,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [Px, Py, C]
            else:
                # f32 path (exact f32 interp, used by the CPU/interpret
                # oracle tests): mask the tile to this box's DMA window —
                # regions beyond it hold stale/uninitialized data, and
                # 0-weight x NaN would poison the interpolation matmuls
                rl_d = hw_ref[g, 0, 2]
                sl_d = hw_ref[g, 0, 3]
                rmask = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, span), 0) < rl_d
                cmask = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, span), 1) < sl_d
                maskf = (rmask & cmask).astype(jnp.float32)
                tile = tile_ref[i % nbuf, g].astype(jnp.float32)
                tile = jnp.where(maskf[:, :, None] > 0, tile, 0.0)
                tmp = jax.lax.dot_general(
                    ay, tile.reshape(rows, span * c),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(p, span, c)
                full = jax.lax.dot_general(
                    ax, tmp,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [Px, Py, C]
            pooled = jnp.transpose(full, (1, 0, 2))
            out_ref[g] = pooled.astype(out_ref.dtype)

    return kernel


def _window_bounds(feats, rows: int, span: int):
    """Static per-level DMA window bounds + sublane alignment for a pyramid."""
    align = 32 // jnp.dtype(feats[0].dtype).itemsize
    shapes_pad = [
        (f.shape[1], f.shape[2] + (-f.shape[2]) % align) for f in feats
    ]
    n_lv = len(feats)
    lv_rows_b = tuple(
        (rows if li == n_lv - 1 else min(32, rows)) for li in range(n_lv))
    lv_span_b = tuple(
        (span if li == n_lv - 1 else min(32 + align, span))
        for li in range(n_lv))
    return align, shapes_pad, lv_rows_b, lv_span_b


def clamp_levels_to_window(
    feats: tuple,
    boxes: jax.Array,
    levels: jax.Array,
    strides: tuple = (4, 8, 16, 32),
    rows: int = 44,
    span: int = 64,
) -> jax.Array:
    """Bump a box to a coarser level when its extent + bilinear halo would
    not fit that level's static DMA window.

    The canonical sqrt(area) FPN rule (maskrcnn-benchmark LevelMapper) does
    not bound max(w, h): a 1333x40 box lands on stride-16 P4 needing ~85
    columns, beyond the fixed window — samples past it would pool as zeros.
    Each level up halves the extent, and the top level's window covers its
    whole map for canvases up to ~1400 px, so a fitting level always exists.
    Applied identically on the Pallas and jnp paths so they agree.
    """
    n_lv = len(feats)
    align, shapes_pad, lv_rows_b, lv_span_b = _window_bounds(feats, rows, span)

    # exact per-level fit test: recompute the window start the kernel would
    # use (incl. clipping + column alignment) and the last row/col any
    # bilinear corner can touch; fits iff that range is inside the window
    fits = []
    for li in range(n_lv):
        h_l = feats[li].shape[1]
        w_true = feats[li].shape[2]
        w_pad = shapes_pad[li][1]
        rl = min(rows, h_l, lv_rows_b[li])
        sl = min(span, w_pad, lv_span_b[li])
        scale = 1.0 / strides[li]
        x1 = boxes[:, 0].astype(jnp.float32) * scale
        y1 = boxes[:, 1].astype(jnp.float32) * scale
        x2e = x1 + jnp.maximum(boxes[:, 2].astype(jnp.float32) * scale - x1, 1.0)
        y2e = y1 + jnp.maximum(boxes[:, 3].astype(jnp.float32) * scale - y1, 1.0)
        r0 = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0, max(h_l - rl, 0))
        c0 = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0, max(w_pad - sl, 0))
        c0 = (c0 // align) * align
        rmax = jnp.minimum(jnp.floor(y2e).astype(jnp.int32) + 1, h_l - 1)
        cmax = jnp.minimum(jnp.floor(x2e).astype(jnp.int32) + 1, w_true - 1)
        fits.append((rmax - r0 + 1 <= rl) & (cmax - c0 + 1 <= sl))
    fits = jnp.stack(fits, axis=1)  # [N, L]
    li = jnp.arange(n_lv)
    cand = jnp.where(fits & (li[None, :] >= levels[:, None]), li[None, :], n_lv)
    return jnp.minimum(jnp.min(cand, axis=1), n_lv - 1).astype(jnp.int32)


def _make_bwd_kernel(p, s, rows, span, level_shapes, c, align, level_rows,
                     level_span, group, num_levels, small):
    """Transpose of the forward: per roi, d_tile = Ay^T dP Ax lands directly
    in [ROWS, SPAN, C] layout (two dot_generals, no transpose), then the
    window is accumulated into the per-level gradient buffer with a
    sequential read-modify-write DMA — the TPU grid executes grid steps in
    order, so overlapping roi windows accumulate without races (the CUDA
    kernel's atomicAdd equivalent)."""

    def kernel(
        level_ref, bidx_ref, row_start_ref, col_start_ref,  # scalar prefetch
        hw_ref, boxf_ref,  # [G,1,4] SMEM blocks
        dp_ref,  # [G, p, p, c] VMEM block (grad wrt pooled)
        *refs,
    ):
        # refs: num_levels aliased zero-init inputs (unused — the aliased
        # OUTPUT refs are the accumulators), num_levels out refs, scratch
        out_refs = refs[num_levels:2 * num_levels]
        win_ref = refs[2 * num_levels]  # [ROWS, SPAN, C] f32 VMEM
        sem = refs[2 * num_levels + 1]

        i = pl.program_id(0)
        for g in range(group):
            j_abs = i * group + g
            ay, ax = _interp_pair(
                p, s, rows, span, row_start_ref[j_abs], col_start_ref[j_abs],
                hw_ref[g, 0, 0], hw_ref[g, 0, 1], boxf_ref[g, 0, 0],
                boxf_ref[g, 0, 1], boxf_ref[g, 0, 2], boxf_ref[g, 0, 3])
            dp = dp_ref[g]  # [p, p, c]
            if small:
                # mirror the forward's single-pass bf16 matmuls
                dtmp = jax.lax.dot_general(
                    ax.astype(dp.dtype), dp,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [SPAN, p, c]
                d_tile = jax.lax.dot_general(
                    ay, dtmp,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [ROWS, SPAN, c]
            else:
                dpf = dp.astype(jnp.float32)
                dtmp = jax.lax.dot_general(
                    ax, dpf, dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                d_tile = jax.lax.dot_general(
                    ay, dtmp, dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            lv = level_ref[j_abs]
            bi = bidx_ref[j_abs]
            r0 = row_start_ref[j_abs]
            c0 = pl.multiple_of(col_start_ref[j_abs], align)
            for li, (hl, wl) in enumerate(level_shapes):
                rl = min(rows, hl, level_rows[li])
                sl = min(span, wl, level_span[li])

                @pl.when(lv == li)
                def _():
                    acc = out_refs[li]
                    pltpu.make_async_copy(
                        acc.at[bi, pl.ds(r0, rl), pl.ds(c0, sl), :],
                        win_ref.at[pl.ds(0, rl), pl.ds(0, sl), :],
                        sem).start()
                    pltpu.make_async_copy(
                        acc.at[bi, pl.ds(r0, rl), pl.ds(c0, sl), :],
                        win_ref.at[pl.ds(0, rl), pl.ds(0, sl), :],
                        sem).wait()
                    win_ref[pl.ds(0, rl), pl.ds(0, sl), :] = (
                        win_ref[pl.ds(0, rl), pl.ds(0, sl), :]
                        + d_tile[:rl, :sl, :])
                    pltpu.make_async_copy(
                        win_ref.at[pl.ds(0, rl), pl.ds(0, sl), :],
                        acc.at[bi, pl.ds(r0, rl), pl.ds(c0, sl), :],
                        sem).start()
                    pltpu.make_async_copy(
                        win_ref.at[pl.ds(0, rl), pl.ds(0, sl), :],
                        acc.at[bi, pl.ds(r0, rl), pl.ds(c0, sl), :],
                        sem).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "strides", "rows",
                     "span", "interpret", "group"),
)
def multilevel_roi_align_pallas_bwd(
    feats: tuple,
    boxes: jax.Array,
    batch_idx: jax.Array,
    levels: jax.Array,
    grad_pooled: jax.Array,  # [N, p, p, C]
    output_size: int = 7,
    sampling_ratio: int = 2,
    strides: tuple = (4, 8, 16, 32),
    rows: int = 44,
    span: int = 64,
    interpret: bool = False,
    group: int | None = None,
) -> tuple:
    """d(pooled)/d(feats) transpose of multilevel_roi_align_pallas: returns
    per-level feature gradients (same shapes/dtypes as ``feats``).

    Windows accumulate in f32 regardless of the feature dtype (many rois
    overlap the same cells; bf16 read-modify-write would drift), then cast
    to the feature dtype at the end. Replaces the jnp gather-VJP fallback,
    which XLA lowers to scatter-adds (~300 ms for 4096 res-14 rois vs
    ~20 ms here)."""
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = boxes.shape[0]
    p = output_size
    s = sampling_ratio
    small = jnp.dtype(feats[0].dtype).itemsize <= 2
    if group is None:
        group = 4 if small else 2
    (levels, batch_idx, row_start, col_start, hw, boxf, feats_p, shapes_pad,
     lv_rows_b, lv_span_b, rows, span, align, n_pad) = _prep(
        feats, boxes, batch_idx, levels, strides, rows, span, group, p)
    num_levels = len(feats)
    pad = n_pad - n
    gp = grad_pooled.reshape(n, p, p, c)
    if pad:
        gp = jnp.pad(gp, ((0, pad), (0, 0), (0, 0), (0, 0)))
    acc0 = [jnp.zeros((b, hl, wl, c), jnp.float32) for hl, wl in shapes_pad]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 1, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, p, p, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in acc0],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in acc0],
        scratch_shapes=[
            pltpu.VMEM((rows, span, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = _make_bwd_kernel(p, s, rows, span, shapes_pad, c, align,
                              lv_rows_b, lv_span_b, group, num_levels, small)
    # inputs: 4 scalar prefetch + hw + boxf + dp = indices 0..6; the L
    # aliased zero accumulators are inputs 7..7+L-1 -> outputs 0..L-1
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, hl, wl, c), jnp.float32)
                   for hl, wl in shapes_pad],
        input_output_aliases={7 + li: li for li in range(num_levels)},
        interpret=interpret,
    )(levels, batch_idx, row_start, col_start, hw, boxf, gp, *acc0)
    # strip the width alignment padding, restore the feature dtype
    return tuple(
        o[:, :, :f.shape[2], :].astype(f.dtype)
        for o, f in zip(outs, feats))


@functools.lru_cache(maxsize=16)
def make_differentiable_pooler(output_size: int, sampling_ratio: int,
                               strides: tuple, interpret: bool = False):
    """Pallas forward + jnp-transpose backward (the CUDA kernel's VJP:
    gradients flow to features only; boxes are non-differentiable, matching
    ROIAlign_cuda backward)."""
    from tpuseg.ops import sampling as _sampling

    @jax.custom_vjp
    def pooler(feats, boxes, batch_idx, levels):
        return multilevel_roi_align_pallas(
            feats, boxes, batch_idx, levels, output_size=output_size,
            sampling_ratio=sampling_ratio, strides=strides,
            interpret=interpret)

    def fwd(feats, boxes, batch_idx, levels):
        return pooler(feats, boxes, batch_idx, levels), (
            feats, boxes, batch_idx, levels)

    def bwd(res, g):
        feats, boxes, batch_idx, levels = res
        dfeats = multilevel_roi_align_pallas_bwd(
            feats, jax.lax.stop_gradient(boxes), batch_idx, levels, g,
            output_size=output_size, sampling_ratio=sampling_ratio,
            strides=strides, interpret=interpret)
        return dfeats, None, None, None

    pooler.defvjp(fwd, bwd)
    return pooler


def _prep(feats, boxes, batch_idx, levels, strides, rows, span, group, p):
    """Shared fwd/bwd preprocessing: window clamp, per-roi DMA window
    geometry, SMEM operand packing, group padding. The backward kernel MUST
    see bit-identical values, so both paths call this."""
    n = boxes.shape[0]
    # safety: a box whose extent would overflow its level's DMA window is
    # pooled from the next coarser level instead of silently zero-padding
    levels = clamp_levels_to_window(feats, boxes, levels.astype(jnp.int32),
                                    strides, rows, span)
    # sublane alignment depends on dtype: 8 (f32), 16 (bf16), 32 (int8)
    align = 32 // jnp.dtype(feats[0].dtype).itemsize
    feats_p = tuple(
        jnp.pad(f, ((0, 0), (0, 0), (0, (-f.shape[2]) % align), (0, 0)))
        for f in feats
    )
    shapes_true = [(f.shape[1], f.shape[2]) for f in feats]
    shapes_pad = [(f.shape[1], f.shape[2]) for f in feats_p]

    hs = jnp.asarray([h for h, _ in shapes_true], jnp.int32)[levels]
    ws = jnp.asarray([w for _, w in shapes_true], jnp.int32)[levels]
    ws_pad = jnp.asarray([w for _, w in shapes_pad], jnp.int32)[levels]
    scales = jnp.asarray([1.0 / st for st in strides], jnp.float32)[levels]

    x1 = boxes[:, 0].astype(jnp.float32) * scales
    y1 = boxes[:, 1].astype(jnp.float32) * scales
    x2 = boxes[:, 2].astype(jnp.float32) * scales
    y2 = boxes[:, 3].astype(jnp.float32) * scales
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    # per-level window bounds: clamp_levels_to_window above guarantees every
    # box's extent + halo fits its level's window, so levels below the top
    # can use smaller (cheaper) DMA windows.
    _, _, lv_rows_b, lv_span_b = _window_bounds(feats, rows, span)
    # shrink the scratch tile + interpolation matmuls to the largest window
    # ANY level actually uses (e.g. top level of an 800x1344 canvas is only
    # 25x48): pure static-shape win, no semantics change
    rows = max(min(rows, h, r)
               for (h, _), r in zip(shapes_pad, lv_rows_b))
    span = max(min(span, w, sp)
               for (_, w), sp in zip(shapes_pad, lv_span_b))
    rows_per_box = jnp.asarray(
        [min(r, h) for r, (h, _) in zip(lv_rows_b, shapes_pad)],
        jnp.int32)[levels]
    span_per_box = jnp.asarray(
        [min(sp, w) for sp, (_, w) in zip(lv_span_b, shapes_pad)],
        jnp.int32)[levels]
    row_start = jnp.clip(
        jnp.floor(y1).astype(jnp.int32) - 1, 0,
        jnp.maximum(hs - rows_per_box, 0))
    col_start = jnp.clip(
        jnp.floor(x1).astype(jnp.int32) - 1, 0,
        jnp.maximum(ws_pad - span_per_box, 0))
    col_start = (col_start // align) * align  # Mosaic slice alignment
    boxf = jnp.stack([x1, y1, roi_w / p, roi_h / p], axis=1)

    hw = jnp.stack([hs, ws, rows_per_box, span_per_box],
                   axis=1).reshape(n, 1, 4)
    boxf = boxf.reshape(n, 1, 4)
    # pad the roi axis to a multiple of the per-step group (pad rows pool
    # garbage from window (0,0) of level 0 and are sliced off/zeroed)
    pad = (-n) % group
    if pad:
        levels = jnp.pad(levels, (0, pad))
        batch_idx = jnp.pad(batch_idx, (0, pad))
        row_start = jnp.pad(row_start, (0, pad))
        col_start = jnp.pad(col_start, (0, pad))
        hw = jnp.pad(hw, ((0, pad), (0, 0), (0, 0)),
                     constant_values=1)
        boxf = jnp.pad(boxf, ((0, pad), (0, 0), (0, 0)))
    return (levels.astype(jnp.int32), batch_idx.astype(jnp.int32), row_start,
            col_start, hw, boxf, feats_p, shapes_pad, lv_rows_b, lv_span_b,
            rows, span, align, n + pad)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "strides", "rows",
                     "span", "interpret", "nbuf", "group"),
)
def multilevel_roi_align_pallas(
    feats: tuple,
    boxes: jax.Array,
    batch_idx: jax.Array,
    levels: jax.Array,
    output_size: int = 7,
    sampling_ratio: int = 2,
    strides: tuple = (4, 8, 16, 32),
    rows: int = 44,
    span: int = 64,  # max roi extent (44) + alignment slack (<= 31)
    interpret: bool = False,
    nbuf: int | None = None,  # DMA slot groups (default by dtype)
    group: int | None = None,  # rois per grid step (default by dtype)
) -> jax.Array:
    """Drop-in replacement for sampling.multilevel_roi_align (same contract).

    Requires every roi's extent on its assigned level to fit in
    (rows-2, span-9) cells — guaranteed by the canonical FPN assignment for
    canvases up to ~1400 px. C must be a multiple of 128.
    """
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = boxes.shape[0]
    p = output_size
    s = sampling_ratio
    small = jnp.dtype(feats[0].dtype).itemsize <= 2
    if nbuf is None:
        nbuf = 2  # slot groups; in-flight DMAs = (nbuf-1)*group
    if group is None:
        # per-step mechanics dominate once the matmuls are tiny: batch
        # several rois per grid step. f32 windows are 2x the VMEM.
        group = 4 if small else 2
    (levels, batch_idx, row_start, col_start, hw, boxf, feats_p, shapes_pad,
     lv_rows_b, lv_span_b, rows, span, align, n_pad) = _prep(
        feats, boxes, batch_idx, levels, strides, rows, span, group, p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 1, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in feats_p],
        out_specs=pl.BlockSpec(
            (group, p, p, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, group, rows, span, c), feats[0].dtype),
            pltpu.SemaphoreType.DMA((nbuf, group)),
        ],
    )
    kernel = _make_kernel(p, s, rows, span, shapes_pad, c, align,
                          lv_rows_b, lv_span_b, nbuf, group)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, p, p, c), feats[0].dtype),
        interpret=interpret,
    )(levels, batch_idx, row_start, col_start, hw, boxf, *feats_p)
    return out[:n]
