"""Pallas greedy-NMS kernel (the second north-star native kernel).

Same algorithm as tpuseg.ops.nms.nms_mask (exact greedy suppression as the
unique fixed point of the keep recursion), executed inside one Pallas
program: the score-sorted boxes live in VMEM, the grid walks the tiles
sequentially (TPU grids are sequential, so the alive mask persists in
scratch across steps), each step does one [T, N] IoU reduction against the
earlier survivors plus the within-tile whole-matrix fixed-point iteration.

Everything is VPU work on resident VMEM data — no HBM round-trips between
tiles (the jnp version re-materializes the alive vector per step).

VMEM layout: boxes ride as [4, N] and masks as [1, N] so the box dimension
N is the LANE axis. The naive [N, 4] / [N, 1] blocks lane-pad 4 -> 128 and
1 -> 128 (4 x ~6 MB at the C4 train budget of 12k boxes — past the 16 MB
scoped-VMEM stack); transposed they cost 32x less and every coordinate row
is already the [1, N] broadcast operand the IoU wants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_cols(t4, a4, to_remove=0.0):
    """IoU from coordinate columns: t4 = 4 x [T, 1], a4 = 4 x [1, N]
    -> [T, N] (to_remove=1.0 for detectron +1 extents)."""
    tx1, ty1, tx2, ty2 = t4
    bx1, by1, bx2, by2 = a4
    lt_x = jnp.maximum(tx1, bx1)
    lt_y = jnp.maximum(ty1, by1)
    rb_x = jnp.minimum(tx2, bx2)
    rb_y = jnp.minimum(ty2, by2)
    inter = (jnp.maximum(rb_x - lt_x + to_remove, 0.0)
             * jnp.maximum(rb_y - lt_y + to_remove, 0.0))
    area_t = (jnp.maximum(tx2 - tx1 + to_remove, 0.0)
              * jnp.maximum(ty2 - ty1 + to_remove, 0.0))
    area_a = (jnp.maximum(bx2 - bx1 + to_remove, 0.0)
              * jnp.maximum(by2 - by1 + to_remove, 0.0))
    union = area_t + area_a - inter
    return inter / jnp.maximum(union, 1e-9)


def _make_kernel(n, tile, cstep, iou_threshold, to_remove=0.0):
    """Kernel over grid (B, num_tiles): batch-major sequential execution lets
    the [1, N] alive scratch be reset at tile 0 of each batch element.
    boxes/valid/out are blocked per batch element.

    The cross-tile suppression scan runs in ``cstep``-wide chunks over N so
    the live [T, cstep] temporaries stay ~1 MB regardless of N (one full
    [T, N] IoU at the C4 train budget of 12k boxes needs ~4 x 6 MB — past
    the 16 MB scoped-VMEM stack). Only chunks at or before the current tile
    can contain earlier survivors, so the loop stops there.
    """
    num_tiles = n // tile
    nchunks = n // cstep

    def kernel(boxes_ref, valid_ref, out_ref, alive_ref):
        # blocked per batch element: refs are [1, 4, N] / [1, 1, N];
        # alive scratch [1, N]
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            alive_ref[:] = valid_ref[0]

        start = pl.multiple_of(i * tile, tile)
        # tile coords as [T, 1] columns; chunk coords as [1, C] rows
        trows = [boxes_ref[0, k:k + 1, pl.ds(start, tile)] for k in range(4)]
        tcols = [jnp.transpose(r) for r in trows]
        tv = jnp.transpose(
            valid_ref[0, :, pl.ds(start, tile)]) > 0  # [T, 1]

        def chunk_body(c, acc):
            cs = pl.multiple_of(c * cstep, cstep)
            arows = [boxes_ref[0, k:k + 1, pl.ds(cs, cstep)]
                     for k in range(4)]
            iou = _iou_cols(tcols, arows, to_remove)  # [T, C]
            pos = cs + jax.lax.broadcasted_iota(jnp.int32, (1, cstep), 1)
            earlier = jnp.where(
                pos < start, alive_ref[0:1, pl.ds(cs, cstep)], 0.0)
            sup = jnp.max(jnp.where(iou > iou_threshold, earlier, 0.0),
                          axis=1, keepdims=True)  # [T, 1]
            return jnp.maximum(acc, sup)

        # chunks past the current tile hold no earlier survivors
        last = jnp.minimum(start // cstep + 1, nchunks)
        cross = jax.lax.fori_loop(
            0, last, chunk_body, jnp.zeros((tile, 1), jnp.float32))
        tv = tv & ~(cross > 0)

        # within-tile greedy fixed point (strict upper triangle); computed
        # directly (Mosaic has no dynamic_slice on values, and [T,T] is tiny)
        iou_tt = _iou_cols(tcols, trows, to_remove)
        upper = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        )
        # adjacency transposed analytically: IoU is symmetric, so
        # adjT[j, i] = (i suppresses j) = iou[j, i] > thr AND i < j — the
        # LOWER triangle. The fixed-point body is then a pure [T,T]@[T,1]
        # matmul (Mosaic cannot legalize transposes inside while bodies).
        lower = jnp.logical_not(upper) & jnp.logical_not(
            jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1))
        adjT = jnp.where((iou_tt > iou_threshold) & lower, 1.0, 0.0)
        tv_f = jnp.where(tv, 1.0, 0.0)  # [T, 1] f32

        def cond(state):
            kept, prev, it = state
            return jnp.logical_and(jnp.any(kept != prev), it < tile)

        def body(state):
            kept, _, it = state  # kept [T, 1] f32
            sup = jax.lax.dot_general(
                adjT, kept, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [T, 1]
            new = jnp.where(sup > 0, 0.0, tv_f)
            return new, kept, it + 1

        kept, _, _ = jax.lax.while_loop(cond, body, (tv_f, 1.0 - tv_f, 0))
        alive_ref[0:1, pl.ds(start, tile)] = jnp.transpose(kept)

        @pl.when(i == num_tiles - 1)
        def _():
            out_ref[0] = alive_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "tile", "interpret", "to_remove"))
def nms_mask_pallas_batched(
    boxes: jax.Array,  # [B, N, 4]
    scores: jax.Array,  # [B, N]
    iou_threshold: float,
    valid=None,  # [B, N]
    tile: int | None = None,
    interpret: bool = False,
    to_remove: float = 0.0,
) -> jax.Array:
    """Exact greedy NMS keep-masks [B, N].

    One kernel launch for the whole batch: grid (B, num_tiles), batch-major
    sequential execution, per-batch-blocked inputs.
    """
    from tpuseg.ops.nms import NEG_INF, _sort_desc

    b, n = scores.shape
    if tile is None:
        tile = 128  # lane-aligned (Mosaic: lane slices must be 128-aligned)
    # chunk width of the kernel's cross-suppression scan: full width when
    # small, else 2048 lanes (~1 MB [T, C] temps)
    cstep = -(-n // tile) * tile if n <= 4096 else 2048
    if valid is None:
        valid = jnp.ones((b, n), bool)
    pad = (-n) % max(tile, cstep)
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    np_ = n + pad
    masked, order = _sort_desc(scores, valid)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = (
        jnp.take_along_axis(masked, order, axis=1) > NEG_INF
    ).astype(jnp.float32).reshape(b, 1, np_)
    sboxes_t = jnp.transpose(sboxes, (0, 2, 1))  # [B, 4, N] lane-major

    out = pl.pallas_call(
        _make_kernel(np_, tile, cstep, iou_threshold, to_remove),
        grid=(b, np_ // tile),
        in_specs=[
            pl.BlockSpec((1, 4, np_), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, np_), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, np_), jnp.float32)],
        interpret=interpret,
    )(sboxes_t, svalid)
    keep_sorted = out[:, 0, :] > 0
    keep = jnp.zeros((b, np_), bool).at[
        jnp.arange(b)[:, None], order].set(keep_sorted)
    return keep[:, :n]


def nms_mask_pallas(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid=None,
    tile: int | None = None,
    interpret: bool = False,
    to_remove: float = 0.0,
) -> jax.Array:
    """Exact greedy NMS keep-mask [N] (single-image convenience wrapper)."""
    out = nms_mask_pallas_batched(
        boxes[None], scores[None],
        iou_threshold,
        None if valid is None else valid[None],
        tile=tile, interpret=interpret, to_remove=to_remove)
    return out[0]
