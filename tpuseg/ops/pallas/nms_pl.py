"""Pallas greedy-NMS kernel (the second north-star native kernel).

Same algorithm as tpuseg.ops.nms.nms_mask (exact greedy suppression as the
unique fixed point of the keep recursion), executed inside one Pallas
program: the score-sorted boxes live in VMEM, the grid walks the tiles
sequentially (TPU grids are sequential, so the alive mask persists in
scratch across steps), each step does one [T, N] IoU reduction against the
earlier survivors plus the within-tile whole-matrix fixed-point iteration.

Everything is VPU work on resident VMEM data — no HBM round-trips between
tiles (the jnp version re-materializes the alive vector per step).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_tile_vs_all(tb, boxes, to_remove=0.0):
    """[T, 4] x [N, 4] -> [T, N] IoU (to_remove=1.0 for detectron extents).

    Written with 2-D slices + transposes only (Mosaic-friendly: no
    newaxis-with-int indexing).
    """
    tx1, ty1, tx2, ty2 = (tb[:, k:k + 1] for k in range(4))  # [T, 1]
    bx1, by1, bx2, by2 = (
        jnp.transpose(boxes[:, k:k + 1]) for k in range(4))  # [1, N]
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


def _make_kernel(n, tile, iou_threshold, to_remove=0.0):
    """Kernel over grid (B, num_tiles): batch-major sequential execution lets
    the [N, 1] alive scratch be reset at tile 0 of each batch element.
    boxes/valid/out are blocked per batch element."""
    num_tiles = n // tile

    def kernel(boxes_ref, valid_ref, out_ref, alive_ref):
        # blocked per batch element: refs are [1, N, 4] / [1, N, 1]
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            alive_ref[:] = valid_ref[0]

        # all shapes kept 2-D for Mosaic
        start = pl.multiple_of(i * tile, tile)
        tb = boxes_ref[0, pl.ds(start, tile), :]
        tv = valid_ref[0, pl.ds(start, tile), :] > 0  # [T, 1]
        iou_all = _iou_tile_vs_all(tb, boxes_ref[0, :, :], to_remove)  # [T, N]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        alive_row = jnp.transpose(alive_ref[:, :])  # [1, N]
        earlier = jnp.where(pos < start, alive_row, 0.0)  # [1, N]
        cross_sup = jnp.max(
            jnp.where(iou_all > iou_threshold, earlier, 0.0),
            axis=1, keepdims=True) > 0  # [T, 1]
        tv = tv & ~cross_sup

        # within-tile greedy fixed point (strict upper triangle); computed
        # directly (Mosaic has no dynamic_slice on values, and [T,T] is tiny)
        iou_tt = _iou_tile_vs_all(tb, tb, to_remove)
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
        alive_ref[pl.ds(start, tile), :] = kept

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
    tile: int = 128,
    interpret: bool = False,
    to_remove: float = 0.0,
) -> jax.Array:
    """Exact greedy NMS keep-masks [B, N].

    One kernel launch for the whole batch: grid (B, num_tiles), batch-major
    sequential execution, per-batch-blocked inputs.
    """
    from tpuseg.ops.nms import NEG_INF, _sort_desc

    b, n = scores.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)
    pad = (-n) % tile
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    np_ = n + pad
    masked, order = _sort_desc(scores, valid)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = (
        jnp.take_along_axis(masked, order, axis=1) > NEG_INF
    ).astype(jnp.float32).reshape(b, np_, 1)

    out = pl.pallas_call(
        _make_kernel(np_, tile, iou_threshold, to_remove),
        grid=(b, np_ // tile),
        in_specs=[
            pl.BlockSpec((1, np_, 4), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, 1), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((np_, 1), jnp.float32)],
        interpret=interpret,
    )(sboxes, svalid)
    keep_sorted = out[..., 0] > 0
    keep = jnp.zeros((b, np_), bool).at[
        jnp.arange(b)[:, None], order].set(keep_sorted)
    return keep[:, :n]


def nms_mask_pallas(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid=None,
    tile: int = 128,
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
