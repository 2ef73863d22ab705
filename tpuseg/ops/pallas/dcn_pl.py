"""Pallas DCNv2 sampling kernel: separable one-hot matmuls fused in VMEM.

The reference DCNv2 (SURVEY.md §2.2 "YOLACT++ extras", upstream CUDA
``dcn_v2_im2col``) bilinear-samples k*k taps per output position at
offset-shifted coordinates. The jnp gather formulation materialises a
``[B, Ho, Wo, kk, 4, C]`` corner intermediate in HBM — measured
HBM-bound at ~29 ms per 69x69x128 stage-2 block (bs=16, v5e).

TPU-native reformulation: a bilinear sample with zero padding factorises
per axis into linear hat weights,

    sample(F, sy, sx)[c] = sum_h sum_w hat(sy - h) * hat(sx - w) * F[h,w,c]

so sampling S points is ``cols = (Wy @ F_flat) . Wx`` with
``Wy [S, h]``, ``F_flat [h, w*c]``, and a per-sample weighted reduction
over w — two dense contractions that run on the MXU/VPU. The hat support
is 2 points per axis, and out-of-bounds corners get hat weight 0, which
reproduces ``ops.sampling._bilinear_corners_zeropad`` (torch grid_sample
zero-padding semantics, the DCNv2 border rule) exactly.

Doing this in plain XLA materialises the ``[S, w, c]`` intermediate in
HBM (measured 32 ms at 69x69x128). This kernel keeps it in VMEM: the
grid walks (batch, S tiles); each step is one ``[T, h] @ [h, w*c]`` MXU
matmul into VMEM scratch followed by the w-reduction. The whole feature
map (<= 1.3 MB for every YOLACT++-550 stage) stays VMEM-resident across
the S tiles of one image.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _make_kernel(t, h, w, c, w_chunk):
    n_chunks = -(-w // w_chunk)

    def kernel(f_ref, wy_ref, wx_ref, out_ref):
        # f [1, h, w*c]; wy [1, T, h]; wx [1, T, w]; out [1, T, c]
        wy = wy_ref[0]
        acc = jnp.zeros((t, c), jnp.float32)
        for ci in range(n_chunks):
            w0 = ci * w_chunk
            wc = min(w_chunk, w - w0)
            g = jnp.dot(wy, f_ref[0, :, w0 * c:(w0 + wc) * c],
                        preferred_element_type=jnp.float32)  # [T, wc*c]
            # cast BEFORE the newaxis: Mosaic only supports non-no-op
            # minor-dim insertion for 32-bit types
            wxc = wx_ref[0, :, w0:w0 + wc].astype(jnp.float32)[:, :, None]
            acc = acc + jnp.sum(g.reshape(t, wc, c) * wxc, axis=1)
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile", "w_chunk", "interpret"))
def _dcn_sample_pallas(feats, wy, wx, tile=128, w_chunk=None,
                       interpret=False):
    b, h, w, c = feats.shape
    s = wy.shape[1]
    if w_chunk is None:
        w_chunk = w
    s_pad = -(-s // tile) * tile
    if s_pad != s:
        wy = jnp.pad(wy, ((0, 0), (0, s_pad - s), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, s_pad - s), (0, 0)))
    out = pl.pallas_call(
        _make_kernel(tile, h, w, c, w_chunk),
        grid=(b, s_pad // tile),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, tile, h), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, tile, w), lambda bi, si: (bi, si, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), jnp.float32),
        interpret=interpret,
    )(feats.reshape(b, h, w * c), wy, wx)
    return out[:, :s]


def _dcn_sample_ref(feats, wy, wx, chunk=512):
    """jnp reference of the same contraction (chunked over S)."""
    b, h, w, c = feats.shape
    s = wy.shape[1]
    s_pad = -(-s // chunk) * chunk
    if s_pad != s:
        wy = jnp.pad(wy, ((0, 0), (0, s_pad - s), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, s_pad - s), (0, 0)))
    wy = wy.reshape(b, s_pad // chunk, chunk, h).transpose(1, 0, 2, 3)
    wx = wx.reshape(b, s_pad // chunk, chunk, w).transpose(1, 0, 2, 3)

    def per_chunk(args):
        wy_c, wx_c = args  # [B, chunk, h] / [B, chunk, w]
        g = jnp.einsum("bsh,bhwc->bswc", wy_c.astype(jnp.float32),
                       feats.astype(jnp.float32))
        return jnp.einsum("bswc,bsw->bsc", g, wx_c.astype(jnp.float32))

    cols = jax.lax.map(per_chunk, (wy, wx))  # [n_chunks, B, chunk, c]
    return cols.transpose(1, 0, 2, 3).reshape(b, s_pad, c)[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dcn_sample(feats, wy, wx, use_pallas=True, interpret=False):
    """Sample S points per image: [B,h,w,c], [B,S,h], [B,S,w] -> [B,S,c] f32.

    ``wy``/``wx`` are per-axis hat-weight matrices (modulation mask may be
    pre-folded into either). Gradients flow to all three operands via the
    jnp reference formulation.
    """
    if use_pallas:
        return _dcn_sample_pallas(feats, wy, wx, interpret=interpret)
    return _dcn_sample_ref(feats, wy, wx)


def _fwd(feats, wy, wx, use_pallas, interpret):
    return dcn_sample(feats, wy, wx, use_pallas, interpret), (feats, wy, wx)


def _bwd(use_pallas, interpret, res, dcols):
    feats, wy, wx = res
    _, vjp = jax.vjp(_dcn_sample_ref, feats, wy, wx)
    return vjp(dcols.astype(jnp.float32))


dcn_sample.defvjp(_fwd, _bwd)


def hat_matrix(coords, extent, dtype=jnp.bfloat16):
    """[..., S] sample coords -> [..., S, extent] linear-interp hat weights.

    Row s holds max(0, 1 - |coords[s] - e|) for grid points e — at most two
    adjacent nonzeros; positions outside (-1, extent) get an all-zero row
    (zero-padding border semantics).
    """
    grid = jnp.arange(extent, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
    return w.astype(dtype)
