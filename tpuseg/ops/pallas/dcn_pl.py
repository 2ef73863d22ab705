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
        # NOTE: chunking (w_chunk < w) requires the wx lane-slice offset to
        # be 128-aligned — Mosaic rejects the [T, wc] -> [T, wc, 1] reshape
        # on a misaligned slice. The big-w*c geometries (stride-2 stage-2,
        # w*c = 17664) go through dcn_sample_windowed instead, which keeps
        # only an [Ry, Rx*c] window in flight.
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


def _bwd(use_pallas, interpret, res, dcols, chunk=256):
    """Hand-written chunked backward of the sampling contraction.

    ``jax.vjp(_dcn_sample_ref, ...)`` is NOT usable here: the forward's
    ``lax.map`` saves each chunk's ``g = wy_c @ F`` as a residual, so the
    scan stacks ``[n_chunks, B, chunk, w, c]`` — 24.3 GB for YOLACT++'s
    stride-2 stage-2 block (S=69·69·9, w=138, c=128, bs=8) and an HBM OOM
    at compile (round-4 train bench). This scan recomputes the per-chunk
    intermediates inside the backward instead and accumulates ``d_feats``,
    keeping the peak at one chunk's temporaries (~300 MB at chunk=256).
    """
    feats, wy, wx = res
    b, h, w, c = feats.shape
    s = wy.shape[1]
    f32 = jnp.float32
    f = feats.astype(f32)
    s_pad = -(-s // chunk) * chunk
    pad = ((0, 0), (0, s_pad - s), (0, 0))
    wy_c = jnp.pad(wy, pad).reshape(b, -1, chunk, h).transpose(1, 0, 2, 3)
    wx_c = jnp.pad(wx, pad).reshape(b, -1, chunk, w).transpose(1, 0, 2, 3)
    dc_c = jnp.pad(dcols.astype(f32), pad).reshape(
        b, -1, chunk, c).transpose(1, 0, 2, 3)

    def step(df_acc, args):
        wyk, wxk, dck = (a.astype(f32) for a in args)
        # d_feats[b,h,w,c] += Σ_s wy ⊗ wx ⊗ dcols
        u = jnp.einsum("bsw,bsc->bswc", wxk, dck)
        df_acc = df_acc + jnp.einsum("bsh,bswc->bhwc", wyk, u)
        # d_wy[b,s,h] = Σ_w wx · (Σ_c F · dcols)
        q = jnp.einsum("bhwc,bsc->bshw", f, dck)
        d_wy_k = jnp.einsum("bshw,bsw->bsh", q, wxk)
        # d_wx[b,s,w] = Σ_c (Σ_h wy · F) · dcols
        g = jnp.einsum("bsh,bhwc->bswc", wyk, f)
        d_wx_k = jnp.einsum("bswc,bsc->bsw", g, dck)
        return df_acc, (d_wy_k, d_wx_k)

    df, (d_wy, d_wx) = jax.lax.scan(
        step, jnp.zeros((b, h, w, c), f32), (wy_c, wx_c, dc_c))
    d_wy = d_wy.transpose(1, 0, 2, 3).reshape(b, s_pad, h)[:, :s]
    d_wx = d_wx.transpose(1, 0, 2, 3).reshape(b, s_pad, w)[:, :s]
    return (df.astype(feats.dtype), d_wy.astype(wy.dtype),
            d_wx.astype(wx.dtype))


dcn_sample.defvjp(_fwd, _bwd)


def _make_win_kernel(t, ry, rx, c, rx_chunk):
    n_ch = -(-rx // rx_chunk)

    def kernel(yb_ref, xb_ref, f_ref, wy_ref, wx_ref, out_ref):
        # f [1, h, w*c] (whole map, VMEM-resident); wy [1, 1, T, Ry];
        # wx [1, 1, T, Rx]; out [1, 1, T, c]; yb/xb [B, nt] (SMEM prefetch)
        bi = pl.program_id(0)
        si = pl.program_id(1)
        # yb_ref holds ybase//8: multiplying here lets Mosaic statically
        # prove the sublane slice offset is 8-aligned
        yb = yb_ref[bi, si] * 8
        xb = xb_ref[bi, si]
        wy = wy_ref[0, 0]
        # the window contraction runs in rx chunks: at the Pose2Seg
        # geometry (Rx*c = 8192, T=64) a whole-window f32 ``g`` costs
        # ~6 MB of scoped VMEM next to the 8.4 MB resident map — over the
        # 16 MB limit. (A bf16 ``g`` is not an option: Mosaic requires
        # 32-bit matmul accumulators.)
        # insert the minor dim BEFORE slicing: the [T, k] -> [T, k, 1]
        # reshape is only supported on unsliced values (cf. the w_chunk
        # note in _dcn_sample_pallas); the [T, Rx, 1] transpose puts k on
        # sublanes where 8-aligned slicing is legal
        wxc_all = wx_ref[0, 0].astype(jnp.float32)[:, :, None]  # [T, Rx, 1]
        acc = jnp.zeros((t, c), jnp.float32)
        for ci in range(n_ch):
            k = min(rx_chunk, rx - ci * rx_chunk)
            f_win = f_ref[0, pl.ds(yb, ry),
                          pl.ds((xb + ci * rx_chunk) * c, k * c)]
            g = jnp.dot(wy, f_win,
                        preferred_element_type=jnp.float32)  # [T, k*c]
            wxc = wxc_all[:, ci * rx_chunk:ci * rx_chunk + k, :]
            acc = acc + jnp.sum(g.reshape(t, k, c) * wxc, axis=1)
        out_ref[0, 0] = acc.astype(out_ref.dtype)

    return kernel


def _win_call(feats, wy, wx, ybase, xbase, interpret):
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = feats.shape
    _, nt, t, ry = wy.shape
    rx = wx.shape[3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda bi, si, yb, xb: (bi, 0, 0)),
            pl.BlockSpec((1, 1, t, ry),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
            pl.BlockSpec((1, 1, t, rx),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, t, c),
                               lambda bi, si, yb, xb: (bi, si, 0, 0)),
    )
    # chunk the x window so the f32 [T, k*c] matmul output stays ~2 MB
    rx_chunk = min(rx, max(1, 2048 // c))
    return pl.pallas_call(
        _make_win_kernel(t, ry, rx, c, rx_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt, t, c), jnp.float32),
        interpret=interpret,
        # the VMEM-resident map (8.4 MB at Pose2Seg's 128x128x256 bf16)
        # plus the unrolled chunk temporaries overruns the 16 MB default
        # scoped-vmem budget by ~0.2 MB in some surrounding-program
        # contexts; v5e has 128 MB of physical VMEM — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(ybase // 8, xbase, feats.reshape(b, h, w * c), wy, wx)


def _make_win_bwd_kernel(t, ry, rx, c, rx_chunk):
    """Transpose of the window kernel, all three cotangents in one pass:

        d_wx[t, k]    = Σ_c (wy @ win)[t, k, c] · dc[t, c]   (fwd recompute)
        U[t, k·c]     = wx ⊗ dc
        d_wy[t, ry]  += U @ winᵀ
        d_win        += wyᵀ @ U     (accumulated into the VMEM-resident
                                     per-image d_map; grid steps execute
                                     sequentially, so overlapping windows
                                     accumulate without races)

    Escaped samples arrive with zero wy/wx rows — that alone zeroes their
    d_win and d_wx contributions, and their in-kernel d_wy rows are killed
    by the consumer's escape mask outside (``in_w``-masked in
    ``deform_conv``/``sample_cols_windowed``). dc is NOT guaranteed zero
    for escaped samples: only ``sample_cols_windowed``'s ``.set``
    correction cuts the cotangent; ``_deform_out_windowed`` scatter-ADDs
    its correction, so its escaped dc rows are real. Do not optimise
    based on dc == 0.
    """
    n_ch = -(-rx // rx_chunk)

    def kernel(yb_ref, xb_ref, f_ref, wy_ref, wx_ref, dc_ref,
               dwy_ref, dwx_ref, df_ref):
        bi = pl.program_id(0)
        si = pl.program_id(1)

        @pl.when(si == 0)
        def _():
            df_ref[...] = jnp.zeros_like(df_ref)

        yb = yb_ref[bi, si] * 8
        xb = xb_ref[bi, si]
        wyf = wy_ref[0, 0].astype(jnp.float32)  # [T, Ry]
        wxc_all = wx_ref[0, 0].astype(jnp.float32)[:, :, None]  # [T, Rx, 1]
        dc = dc_ref[0, 0].astype(jnp.float32)  # [T, c]
        dwy_acc = jnp.zeros((t, ry), jnp.float32)
        dwx_parts = []
        for ci in range(n_ch):
            k = min(rx_chunk, rx - ci * rx_chunk)
            sl = pl.ds((xb + ci * rx_chunk) * c, k * c)
            f_win = f_ref[0, pl.ds(yb, ry), sl].astype(jnp.float32)
            g = jnp.dot(wyf, f_win,
                        preferred_element_type=jnp.float32)  # [T, k*c]
            dwx_parts.append(
                jnp.sum(g.reshape(t, k, c) * dc[:, None, :], axis=2))
            u = (wxc_all[:, ci * rx_chunk:ci * rx_chunk + k, :]
                 * dc[:, None, :]).reshape(t, k * c)
            dwy_acc = dwy_acc + jax.lax.dot_general(
                u, f_win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dfw = jax.lax.dot_general(
                wyf, u, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [Ry, k*c]
            df_ref[0, pl.ds(yb, ry), sl] = (
                df_ref[0, pl.ds(yb, ry), sl] + dfw)
        dwy_ref[0, 0] = dwy_acc.astype(dwy_ref.dtype)
        dwx_ref[0, 0] = jnp.concatenate(dwx_parts, axis=1).astype(
            dwx_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _win_bwd_call(feats, wy, wx, ybase, xbase, dcols, interpret):
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = feats.shape
    _, nt, t, ry = wy.shape
    rx = wx.shape[3]
    rx_chunk = min(rx, max(1, 2048 // c))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda bi, si, yb, xb: (bi, 0, 0)),
            pl.BlockSpec((1, 1, t, ry),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
            pl.BlockSpec((1, 1, t, rx),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
            pl.BlockSpec((1, 1, t, c),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, t, ry),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
            pl.BlockSpec((1, 1, t, rx),
                         lambda bi, si, yb, xb: (bi, si, 0, 0)),
            pl.BlockSpec((1, h, w * c), lambda bi, si, yb, xb: (bi, 0, 0)),
        ],
    )
    dwy, dwx, df = pl.pallas_call(
        _make_win_bwd_kernel(t, ry, rx, c, rx_chunk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nt, t, ry), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, t, rx), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w * c), jnp.float32),
        ),
        interpret=interpret,
        # the f32 per-image d_map accumulator (16.8 MB at Pose2Seg's
        # 128x128x256) lives in VMEM next to the resident source map
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(ybase // 8, xbase, feats.reshape(b, h, w * c), wy, wx, dcols)
    return df.reshape(b, h, w, c), dwy, dwx


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dcn_sample_windowed(feats, wy, wx, ybase, xbase, interpret):
    return _win_call(feats, wy, wx, ybase, xbase, interpret)


def _dsw_fwd(feats, wy, wx, ybase, xbase, interpret):
    return (_win_call(feats, wy, wx, ybase, xbase, interpret),
            (feats, wy, wx, ybase, xbase))


def _dsw_bwd(interpret, res, dcols):
    import numpy as np

    feats, wy, wx, ybase, xbase = res
    df, dwy, dwx = _win_bwd_call(feats, wy, wx, ybase, xbase,
                                 dcols.astype(jnp.float32), interpret)
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (df.astype(feats.dtype), dwy.astype(wy.dtype),
            dwx.astype(wx.dtype), zi(ybase), zi(xbase))


_dcn_sample_windowed.defvjp(_dsw_fwd, _dsw_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dcn_sample_windowed(feats, wy, wx, ybase, xbase, interpret=False):
    """Window-limited sampling: each tile of T samples contracts only an
    ``[Ry, Rx*c]`` window of the feature map (its position announced ahead
    of the grid step via scalar prefetch) instead of the full ``[h, w*c]``
    map — the dense kernel's MXU/VPU work is ~w/Rx-fold redundant because a
    bilinear hat has 2 nonzeros per axis. Samples whose support escapes
    their tile's window must arrive with ZEROED hat rows (the caller
    computes exact values for them separately — see
    deform_conv._deform_out_windowed, sampling.sample_cols_windowed).

    Differentiable: a custom VJP runs the transposed window kernel
    (_make_win_bwd_kernel) — the gather-formulation backward it replaces
    spent its time in XLA scatter-adds (measured ~280 ms of the YOLACT++
    374 ms train step).

    feats [B,h,w,c]; wy [B,nt,T,Ry]; wx [B,nt,T,Rx]; ybase/xbase [B,nt]
    int32 window origins (ybase + Ry <= h, xbase + Rx <= w) -> [B,nt,T,c]
    f32.
    """
    return _dcn_sample_windowed(feats, wy, wx, ybase, xbase, interpret)


def hat_matrix(coords, extent, dtype=jnp.bfloat16):
    """[..., S] sample coords -> [..., S, extent] linear-interp hat weights.

    Row s holds max(0, 1 - |coords[s] - e|) for grid points e — at most two
    adjacent nonzeros; positions outside (-1, extent) get an all-zero row
    (zero-padding border semantics).
    """
    grid = jnp.arange(extent, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
    return w.astype(dtype)
