"""Modulated deformable convolution v2 (YOLACT++'s DCNv2 backbone op).

TPU equivalent of the reference's CUDA DCNv2 (SURVEY.md §2.2 "YOLACT++
extras"): a regular conv predicts per-position offsets (and modulation
masks); the deformable conv bilinear-samples its k x k taps at the offset
positions and contracts with the weights:
  cols[b, y, x, (tap, cin)] = m_tap * sample(x_in, p_tap + offset_tap)
  out = cols @ W[(tap, cin), cout]

Two sampling formulations, numerically identical (zero-padding border):
  * ``method="gather"`` — batched 4-corner gather + weighted sum. Exact
    f32 path; used off-TPU and for f32 parity runs. On TPU the gathered
    [B,Ho,Wo,kk,4,C] corner intermediate is HBM-bound (~29 ms per
    69x69x128 block at bs=16 on v5e).
  * ``method="onehot"`` — per-axis linear hat matrices contracted in one
    fused Pallas kernel (ops/pallas/dcn_pl.py); the sampling runs as MXU
    matmuls with the intermediate resident in VMEM.
``method=None`` picks "onehot" on a TPU backend (per the ops.pallas
dispatch policy) when the input is bf16, else "gather".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Windowed sampling path (the TPU fast path for the backbone geometries)
# --------------------------------------------------------------------------

_RY, _RX = 32, 16  # window rows/cols (see dcn_pl.dcn_sample_windowed)
_ESC_BUDGET = 2048  # exact-correction slots per image before dense fallback


def _win_geometry(h, w, kk, stride, dilation):
    """Position-tile shape (BY, BX) for the windowed kernel, or None when
    windows would not shrink the contraction. The tile's intrinsic reach
    per axis is (B-1)*stride + 2*dilation + 2 (taps + bilinear support);
    it must fit the window with slack for learned offsets (y additionally
    loses up to 7 rows to the 8-aligned window origin)."""
    if h < _RY or w <= 2 * _RX:
        return None
    reach = 2 * dilation + 2
    # >= ±4 px x-offset slack; y has >= ±12 (8 of which the aligned origin
    # may consume), so escapes are x-bound in practice
    bx_max = (_RX - reach - 4) // stride + 1
    by_max = (_RY - reach - 12) // stride + 1
    if bx_max < 1 or by_max < 1:
        return None
    bx = min(bx_max, max(1, 64 // kk))  # kk=9 -> 7
    by = min(by_max, max(1, 128 // (bx * kk)))
    if by * bx * kk < 64:  # tile too small to feed the MXU
        return None
    return by, bx


# _axis_window lives in ops.sampling (shared with sample_cols_windowed)


def _deform_out_windowed(x, sy, sx, mask, weight, by, bx, interpret):
    """Forward of the windowed path, producing the CONV OUTPUT
    [B, Ho, Wo, cout] f32 (no bias). Samples are reordered into (BY x BX)
    position tiles, the window kernel samples them, and the weight
    contraction runs IN TILE LAYOUT — so the [B, S, c] sampled columns are
    never re-laid-out or scattered into (only the kk-fold smaller conv
    output is). Escaped samples contribute zero in the kernel (their
    modulation row is zeroed) and their exact contribution is scatter-ADDED
    to the output under a `count > 0` cond, so the zero-escape common case
    (offsets are zero-init; trained offsets mostly within the ±4 px slack)
    pays nothing. If any image escapes more than the correction budget the
    whole batch falls back to the jnp einsum formulation (exact, slower).
    """
    from tpuseg.ops.pallas.dcn_pl import dcn_sample_windowed, hat_matrix
    from tpuseg.ops.sampling import _axis_window

    b, h, w, cin = x.shape
    _, ho, wo, kk = sy.shape
    cout = weight.shape[-1]
    hp, wp = -(-ho // by) * by, -(-wo // bx) * bx
    nt = (hp // by) * (wp // bx)
    t0 = by * bx * kk
    t = -(-t0 // 8) * 8
    wdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    w_kco = weight.reshape(kk, cin, cout)

    def reorder(a, fill):
        a = jnp.pad(a, ((0, 0), (0, hp - ho), (0, wp - wo), (0, 0)),
                    constant_values=fill)
        a = a.reshape(b, hp // by, by, wp // bx, bx, kk)
        a = a.transpose(0, 1, 3, 2, 4, 5).reshape(b, nt, t0)
        # pad the tile to a sublane multiple with no-support coords
        return jnp.pad(a, ((0, 0), (0, 0), (0, t - t0)),
                       constant_values=fill)

    syr = reorder(sy.astype(jnp.float32), -4.0)
    sxr = reorder(sx.astype(jnp.float32), -4.0)
    mr = reorder(mask.astype(jnp.float32), 0.0)
    # pad the map's rows so an 8-ALIGNED window origin can still cover the
    # bottom: padded rows are zero, which is exactly the zero-pad border
    # contribution (true hats there are zero; the has-support test keeps
    # using the real h)
    h_pad = ((h - _RY + 7) // 8) * 8 + _RY
    # x origins must keep the kernel's lane-slice offset (xb*c) 128-aligned
    # (cf. sampling._sample_cols_windowed_impl) — align=1 is only legal for
    # c % 128 == 0, which the YOLACT++ stages happen to satisfy; derive it.
    # Like the y axis, the map is PADDED so an aligned origin can still
    # cover the right edge (aligning max_base down instead would strand
    # the last (w-_RX) % ax columns outside every window — always-escaping
    # samples that can blow the correction budget); padded columns are
    # zero = the zero-pad border contribution
    ax = 128 // int(np.gcd(cin, 128))
    w_pad = ((max(w - _RX, 0) + ax - 1) // ax) * ax + _RX
    xp = jnp.pad(x, ((0, 0), (0, h_pad - h), (0, w_pad - w), (0, 0)))
    ybase, in_y = _axis_window(syr, h, _RY, 8, max_base=h_pad - _RY)
    xbase, in_x = _axis_window(sxr, w, _RX, ax, max_base=w_pad - _RX)
    in_w = in_y & in_x
    esc_r = (~in_w) & (syr > -1.0) & (syr < h) & (sxr > -1.0) & (sxr < w)
    cnt = esc_r.reshape(b, nt * t).sum(-1)
    e_budget = min(_ESC_BUDGET, ho * wo * kk)

    def windowed():
        # escaped samples are zeroed via the folded modulation row and
        # their contribution scatter-added to the OUTPUT below
        wy = hat_matrix(syr - ybase[..., None], _RY, dtype=jnp.float32)
        wy = (wy * (mr * in_w)[..., None]).astype(wdt)
        wx = hat_matrix(sxr - xbase[..., None], _RX, dtype=wdt)
        cols = dcn_sample_windowed(xp, wy, wx, ybase, xbase,
                                   interpret=interpret)
        # weight contraction in tile layout: [b, nt, positions, kk, cin]
        cols = cols[:, :, :t0].reshape(b, nt, by * bx, kk, cin)
        out_t = jnp.einsum("bnpkc,kco->bnpo", cols.astype(wdt),
                           w_kco.astype(wdt),
                           preferred_element_type=jnp.float32)
        out = out_t.reshape(b, hp // by, wp // bx, by, bx, cout)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, cout)
        out = out[:, :ho, :wo]

        def correct(out):
            # exact contribution of escaped samples, added at their output
            # positions. esc flags map back to the ORIGINAL sample order
            # so indices address sy/sx/mask and the output directly.
            esc = esc_r.reshape(b, nt, t)[:, :, :t0]
            esc = esc.reshape(b, hp // by, wp // bx, by, bx, kk)
            esc = esc.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hp, wp, kk)[:, :ho, :wo].reshape(b, ho * wo * kk)
            idx = jax.vmap(lambda e: jnp.nonzero(
                e, size=e_budget, fill_value=0)[0])(esc)
            valid = jnp.arange(e_budget)[None, :] < cnt[:, None]
            s = ho * wo * kk
            take = lambda a: jnp.take_along_axis(
                a.astype(jnp.float32).reshape(b, s), idx, 1)
            from tpuseg.ops.sampling import (_bilinear_corners_zeropad,
                                             _gather_weighted)
            idx4, w4 = _bilinear_corners_zeropad(take(sy), take(sx), h, w)
            cols_e = jax.vmap(_gather_weighted)(
                x.reshape(b, h * w, cin).astype(jnp.float32), idx4, w4)
            cols_e = cols_e * (take(mask) * valid)[..., None]
            tap = idx % kk
            contrib = jnp.zeros((b, e_budget, cout), jnp.float32)
            for k_ in range(kk):  # static kk matmuls beat a [b,E,kk,cin]
                ck = cols_e @ w_kco[k_].astype(jnp.float32)
                contrib = contrib + jnp.where((tap == k_)[..., None], ck, 0)
            pos = jnp.where(valid, idx // kk, ho * wo)  # invalid -> dropped
            flat = out.reshape(b, ho * wo, cout)
            flat = jax.vmap(
                lambda f, p, cc: f.at[p].add(cc, mode="drop"))(
                    flat, pos, contrib)
            return flat.reshape(b, ho, wo, cout)

        return jax.lax.cond(jnp.max(cnt) > 0, correct, lambda o: o, out)

    def dense():
        # over-budget escape fallback. Uses the jnp einsum formulation
        # through dcn_sample's chunked-scan VJP (memory-safe under
        # autodiff), NOT the dense Pallas kernel: this branch is compiled
        # (cond) for the big-w*c geometries where the dense kernel's
        # [T, w*c] accumuland exceeds scoped VMEM — the rare over-budget
        # batch pays an XLA-path cost instead
        from tpuseg.ops.pallas.dcn_pl import dcn_sample

        s = ho * wo * kk
        wy = hat_matrix(sy.reshape(b, s), h, dtype=jnp.float32)
        wy = (wy * mask.astype(jnp.float32).reshape(b, s)[..., None]
              ).astype(wdt)
        wx = hat_matrix(sx.reshape(b, s), w, dtype=wdt)
        cols = dcn_sample(x, wy, wx, False, interpret).reshape(
            b, ho, wo, kk, cin)
        return jnp.einsum("bhwkc,kco->bhwo", cols.astype(wdt),
                          w_kco.astype(wdt),
                          preferred_element_type=jnp.float32)

    return jax.lax.cond(jnp.max(cnt) <= e_budget, windowed, dense)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding",
                                             "dilation", "method"))
def deform_conv2d(
    x: jax.Array,  # [B, H, W, Cin]
    offsets: jax.Array,  # [B, Ho, Wo, 2*k*k] (dy, dx per tap)
    mask: jax.Array,  # [B, Ho, Wo, k*k] modulation (already sigmoided)
    weight: jax.Array,  # [k, k, Cin, Cout]
    bias: jax.Array | None = None,
    kernel: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    method: str | None = None,
) -> jax.Array:
    b, h, w, cin = x.shape
    k = kernel
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    kk = k * k

    if method is None:
        from tpuseg.ops import pallas as pallas_pkg

        on_tpu = jax.default_backend() == "tpu"
        method = ("onehot" if pallas_pkg.pallas_enabled(on_tpu)
                  and x.dtype == jnp.bfloat16 else "gather")

    # base tap positions per output pixel; tap index t = i*k + j
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    tap_y = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
    tap_x = jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)

    off = offsets.astype(jnp.float32).reshape(b, ho, wo, kk, 2)
    sy = oy[None, :, None, None] + tap_y[None, None, None, :] + off[..., 0]
    sx = ox[None, None, :, None] + tap_x[None, None, None, :] + off[..., 1]

    if method == "onehot":
        from tpuseg.ops import pallas as pallas_pkg
        from tpuseg.ops.pallas.dcn_pl import dcn_sample, hat_matrix

        wdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        # off-TPU an explicit method="onehot" runs the interpreted kernel
        interp = (pallas_pkg.pallas_interpret()
                  or jax.default_backend() != "tpu")
        geom = _win_geometry(h, w, kk, stride, dilation)
        if geom is not None:
            # differentiable throughout: the window kernel carries its own
            # transposed-kernel VJP; the escape correction and the einsum
            # contraction are plain autodiff; the over-budget fallback
            # routes through dcn_sample's chunked-scan VJP. checkpoint
            # keeps residuals at the primals — plain autodiff would save
            # each block's [B, S, cin] sampled columns for the weight
            # grad (~180 MB f32/block, HBM-OOM across YOLACT++'s 13
            # blocks); the replayed forward is one cheap kernel pass
            out = jax.checkpoint(
                lambda *a: _deform_out_windowed(*a, geom[0], geom[1],
                                                interp))(
                x, sy, sx, mask.astype(jnp.float32).reshape(b, ho, wo, kk),
                weight)
        else:
            s = ho * wo * kk
            # modulation is a per-sample scalar — fold it into the y hats
            wy = hat_matrix(sy.reshape(b, s), h, dtype=jnp.float32)
            wy = (wy * mask.astype(jnp.float32).reshape(b, s)[..., None]
                  ).astype(wdt)
            wx = hat_matrix(sx.reshape(b, s), w, dtype=wdt)
            cols = dcn_sample(x, wy, wx, True, interp)
            cols = cols.reshape(b, ho, wo, kk, cin)
            out = jnp.einsum(
                "bhwkc,kco->bhwo", cols.astype(wdt),
                weight.reshape(kk, cin, -1).astype(wdt),
                preferred_element_type=jnp.float32)
    else:
        # bilinear sample with zero padding (matches DCNv2 border handling)
        from tpuseg.ops.sampling import (_bilinear_corners_zeropad,
                                         _gather_weighted)

        idx4, w4 = _bilinear_corners_zeropad(sy, sx, h, w)

        def per_image(feat, idx4_i, w4_i, m_i):
            cols = _gather_weighted(feat.reshape(h * w, cin), idx4_i, w4_i)
            return cols * m_i[..., None]  # [Ho, Wo, kk, Cin]

        m = mask.astype(jnp.float32).reshape(b, ho, wo, kk)
        cols = jax.vmap(per_image)(x, idx4, w4, m)
        out = jnp.einsum(
            "bhwkc,kco->bhwo", cols.astype(jnp.float32),
            weight.reshape(kk, cin, -1).astype(jnp.float32))
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def dcn_block(x: jax.Array, p: dict, stride: int = 1, dilation: int = 1):
    """DCNv2 layer: offset conv (zero-init in the reference) + deform conv.

    p = {"offset": conv params producing 3*k*k channels, "weight"
    [k,k,Cin,Cout], "bias" or None}. Mask logits pass through sigmoid.
    """
    from tpuseg.nn import layers as L

    k = p["weight"].shape[0]
    kk = k * k
    om = L.conv2d(x, p["offset"], stride=stride, padding=dilation,
                  dilation=dilation)
    offsets = om[..., : 2 * kk]
    mask = jax.nn.sigmoid(om[..., 2 * kk:])
    return deform_conv2d(
        x, offsets, mask, p["weight"], p.get("bias"), kernel=k,
        stride=stride, padding=dilation, dilation=dilation)
