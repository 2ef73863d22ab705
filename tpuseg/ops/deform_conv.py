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

        s = ho * wo * kk
        wdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        # modulation is a per-sample scalar — fold it into the y hats
        wy = hat_matrix(sy.reshape(b, s), h, dtype=jnp.float32)
        wy = (wy * mask.astype(jnp.float32).reshape(b, s)[..., None]).astype(wdt)
        wx = hat_matrix(sx.reshape(b, s), w, dtype=wdt)
        # off-TPU an explicit method="onehot" runs the interpreted kernel
        interp = (pallas_pkg.pallas_interpret()
                  or jax.default_backend() != "tpu")
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
