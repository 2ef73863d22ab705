"""Fused on-device image preprocessing.

The reference does per-image cv2/PIL preprocessing on the host
(SURVEY.md §2.6 "Image preprocess (cv2/PIL on CPU)"); here the resize /
normalize / pad pipeline is jnp on device, batched, and fuses into the first
conv under jit. JPEG decode stays on the host (see ``tpuseg/data`` and the
native loader) — decoded uint8 tensors are the device boundary.

Input conventions reproduced (mAP parity dies here first — SURVEY §7 hard
part 4):
  - detectron / Mask R-CNN: BGR, shortest-edge-800 resize (cap 1333),
    mean subtraction without std (maskrcnn-benchmark INPUT.PIXEL_MEAN,
    README.md:307 BGR convert, min_image_size=800 README.md:322).
  - YOLACT: RGB 550x550 square resize, (x - mean) / std with ImageNet means
    in BGR order flipped to RGB (FastBaseTransform).
  - YOLOv3: RGB letterbox to 416/608, /255.
  - ViT: RGB resize 224, (x/255 - 0.5) / 0.5.
All outputs are NHWC float.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# ImageNet means/stds in RGB order (yolact MEANS/STD are BGR: reversed here)
IMAGENET_MEAN_RGB = (123.675, 116.28, 103.53)
IMAGENET_STD_RGB = (58.395, 57.12, 57.375)
# yolact data/config.py MEANS=(103.94,116.78,123.68) STD=(57.38,57.12,58.40)
# are BGR; the net consumes RGB (FastBaseTransform flips after normalize)
YOLACT_MEAN_RGB = (123.68, 116.78, 103.94)
YOLACT_STD_RGB = (58.40, 57.12, 57.38)
# maskrcnn-benchmark default PIXEL_MEAN (BGR order, used on BGR images)
DETECTRON_PIXEL_MEAN_BGR = (102.9801, 115.9465, 122.7717)


def resize_bilinear_exact(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers == cv2.resize INTER_LINEAR ==
    torch interpolate(align_corners=False). img [..., H, W, C].

    antialias=False is essential: jax.image.resize antialiases downscales by
    default, which neither cv2 nor the reference's torch interpolate does —
    the difference is large enough to move mAP (SURVEY §7 hard part 4).
    """
    shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1])
    if img.shape[-3:-1] == tuple(out_hw):  # identity resize: just cast
        return img.astype(jnp.float32)
    return jax.image.resize(
        img.astype(jnp.float32), shape, method="linear", antialias=False)


@functools.partial(jax.jit, static_argnames=("size",))
def yolact_preprocess(images_u8: jax.Array, size: int = 550) -> jax.Array:
    """uint8 RGB [B,H,W,3] -> normalized [B,size,size,3].

    Reference: Yolact.jittor utils/augmentations.py FastBaseTransform —
    resize to (size,size) bilinear, (x - MEANS)/STD with BGR-ordered
    constants on BGR input, then flip to RGB. We take RGB input and use the
    RGB-reordered constants — numerically identical.
    """
    x = resize_bilinear_exact(images_u8, (size, size))
    mean = jnp.asarray(YOLACT_MEAN_RGB, jnp.float32)
    std = jnp.asarray(YOLACT_STD_RGB, jnp.float32)
    return (x - mean) / std


@functools.partial(jax.jit, static_argnames=("target_h", "target_w"))
def detectron_preprocess(
    images_u8_bgr: jax.Array, target_h: int, target_w: int
) -> jax.Array:
    """uint8 BGR [B,H,W,3] -> mean-subtracted [B,target_h,target_w,3].

    The shortest-edge-800 target shape is computed on the host (static shape
    per config); this stage resizes and subtracts PIXEL_MEAN (BGR).
    """
    x = resize_bilinear_exact(images_u8_bgr, (target_h, target_w))
    return x - jnp.asarray(DETECTRON_PIXEL_MEAN_BGR, jnp.float32)


def detectron_target_size(h: int, w: int, min_size: int = 800, max_size: int = 1333):
    """maskrcnn-benchmark Resize.get_size: shortest edge -> min_size capped."""
    size = min_size
    mx = max(h, w)
    mn = min(h, w)
    if mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


def _bilinear_rows(coords: jax.Array, in_size: int) -> jax.Array:
    """coords [B, S] (clamped sample positions) -> [B, S, in_size] bilinear
    row-weight matrices: weight (1-f) at floor(c), f at min(floor(c)+1,
    in_size-1). When both corners clamp to the same index the one-hots
    coincide and the weights sum to 1 (border replicate)."""
    c0 = jnp.floor(coords)
    f = coords - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, in_size - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, in_size), 2)
    return ((iota == c0i[..., None]).astype(jnp.float32) * (1.0 - f)[..., None]
            + (iota == c1i[..., None]).astype(jnp.float32) * f[..., None])


@functools.partial(jax.jit, static_argnames=("size",))
def letterbox_preprocess(images_u8: jax.Array, hw, size: int = 416):
    """uint8 RGB [B,H,W,3] + per-image true (h, w) -> [B,size,size,3] in [0,1].

    YOLOv3 letterbox (utils/datasets.py): scale longest edge to ``size``,
    pad the rest with 0.5 gray. Batched with per-image sizes: images arrive
    zero-padded to a common [H, W]; we resize that canvas to (size, size)
    region proportional to each image and pad — implemented by sampling a
    per-image affine grid (scale differs per image, so a plain resize won't
    do). hw: int32 [B, 2].
    """
    b, ih, iw, c = images_u8.shape
    h = hw[:, 0].astype(jnp.float32)
    w = hw[:, 1].astype(jnp.float32)
    scale = size / jnp.maximum(h, w)
    new_h = h * scale
    new_w = w * scale
    pad_y = (size - new_h) * 0.5
    pad_x = (size - new_w) * 0.5
    # output pixel (i, j) samples input at ((i - pad_y)/scale, (j - pad_x)/scale)
    yy = jnp.arange(size, dtype=jnp.float32)[None, :, None]  # [1, S, 1]
    xx = jnp.arange(size, dtype=jnp.float32)[None, None, :]  # [1, 1, S]
    sy = (yy + 0.5 - pad_y[:, None, None]) / scale[:, None, None] - 0.5
    sx = (xx + 0.5 - pad_x[:, None, None]) / scale[:, None, None] - 0.5
    sy = jnp.broadcast_to(sy, (b, size, size))
    sx = jnp.broadcast_to(sx, (b, size, size))
    inside = (
        (sy > -1.0) & (sy < h[:, None, None])
        & (sx > -1.0) & (sx < w[:, None, None])
    )
    # clamp samples to the TRUE per-image extent (border replicate, like
    # cv2.resize): without this, edge output pixels bilinearly blend with
    # the zero-padded batch canvas and every image smaller than the batch
    # max gets a darkened 1px border
    sy_c = jnp.clip(sy[:, :, 0], 0.0, jnp.maximum(h[:, None] - 1.0, 0.0))
    sx_c = jnp.clip(sx[:, 0, :], 0.0, jnp.maximum(w[:, None] - 1.0, 0.0))
    # separable bilinear resampling as two batched matmuls (per-image
    # scales -> per-image [S, in] weight matrices built from iota one-hots;
    # the gather formulation this replaces cost 260 ms/16 imgs on TPU —
    # 23M 3-wide gathers — vs ~2 ms for the MXU form)
    ry = _bilinear_rows(sy_c, ih)  # [B, S, IH]
    rx = _bilinear_rows(sx_c, iw)  # [B, S, IW]
    img = images_u8.astype(jnp.float32)
    tmp = jnp.einsum("bsh,bhwc->bswc", ry, img,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bjw,biwc->bijc", rx, tmp,
                     precision=jax.lax.Precision.HIGHEST)
    out = out / 255.0
    return jnp.where(inside[..., None], out, 0.5)


@functools.partial(jax.jit, static_argnames=("size",))
def vit_preprocess(images_u8: jax.Array, size: int = 224) -> jax.Array:
    """uint8 RGB [B,H,W,3] -> [B,size,size,3], (x/255 - 0.5)/0.5."""
    x = resize_bilinear_exact(images_u8, (size, size))
    return (x / 255.0 - 0.5) / 0.5
