"""SSD-style training augmentation (Yolact.jittor utils/augmentations.py).

Host-side numpy/cv2 pipeline matching SSDAugmentation's stages:
photometric distort -> expand -> random sample crop -> random mirror ->
resize (to the square train size) -> normalize. Operates on
(image RGB float, boxes xyxy px, classes, masks [N,H,W]) jointly.
"""
from __future__ import annotations

import numpy as np


class AugmentConfig:
    def __init__(self, size=550, mean=(123.68, 116.78, 103.94),
                 std=(58.40, 57.12, 57.38),
                 discard_box_width=4 / 550, discard_box_height=4 / 550):
        self.size = size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        # upstream Resize's post-resize discard thresholds, in absolute
        # pixels of the resized image (yolact config.py discard_box_*:
        # 4/550 px — drops degenerate boxes the crop clipped to ~zero)
        self.discard_box_width = discard_box_width
        self.discard_box_height = discard_box_height


def photometric_distort(rng, img):
    """PhotometricDistort (ssd.pytorch via yolact): float pipeline
    throughout (no uint8 quantization between steps), hue jitter +-18 on
    the float-HSV 0-360 degree scale, contrast before-or-after HSV with
    50% each, and the trailing RandomLightingNoise channel swap."""
    import cv2

    img = img.astype(np.float32)
    if rng.random() < 0.5:  # RandomBrightness(32)
        img += rng.uniform(-32, 32)

    def contrast(im):
        if rng.random() < 0.5:  # RandomContrast(0.5, 1.5)
            im = im * rng.uniform(0.5, 1.5)
        return im

    contrast_first = rng.random() < 0.5
    if contrast_first:
        img = contrast(img)
    # float32 0-255 input -> H in [0, 360), S in [0, 1], V in [0, 255]
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    if rng.random() < 0.5:  # RandomSaturation(0.5, 1.5)
        hsv[:, :, 1] *= rng.uniform(0.5, 1.5)
    if rng.random() < 0.5:  # RandomHue(18.0) with the reference's wrap
        hsv[:, :, 0] += rng.uniform(-18, 18)
        hsv[:, :, 0][hsv[:, :, 0] > 360.0] -= 360.0
        hsv[:, :, 0][hsv[:, :, 0] < 0.0] += 360.0
    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if not contrast_first:
        img = contrast(img)
    if rng.random() < 0.5:  # RandomLightingNoise: random channel order
        perms = ((0, 1, 2), (0, 2, 1), (1, 0, 2),
                 (1, 2, 0), (2, 0, 1), (2, 1, 0))
        img = img[:, :, perms[rng.integers(len(perms))]]
    return img


def expand(rng, img, boxes, masks, mean):
    if rng.random() < 0.5:
        return img, boxes, masks
    h, w, c = img.shape
    ratio = rng.uniform(1.0, 4.0)
    left = rng.uniform(0, w * ratio - w)
    top = rng.uniform(0, h * ratio - h)
    eh, ew = int(h * ratio), int(w * ratio)
    out = np.empty((eh, ew, c), img.dtype)
    out[:] = mean
    t, l = int(top), int(left)
    out[t:t + h, l:l + w] = img
    boxes = boxes.copy()
    boxes[:, 0::2] += l
    boxes[:, 1::2] += t
    if len(masks):
        m = np.zeros((len(masks), eh, ew), masks.dtype)
        m[:, t:t + h, l:l + w] = masks
        masks = m
    return out, boxes, masks


def random_sample_crop(rng, img, boxes, classes, masks, max_tries=50,
                       iscrowd=None):
    """RandomSampleCrop: pick a min-IoU mode, try crops keeping gt centers."""
    h, w = img.shape[:2]
    modes = (None, 0.1, 0.3, 0.7, 0.9, -1.0)
    mode = modes[rng.integers(len(modes))]
    if mode is None or len(boxes) == 0:
        return img, boxes, classes, masks, iscrowd
    for _ in range(max_tries):
        cw = rng.uniform(0.3 * w, w)
        chh = rng.uniform(0.3 * h, h)
        if chh / cw < 0.5 or chh / cw > 2:
            continue
        left = rng.uniform(0, w - cw)
        top = rng.uniform(0, h - chh)
        rect = np.array([left, top, left + cw, top + chh])
        # NOTE: the reference's min-IoU constraint is a documented no-op
        # (yolact augmentations.py keeps the ssd.pytorch bug on purpose —
        # "fixing it cut mAP in half"); enforcing it here rejected nearly
        # every crop on multi-object images. Crops are accepted on the
        # center-in-crop test alone, like the reference effectively does.
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2
        keep = (
            (centers[:, 0] > rect[0]) & (centers[:, 0] < rect[2])
            & (centers[:, 1] > rect[1]) & (centers[:, 1] < rect[3])
        )
        if not keep.any():
            continue
        if iscrowd is not None and not (keep & ~iscrowd).any():
            # reference requires at least one NON-crowd gt in the crop
            continue
        l, t, r, btm = rect.astype(int)
        img = img[t:btm, l:r]
        boxes = boxes[keep].copy()
        boxes[:, 0::2] = np.clip(boxes[:, 0::2] - l, 0, r - l)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2] - t, 0, btm - t)
        classes = classes[keep]
        if iscrowd is not None:
            iscrowd = iscrowd[keep]
        if len(masks):
            masks = masks[keep][:, t:btm, l:r]
        return img, boxes, classes, masks, iscrowd
    return img, boxes, classes, masks, iscrowd


def random_mirror(rng, img, boxes, masks):
    if rng.random() < 0.5:
        w = img.shape[1]
        img = img[:, ::-1]
        boxes = boxes.copy()
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        if len(masks):
            masks = masks[:, :, ::-1]
    return img, boxes, masks


def ssd_augment(rng: np.random.Generator, img_rgb_u8: np.ndarray,
                boxes: np.ndarray, classes: np.ndarray, masks: np.ndarray,
                cfg: AugmentConfig, iscrowd: np.ndarray | None = None):
    """Full SSDAugmentation -> (img [S,S,3] float normalized, boxes
    normalized xyxy, classes, masks [N,S,S] u8[, iscrowd]).

    ``iscrowd`` rides along through the crop's keep-filter (the reference
    keeps crowd gts — label -1 — so matching can neutralize anchors over
    crowd regions)."""
    import cv2

    img = photometric_distort(rng, img_rgb_u8)
    img, boxes, masks = expand(rng, img, boxes, masks, cfg.mean)
    img, boxes, classes, masks, iscrowd = random_sample_crop(
        rng, img, boxes, classes, masks, iscrowd=iscrowd)
    img, boxes, masks = random_mirror(rng, img, boxes, masks)
    h, w = img.shape[:2]
    img = cv2.resize(img, (cfg.size, cfg.size), interpolation=cv2.INTER_LINEAR)
    if len(masks):
        masks = np.stack([
            cv2.resize(m.astype(np.float32), (cfg.size, cfg.size),
                       interpolation=cv2.INTER_LINEAR) > 0.5
            for m in masks
        ]).astype(np.uint8)
    boxes = boxes.astype(np.float32).copy()
    boxes[:, 0::2] /= w
    boxes[:, 1::2] /= h
    # Resize's discard: drop boxes whose RESIZED extent is below the
    # (tiny) absolute-pixel thresholds — reference augmentations.Resize
    # keep = (w > discard_box_width) * (h > discard_box_height)
    if len(boxes):
        bw = (boxes[:, 2] - boxes[:, 0]) * cfg.size
        bh = (boxes[:, 3] - boxes[:, 1]) * cfg.size
        keep = (bw > cfg.discard_box_width) & (bh > cfg.discard_box_height)
        boxes, classes = boxes[keep], classes[keep]
        masks = masks[keep] if len(masks) else masks
        if iscrowd is not None:
            iscrowd = iscrowd[keep]
    img = (img - cfg.mean) / cfg.std
    if iscrowd is not None:
        return img.astype(np.float32), boxes, classes, masks, iscrowd
    return img.astype(np.float32), boxes, classes, masks
