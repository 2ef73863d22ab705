"""Host-side image decode (the only CPU stage of the inference pipeline)."""
from __future__ import annotations

import numpy as np


def _cv2_flags(cv2, ignore_orientation: bool) -> int:
    flags = cv2.IMREAD_COLOR
    if ignore_orientation:
        # Decode in the raw pixel frame (no EXIF auto-rotation). COCO json
        # metadata and gt polygons live in this frame, matching the
        # reference's PIL loaders; without the flag cv2 rotates EXIF-tagged
        # JPEGs and detections get scored against mis-aligned annotations.
        flags |= getattr(cv2, "IMREAD_IGNORE_ORIENTATION", 0)
    return flags


def load_image_rgb(path: str, *, ignore_orientation: bool = False) -> np.ndarray:
    """Decode an image file -> uint8 RGB HWC array (cv2 with PIL fallback).

    ``ignore_orientation=True`` decodes in the annotation frame (see
    :func:`_cv2_flags`); dataset loaders use it, display/demo paths do not.
    """
    try:
        import cv2

        img = cv2.imread(path, _cv2_flags(cv2, ignore_orientation))
        if img is None:
            raise IOError(f"cv2 failed to read {path}")
        return np.ascontiguousarray(img[:, :, ::-1])
    except ImportError:  # pragma: no cover
        from PIL import Image, ImageOps

        with Image.open(path) as im:
            if ignore_orientation:
                return np.asarray(im.convert("RGB"))
            # cv2.imread auto-applies EXIF orientation; the PIL path must
            # agree or the two backends decode rotated JPEGs differently
            return np.asarray(ImageOps.exif_transpose(im).convert("RGB"))


def load_image_bgr(path: str, *, ignore_orientation: bool = False) -> np.ndarray:
    """Decode -> uint8 BGR HWC (detectron convention, README.md:307).

    cv2.imread already returns BGR — read it directly instead of flipping
    to RGB and back (two full-image copies on the host decode path)."""
    try:
        import cv2

        img = cv2.imread(path, _cv2_flags(cv2, ignore_orientation))
        if img is None:
            raise IOError(f"cv2 failed to read {path}")
        return img
    except ImportError:  # pragma: no cover
        return np.ascontiguousarray(
            load_image_rgb(path, ignore_orientation=ignore_orientation)[:, :, ::-1])


def save_image_bgr(path: str, img_bgr: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, img_bgr)
