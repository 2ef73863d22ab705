"""Host-side image decode (the only CPU stage of the inference pipeline)."""
from __future__ import annotations

import numpy as np


def _jpeg_exif_orientation(path: str) -> int:
    """EXIF Orientation (tag 0x0112) parsed straight from the JPEG APP1
    segment's embedded TIFF header — PIL-free. Returns 1 when the file is
    not a JPEG, has no EXIF, or the header is malformed."""
    try:
        with open(path, "rb") as f:
            if f.read(2) != b"\xff\xd8":  # SOI
                return 1
            while True:
                marker = f.read(2)
                if len(marker) < 2 or marker[0] != 0xFF:
                    return 1
                if marker[1] in (0xD8, 0x01) or 0xD0 <= marker[1] <= 0xD7:
                    continue  # standalone markers, no length field
                size = int.from_bytes(f.read(2), "big")
                if marker[1] == 0xDA:  # SOS: image data, no EXIF past here
                    return 1
                body = f.read(size - 2)
                if marker[1] != 0xE1 or not body.startswith(b"Exif\x00\x00"):
                    continue
                tiff = body[6:]
                if len(tiff) < 8:
                    return 1
                endian = "little" if tiff[:2] == b"II" else "big"
                off = int.from_bytes(tiff[4:8], endian)
                if off + 2 > len(tiff):
                    return 1
                count = int.from_bytes(tiff[off:off + 2], endian)
                for i in range(count):
                    e = off + 2 + 12 * i
                    if e + 12 > len(tiff):
                        return 1
                    tag = int.from_bytes(tiff[e:e + 2], endian)
                    if tag == 0x0112:
                        val = int.from_bytes(tiff[e + 8:e + 10], endian)
                        return val if 1 <= val <= 8 else 1
                return 1
    except Exception:
        return 1


def _unrotate(img: np.ndarray, orientation: int) -> np.ndarray:
    """Invert an applied EXIF orientation: displayed frame -> raw
    (annotation) frame. Orientations 2-8 per the EXIF spec; flips and
    diagonal transposes are involutions, rotations invert by rotating the
    other way."""
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1]
    if orientation == 5:  # main-diagonal transpose
        return img.transpose(1, 0, 2)
    if orientation == 6:  # displayed = rot90 CW(raw)
        return np.rot90(img, 1)
    if orientation == 7:  # anti-diagonal transpose
        return img[::-1, ::-1].transpose(1, 0, 2)
    if orientation == 8:  # displayed = rot90 CCW(raw)
        return np.rot90(img, -1)
    return img


_CV2_AUTOROTATES: bool | None = None  # lazily probed once per process


def _cv2_autorotates(cv2) -> bool:
    """Whether this cv2 build auto-applies EXIF orientation in imread.
    Only consulted when IMREAD_IGNORE_ORIENTATION is absent (builds
    roughly 3.1-3.4 rotate with no opt-out; older ones never rotate, so
    un-rotating would corrupt them). Probed once with a synthetic
    orientation-6 JPEG written to a temp file."""
    global _CV2_AUTOROTATES
    if _CV2_AUTOROTATES is None:
        import os
        import struct
        import tempfile

        try:
            ok, buf = cv2.imencode(".jpg", np.zeros((8, 16, 3), np.uint8))
            raw = buf.tobytes()
            tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            tiff += struct.pack("<H", 1)
            tiff += struct.pack("<HHI", 0x0112, 3, 1)
            tiff += struct.pack("<HH", 6, 0)
            tiff += struct.pack("<I", 0)
            body = b"Exif\x00\x00" + tiff
            app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
            fd, tmp = tempfile.mkstemp(suffix=".jpg")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(raw[:2] + app1 + raw[2:])
                out = cv2.imread(tmp, cv2.IMREAD_COLOR)
            finally:
                os.unlink(tmp)
            # orientation 6 swaps dims when applied
            _CV2_AUTOROTATES = out is not None and out.shape[:2] == (16, 8)
        except Exception:
            _CV2_AUTOROTATES = False
    return _CV2_AUTOROTATES


def _cv2_flags(cv2, ignore_orientation: bool) -> int:
    flags = cv2.IMREAD_COLOR
    if ignore_orientation:
        # Decode in the raw pixel frame (no EXIF auto-rotation). COCO json
        # metadata and gt polygons live in this frame, matching the
        # reference's PIL loaders; without the flag cv2 rotates EXIF-tagged
        # JPEGs and detections get scored against mis-aligned annotations.
        flags |= getattr(cv2, "IMREAD_IGNORE_ORIENTATION", 0)
    return flags


def _conform_to_raw_frame(cv2, img: np.ndarray, path: str) -> np.ndarray:
    """On cv2 builds lacking IMREAD_IGNORE_ORIENTATION that DO auto-rotate,
    undo the rotation so dataset loaders still see the annotation frame."""
    if hasattr(cv2, "IMREAD_IGNORE_ORIENTATION") or not _cv2_autorotates(cv2):
        return img
    o = _jpeg_exif_orientation(path)
    if o == 1:
        return img
    return np.ascontiguousarray(_unrotate(img, o))


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
        if ignore_orientation:
            img = _conform_to_raw_frame(cv2, img, path)
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
        if ignore_orientation:
            img = _conform_to_raw_frame(cv2, img, path)
        return img
    except ImportError:  # pragma: no cover
        return np.ascontiguousarray(
            load_image_rgb(path, ignore_orientation=ignore_orientation)[:, :, ::-1])


def save_image_bgr(path: str, img_bgr: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, img_bgr)
