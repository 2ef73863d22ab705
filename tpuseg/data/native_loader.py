"""ctypes binding for the native C++ image loader (native/tpuseg_loader.cpp).

Builds the shared library on first use if the toolchain is available;
falls back to a cv2/PIL thread pool otherwise — same API either way.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtpuseg_loader.so"))


def _build_native() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


_lib = None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_native():
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.nl_create.restype = ctypes.c_void_p
        lib.nl_create.argtypes = [ctypes.c_int]
        lib.nl_destroy.argtypes = [ctypes.c_void_p]
        lib.nl_load_batch.restype = ctypes.c_int
        lib.nl_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


class NativeImageLoader:
    """Batch image loader: decode + resize on a C++ worker pool.

    load_batch(paths, out_h, out_w, keep_aspect) ->
        (images [N, out_h, out_w, 3] uint8 RGB, orig_hw [N, 2] int32)
    """

    def __init__(self, threads: int | None = None):
        self.threads = threads or max(os.cpu_count() or 1, 1)
        lib = _get_lib()
        self._native = bool(lib)
        if self._native:
            self._lib = lib
            self._handle = lib.nl_create(self.threads)
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(self.threads)

    @property
    def is_native(self) -> bool:
        return self._native

    def load_batch(self, paths: list[str], out_h: int, out_w: int,
                   keep_aspect: bool = False):
        """Both paths decode in the annotation frame (raw pixels, EXIF
        orientation ignored): the C++ decoder emits raw libjpeg pixels and
        the cv2 fallback passes IMREAD_IGNORE_ORIENTATION, so gt masks
        rasterized at the COCO json dims always match the decoded frame."""
        n = len(paths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        hw = np.empty((n, 2), np.int32)
        if self._native:
            arr = (ctypes.c_char_p * n)(
                *[p.encode() for p in paths])
            rc = self._lib.nl_load_batch(
                self._handle, arr, n, out_h, out_w, int(keep_aspect),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            )
            if rc == 0:
                return out, hw
            # libjpeg/libpng can't decode every format cv2 handles (CMYK
            # JPEG, BMP, TIFF, ...): retry the batch on the cv2 path
            # instead of aborting the whole eval run on one odd file
            import warnings

            warnings.warn(f"native decode failed for {paths[rc - 1]}; "
                          "falling back to cv2 for this batch")

        # fallback: cv2 threads (created lazily for native builds, which
        # only land here on a decode failure)
        if not hasattr(self, "_pool"):
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(self.threads)
        import cv2

        def one(i):
            from tpuseg.data.image_io import load_image_rgb

            img = load_image_rgb(paths[i], ignore_orientation=True)
            hw[i] = img.shape[:2]
            if keep_aspect:
                s = min(out_w / img.shape[1], out_h / img.shape[0])
                nw, nh = int(img.shape[1] * s + 0.5), int(img.shape[0] * s + 0.5)
                r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
                canvas = np.full((out_h, out_w, 3), 128, np.uint8)
                t, l = (out_h - nh) // 2, (out_w - nw) // 2
                canvas[t:t + nh, l:l + nw] = r
                out[i] = canvas
            else:
                out[i] = cv2.resize(img, (out_w, out_h),
                                    interpolation=cv2.INTER_LINEAR)

        list(self._pool.map(one, range(n)))
        return out, hw

    def __del__(self):
        if getattr(self, "_native", False):
            try:
                self._lib.nl_destroy(self._handle)
            except Exception:
                pass
