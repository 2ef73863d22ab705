"""Data-path review fixes: EXIF fallback parser, augment discard filter,
rleFrPoly negative-coordinate truncation, BGR direct read."""
import struct

import numpy as np
import pytest


def _make_jpeg_with_exif(path, orientation):
    """Minimal JPEG: SOI + APP1(Exif TIFF, little-endian, one IFD entry
    with tag 0x0112) + EOI. Only the header matters for the parser."""
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    tiff += struct.pack("<H", 1)  # one IFD entry
    tiff += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH",
                                                            orientation, 0)
    tiff += struct.pack("<I", 0)  # next IFD offset
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    path.write_bytes(b"\xff\xd8" + app1 + b"\xff\xd9")


def test_jpeg_exif_orientation_parser(tmp_path):
    from tpuseg.data.image_io import _jpeg_exif_orientation

    for o in (1, 3, 6, 8):
        p = tmp_path / f"o{o}.jpg"
        _make_jpeg_with_exif(p, o)
        assert _jpeg_exif_orientation(str(p)) == o
    # no EXIF -> 1; non-JPEG -> 1; missing file -> 1
    (tmp_path / "plain.jpg").write_bytes(b"\xff\xd8\xff\xd9")
    assert _jpeg_exif_orientation(str(tmp_path / "plain.jpg")) == 1
    (tmp_path / "not.jpg").write_bytes(b"PNG whatever")
    assert _jpeg_exif_orientation(str(tmp_path / "not.jpg")) == 1
    assert _jpeg_exif_orientation(str(tmp_path / "missing.jpg")) == 1


def test_exif_parser_agrees_with_pil_when_available(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    cv2 = pytest.importorskip("cv2")
    from tpuseg.data.image_io import _jpeg_exif_orientation

    # real JPEG via cv2, then splice our EXIF APP1 after the SOI
    img = np.random.default_rng(0).integers(
        0, 255, (16, 24, 3), dtype=np.uint8)
    p0 = tmp_path / "base.jpg"
    cv2.imwrite(str(p0), img)
    raw = p0.read_bytes()
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 6, 0)
    tiff += struct.pack("<I", 0)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    p = tmp_path / "exif6.jpg"
    p.write_bytes(raw[:2] + app1 + raw[2:])
    assert _jpeg_exif_orientation(str(p)) == 6
    with PIL.open(str(p)) as im:
        assert int(im.getexif().get(0x0112, 1)) == 6


def test_ssd_augment_discards_degenerate_boxes(rng):
    from tpuseg.data.augment import AugmentConfig, ssd_augment

    cfg = AugmentConfig(size=64)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes = np.asarray([[10, 10, 40, 40],
                        [20, 20, 20.001, 35]], np.float32)  # ~0-width
    classes = np.asarray([1, 2], np.int32)
    masks = np.zeros((2, 64, 64), np.uint8)
    masks[:, 10:40, 10:40] = 1
    # fixed generator: whatever augmentation path is taken, the ~0-width
    # box must never survive the Resize discard
    for seed in range(5):
        r = np.random.default_rng(seed)
        out = ssd_augment(r, img, boxes.copy(), classes.copy(),
                          masks.copy(), AugmentConfig(size=64))
        _, b, c, m = out[:4]
        w = (b[:, 2] - b[:, 0]) * cfg.size
        h = (b[:, 3] - b[:, 1]) * cfg.size
        assert np.all(w > cfg.discard_box_width)
        assert np.all(h > cfg.discard_box_height)
        assert len(b) == len(c)
        if len(m):
            assert len(m) == len(b)


def test_poly_to_rle_negative_coordinate_truncation():
    """(int) casts in rleFrPoly truncate toward zero; polygons with
    slightly negative vertices must quantize like the C code, not floor."""
    from tpuseg.eval.rle import decode, poly_to_rle

    poly = [-0.3, -0.3, 8.0, -0.2, 8.0, 8.0, -0.3, 8.0]
    r = poly_to_rle(np.asarray(poly), 12, 12)
    m = decode(r)
    assert m.shape == (12, 12)
    # the polygon covers roughly [0,8)x[0,8); area must be close
    assert 40 <= int(m.sum()) <= 81
    # and the mask must include the origin pixel (negative coords clamp
    # to 0 under truncation; floor would shift the boundary off-grid)
    assert m[0, 0] == 1


def test_load_image_bgr_matches_rgb_flip(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from tpuseg.data.image_io import load_image_bgr, load_image_rgb

    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    bgr = load_image_bgr(p)
    rgb = load_image_rgb(p)
    np.testing.assert_array_equal(bgr, rgb[:, :, ::-1])
    np.testing.assert_array_equal(bgr, img)


def _apply_exif_orientation(img, o):
    """raw -> displayed frame, per the EXIF spec (what decoders apply)."""
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return img.transpose(1, 0, 2)
    if o == 6:
        return np.rot90(img, -1)  # rotate 90 CW
    if o == 7:
        return img[::-1, ::-1].transpose(1, 0, 2)
    if o == 8:
        return np.rot90(img, 1)  # rotate 90 CCW
    return img


def test_unrotate_inverts_every_exif_orientation(rng):
    from tpuseg.data.image_io import _unrotate

    img = rng.integers(0, 255, (6, 10, 3), dtype=np.uint8)
    for o in range(1, 9):
        disp = _apply_exif_orientation(img, o)
        np.testing.assert_array_equal(_unrotate(disp, o), img,
                                      err_msg=f"orientation {o}")


def test_unrotate_agrees_with_pil_exif_transpose(rng):
    """PIL's exif_transpose is the raw->displayed reference; _unrotate must
    be its exact inverse for every orientation."""
    PIL = pytest.importorskip("PIL.Image")
    from PIL import ImageOps

    from tpuseg.data.image_io import _unrotate

    raw = rng.integers(0, 255, (6, 10, 3), dtype=np.uint8)
    for o in range(1, 9):
        im = PIL.fromarray(raw)
        exif = im.getexif()
        exif[0x0112] = o
        im.info["exif"] = exif.tobytes()
        disp = np.asarray(ImageOps.exif_transpose(im))
        np.testing.assert_array_equal(_unrotate(disp, o), raw,
                                      err_msg=f"orientation {o}")


def test_cv2_autorotate_probe_runs():
    """The probe must return a bool without raising; on builds that HAVE
    IMREAD_IGNORE_ORIENTATION its value is not consulted, but the imread
    round-trip it performs must still work."""
    cv2 = pytest.importorskip("cv2")
    from tpuseg.data import image_io

    image_io._CV2_AUTOROTATES = None  # force a fresh probe
    assert image_io._cv2_autorotates(cv2) in (True, False)
