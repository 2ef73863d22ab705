import numpy as np
import pytest


def test_native_loader_roundtrip(tmp_path, rng):
    import cv2

    from tpuseg.data.native_loader import NativeImageLoader

    paths = []
    for i in range(4):
        img = rng.integers(0, 255, (60 + i * 13, 80 + i * 7, 3)).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, img[:, :, ::-1])
        paths.append(p)
    png = rng.integers(0, 255, (50, 40, 3)).astype(np.uint8)
    ppath = str(tmp_path / "im.png")
    cv2.imwrite(ppath, png[:, :, ::-1])
    paths.append(ppath)

    ldr = NativeImageLoader(2)
    out, hw = ldr.load_batch(paths, 64, 64)
    assert out.shape == (5, 64, 64, 3)
    assert list(hw[0]) == [60, 80]
    assert list(hw[-1]) == [50, 40]
    # resize parity vs cv2 INTER_LINEAR (native path bit-rounds within 1)
    want = cv2.resize(cv2.imread(paths[0])[:, :, ::-1], (64, 64),
                      interpolation=cv2.INTER_LINEAR)
    assert np.abs(out[0].astype(int) - want.astype(int)).max() <= 2
    # png decodes losslessly: resize back comparison
    want_png = cv2.resize(png, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out[-1].astype(int) - want_png.astype(int)).max() <= 2

    # letterbox mode: gray fill outside, original content centered
    out2, _ = ldr.load_batch(paths[:1], 64, 64, keep_aspect=True)
    assert tuple(out2[0, 0, 0]) == (128, 128, 128)


def test_native_loader_missing_file(tmp_path):
    from tpuseg.data.native_loader import NativeImageLoader

    ldr = NativeImageLoader(1)
    if not ldr.is_native:
        pytest.skip("native loader unavailable")
    with pytest.raises(IOError):
        ldr.load_batch([str(tmp_path / "nope.jpg")], 32, 32)
