"""Native C++ PNG decoder + prefetcher vs PIL golden."""

import numpy as np
import pytest
from PIL import Image

from odometry_tpu.data.native_loader import (
    NativeLoaderUnavailable,
    StereoPrefetcher,
    png_read_gray,
)


@pytest.fixture(scope="module", autouse=True)
def _native_available():
    try:
        import odometry_tpu.data.native_loader as nl

        nl._load()
    except NativeLoaderUnavailable as e:
        pytest.skip(f"native toolchain unavailable: {e}")


def _write_png(path, arr, mode):
    Image.fromarray(arr, mode=mode).save(path)


def test_decode_grayscale(tmp_path, rng):
    arr = (rng.random((48, 64)) * 255).astype(np.uint8)
    p = str(tmp_path / "g.png")
    _write_png(p, arr, "L")
    out = png_read_gray(p)
    assert out.dtype == np.float32
    assert np.array_equal(out, arr.astype(np.float32))


def test_decode_rgb_matches_opencv_gray(tmp_path, rng):
    import cv2

    arr = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "c.png")
    _write_png(p, arr, "RGB")
    out = png_read_gray(p)
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    # Same BT.601 weights; rounding may differ by 1 intensity level.
    assert np.abs(out - ref).max() <= 1.0


def test_decode_large_textured(tmp_path, rng):
    # Exercise all scanline filters via a compressible natural-ish image.
    x = np.linspace(0, 8 * np.pi, 512)
    y = np.linspace(0, 6 * np.pi, 200)
    img = (127 + 100 * np.outer(np.sin(y), np.cos(x))).astype(np.uint8)
    p = str(tmp_path / "t.png")
    _write_png(p, img, "L")
    out = png_read_gray(p)
    assert np.array_equal(out, img.astype(np.float32))


def test_prefetcher_stream(tmp_path, rng):
    lefts, rights, ref = [], [], []
    for i in range(6):
        a = (rng.random((30, 44)) * 255).astype(np.uint8)
        b = (rng.random((30, 44)) * 255).astype(np.uint8)
        lp, rp = str(tmp_path / f"{i}_l.png"), str(tmp_path / f"{i}_r.png")
        _write_png(lp, a, "L")
        _write_png(rp, b, "L")
        lefts.append(lp)
        rights.append(rp)
        ref.append((a, b))
    stream = StereoPrefetcher(lefts, rights, 30, 44, prefetch=3, num_threads=2)
    got = list(stream)
    assert len(got) == 6
    for (l, r), (a, b) in zip(got, ref):
        assert np.array_equal(l, a.astype(np.float32))
        assert np.array_equal(r, b.astype(np.float32))


def test_decode_missing_file_raises():
    with pytest.raises(IOError):
        png_read_gray("/nonexistent/file.png")
