"""Native C++ loader tests: build, decode parity vs cv2, threaded batch."""

import time

import cv2
import numpy as np
import pytest

from macvo_tpu import native


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        p = root / f"img_{i}.png"
        cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
    return paths


def test_native_builds():
    assert native.available(), "native loader failed to build on this image"


def test_decode_matches_cv2(png_files):
    p = png_files[0]
    ours = native.decode_png(p)
    assert ours is not None and ours.shape == (48, 64, 3)
    ref = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_decode_batch(png_files):
    pool = native.NativeDecodePool(4)
    try:
        out = pool.decode_batch(png_files, 48, 64)
        assert out.shape == (8, 48, 64, 3)
        for i, p in enumerate(png_files):
            ref = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            np.testing.assert_allclose(out[i], ref, atol=1e-6)
        with pytest.raises(IOError):
            pool.decode_batch([png_files[0].parent / "missing.png"], 48, 64)
    finally:
        pool.close()


def test_decode_failure_returns_none(tmp_path):
    bad = tmp_path / "not_a_png.png"
    bad.write_bytes(b"garbage")
    assert native.decode_png(bad) is None


def test_load_image_uses_native(png_files):
    from macvo_tpu.data.datasets.tartanair import load_image

    img = load_image(png_files[0])
    assert img.shape == (1, 48, 64, 3)
    ref = cv2.cvtColor(cv2.imread(str(png_files[0])), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    np.testing.assert_allclose(img[0], ref, atol=1e-6)
