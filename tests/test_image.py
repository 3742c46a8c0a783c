"""Golden tests for image ops against OpenCV (the reference's backend)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from odometry_tpu.image import (
    gaussian_blur3,
    pyr_down,
    median_blur3,
    gaussian_image_pyramid,
    depth_pyramid,
    central_gradients,
    sample_floor,
    sample_bilinear,
)


@pytest.fixture
def img(rng):
    return (rng.random((96, 128)) * 255.0).astype(np.float32)


def test_gaussian_blur3_matches_cv2(img):
    ours = np.asarray(gaussian_blur3(jnp.asarray(img)))
    ref = cv2.GaussianBlur(img, (3, 3), 0)
    assert np.allclose(ours, ref, atol=1e-3)


def test_pyr_down_matches_cv2(img):
    h, w = img.shape
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    ref = cv2.pyrDown(img, dstsize=(w // 2, h // 2))
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=1e-2)


def test_pyr_down_odd_width():
    # KITTI is 1241 wide: pyrDown with forced floor size must still match.
    rng = np.random.default_rng(1)
    img = (rng.random((376, 1241)) * 255.0).astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    ref = cv2.pyrDown(img, dstsize=(1241 // 2, 376 // 2))
    assert ours.shape == (188, 620)
    assert np.allclose(ours, ref, atol=1e-2)


def test_median_blur3_matches_cv2(img):
    ours = np.asarray(median_blur3(jnp.asarray(img)))
    ref = cv2.medianBlur(img, 3)
    assert np.allclose(ours, ref, atol=1e-4)


def test_image_pyramid_structure(img):
    pyr = gaussian_image_pyramid(jnp.asarray(img), 4, smooth=True)
    assert len(pyr) == 4
    assert pyr[0].shape == (96, 128)
    assert pyr[1].shape == (48, 64)
    assert pyr[2].shape == (24, 32)
    assert pyr[3].shape == (12, 16)
    # Level 0 is blur3 of input; level 1 is pyrDown of the RAW input
    # (image_processing_global.cpp:29-38).
    assert np.allclose(np.asarray(pyr[0]), cv2.GaussianBlur(img, (3, 3), 0), atol=1e-3)
    assert np.allclose(np.asarray(pyr[1]), cv2.pyrDown(img, dstsize=(64, 48)), atol=1e-2)
    assert np.allclose(
        np.asarray(pyr[2]), cv2.pyrDown(np.asarray(pyr[1]), dstsize=(32, 24)), atol=1e-2
    )


def test_depth_pyramid_odd_decimation(rng):
    dep = (rng.random((96, 128)).astype(np.float32) > 0.9) * rng.random((96, 128)).astype(
        np.float32
    )
    pyr = depth_pyramid(jnp.asarray(dep), 4, smooth=False)
    # Reference decimates at odd indices (image_processing_global.cpp:85-103).
    np.testing.assert_array_equal(np.asarray(pyr[0]), dep)
    l1 = np.asarray(pyr[1])
    for y in range(4):
        for x in range(4):
            assert l1[y, x] == dep[y * 2 + 1, x * 2 + 1]
    l2 = np.asarray(pyr[2])
    assert l2[3, 5] == l1[7, 11]


def test_central_gradients_matches_pixelwise(img):
    gx, gy = central_gradients(jnp.asarray(img))
    gx, gy = np.asarray(gx), np.asarray(gy)
    h, w = img.shape
    # Interior: plain central differences.
    y, x = 10, 20
    assert np.isclose(gx[y, x], 0.5 * (img[y, x + 1] - img[y, x - 1]))
    assert np.isclose(gy[y, x], 0.5 * (img[y + 1, x] - img[y - 1, x]))
    # Borders: clamped like ComputePixelGradient (image_processing_global.h:62-69).
    assert np.isclose(gx[5, 0], 0.5 * (img[5, 1] - img[5, 0]))
    assert np.isclose(gx[5, w - 1], 0.5 * (img[5, w - 1] - img[5, w - 2]))
    assert np.isclose(gy[0, 7], 0.5 * (img[1, 7] - img[0, 7]))
    assert np.isclose(gy[h - 1, 7], 0.5 * (img[h - 1, 7] - img[h - 2, 7]))


def test_sample_floor(img):
    u = jnp.asarray([3.7, 10.1, 0.0])
    v = jnp.asarray([5.2, 80.9, 0.5])
    out = np.asarray(sample_floor(jnp.asarray(img), u, v))
    assert out[0] == img[5, 3]
    assert out[1] == img[80, 10]
    assert out[2] == img[0, 0]


def test_sample_bilinear_exact_on_integers(img):
    u = jnp.asarray([3.0, 10.0])
    v = jnp.asarray([5.0, 80.0])
    out = np.asarray(sample_bilinear(jnp.asarray(img), u, v))
    assert np.allclose(out, [img[5, 3], img[80, 10]])


def test_sample_bilinear_midpoint(img):
    out = np.asarray(
        sample_bilinear(jnp.asarray(img), jnp.asarray([3.5]), jnp.asarray([5.5]))
    )
    expected = 0.25 * (img[5, 3] + img[5, 4] + img[6, 3] + img[6, 4])
    assert np.allclose(out, expected, atol=1e-4)
