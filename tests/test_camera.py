"""Tests for the pinhole camera model and level-scaling recursion."""

import numpy as np
import jax.numpy as jnp

from odometry_tpu.camera import (
    Pinhole,
    level_intrinsics,
    intrinsic_pyramid,
    backproject,
    project,
    warp_points,
)
from odometry_tpu.geometry import se3_exp


KITTI = Pinhole.create(718.856, 718.856, 607.1928, 185.2157)


def _get_c_level(c, level):
    # GetCxLevel, image_processing_global.h:22-28
    for _ in range(level):
        c = (c + 0.5) / 2.0 + 0.5
    return c


def test_level_intrinsics_match_reference_recursion():
    for level in range(4):
        cam_l = level_intrinsics(KITTI, level)
        assert np.isclose(float(cam_l.fx), 718.856 / 2**level)
        assert np.isclose(float(cam_l.cx), _get_c_level(607.1928, level), atol=1e-4)
        assert np.isclose(float(cam_l.cy), _get_c_level(185.2157, level), atol=1e-4)


def test_intrinsic_pyramid():
    pyr = intrinsic_pyramid(KITTI, 4)
    assert len(pyr) == 4
    assert np.isclose(float(pyr[3].fx), 718.856 / 8)


def test_backproject_project_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1240, size=100).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 375, size=100).astype(np.float32))
    z = jnp.asarray(rng.uniform(1.0, 30.0, size=100).astype(np.float32))
    X, Y, Z = backproject(KITTI, x, y, z)
    u, v = project(KITTI, X, Y, Z)
    assert np.allclose(np.asarray(u), np.asarray(x), atol=1e-2)
    assert np.allclose(np.asarray(v), np.asarray(y), atol=1e-2)


def test_warp_points_identity(rng):
    x = jnp.asarray(rng.uniform(10, 1200, size=50).astype(np.float32))
    y = jnp.asarray(rng.uniform(10, 360, size=50).astype(np.float32))
    z = jnp.asarray(rng.uniform(1.0, 30.0, size=50).astype(np.float32))
    X, Y, Z = backproject(KITTI, x, y, z)
    T = jnp.eye(4)
    u, v, Zw, valid = warp_points(KITTI, T, X, Y, Z, 376, 1241)
    assert np.allclose(np.asarray(u), np.asarray(x), atol=1e-2)
    assert np.allclose(np.asarray(v), np.asarray(y), atol=1e-2)
    assert np.all(np.asarray(valid))


def test_warp_points_invalid_behind_camera():
    X = jnp.asarray([0.0])
    Y = jnp.asarray([0.0])
    Z = jnp.asarray([2.0])
    # Translate points behind the camera.
    T = jnp.eye(4).at[2, 3].set(-5.0)
    _, _, Zw, valid = warp_points(KITTI, T, X, Y, Z, 376, 1241)
    assert np.asarray(Zw)[0] < 0
    assert not np.asarray(valid)[0]


def test_warp_points_out_of_bounds():
    # A point that projects far off-image after a big yaw must be masked.
    X = jnp.asarray([0.0])
    Y = jnp.asarray([0.0])
    Z = jnp.asarray([5.0])
    T = se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.2, 0.0]))  # ~69deg yaw
    _, _, _, valid = warp_points(KITTI, T, X, Y, Z, 376, 1241)
    assert not np.asarray(valid)[0]
