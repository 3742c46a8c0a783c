"""Stereo calibration: Kalibr parsing + Bouguet rectification vs OpenCV."""

import textwrap

import numpy as np
import cv2
import pytest

from odometry_tpu.camera.calibration import (
    MonoCalibration,
    StereoCalibration,
    _rodrigues,
    parse_kalibr_yaml,
    setup_stereo_from_kalibr,
    stereo_rectify,
)

W, H = 640, 482


@pytest.fixture
def calib():
    c0 = MonoCalibration(460.0, 458.0, 320.0, 240.0,
                         np.array([-0.28, 0.07, 1e-4, -2e-4]), W, H)
    c1 = MonoCalibration(457.0, 456.0, 322.0, 241.0,
                         np.array([-0.27, 0.065, 5e-5, 1e-4]), W, H)
    R10 = _rodrigues(np.array([0.004, -0.02, 0.003]))
    t10 = np.array([-0.11, 0.0005, 0.001])
    return StereoCalibration(c0, c1, R10, t10)


def test_rectify_matches_opencv(calib):
    c0, c1 = calib.cam0, calib.cam1
    K0 = np.array([[c0.fx, 0, c0.cx], [0, c0.fy, c0.cy], [0, 0, 1]])
    K1 = np.array([[c1.fx, 0, c1.cx], [0, c1.fy, c1.cy], [0, 0, 1]])
    d0 = np.array([*c0.distortion, 0.0])
    d1 = np.array([*c1.distortion, 0.0])
    R1c, R2c, P1c, P2c, Q, *_ = cv2.stereoRectify(
        K0, d0, K1, d1, (W, H), calib.R_10, calib.t_10.reshape(3, 1),
        flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1,
    )
    ours = stereo_rectify(calib)
    assert np.abs(ours.R_rect0 - R1c).max() < 1e-3
    assert np.abs(ours.R_rect1 - R2c).max() < 1e-3
    # Same-new-K maps agree to a few hundredths of a pixel.
    Pn = np.array([[ours.camera.fx, 0, ours.camera.cx],
                   [0, ours.camera.fy, ours.camera.cy], [0, 0, 1.0]])
    m0u, m0v = cv2.initUndistortRectifyMap(K0, d0, R1c, Pn, (W, H), cv2.CV_32FC1)
    m1u, m1v = cv2.initUndistortRectifyMap(K1, d1, R2c, Pn, (W, H), cv2.CV_32FC1)
    assert np.abs(ours.map0_u - m0u).max() < 0.05
    assert np.abs(ours.map0_v - m0v).max() < 0.05
    assert np.abs(ours.map1_u - m1u).max() < 0.05
    assert np.abs(ours.map1_v - m1v).max() < 0.05
    # Baseline from the rectified projection matrices.
    assert np.isclose(ours.camera.baseline, -P2c[0, 3] / P2c[0, 0], atol=1e-9)


def test_parse_kalibr_yaml(tmp_path):
    # Kalibr camchain shape (same schema the reference parses,
    # calibration_file/camchain.yaml).
    yaml_text = textwrap.dedent(
        """
        cam0:
          camera_model: pinhole
          intrinsics: [461.487, 460.110, 366.505, 249.541]
          distortion_model: radtan
          distortion_coeffs: [-0.2835, 0.0739, 0.000193, 0.0000176]
          resolution: [640, 482]
        cam1:
          camera_model: pinhole
          intrinsics: [460.273, 458.857, 369.885, 245.568]
          distortion_model: radtan
          distortion_coeffs: [-0.2833, 0.0743, 0.000198, 0.000178]
          resolution: [640, 482]
          T_cn_cnm1:
            - [0.9999, 0.0047, -0.0117, -0.1101]
            - [-0.0047, 0.9999, 0.0024, 0.0004]
            - [0.0117, -0.0025, 0.9999, -0.0008]
            - [0.0, 0.0, 0.0, 1.0]
        """
    )
    p = tmp_path / "camchain.yaml"
    p.write_text(yaml_text)
    calib = parse_kalibr_yaml(str(p))
    assert calib.cam0.fx == 461.487
    assert calib.cam1.width == 640
    assert np.isclose(calib.t_10[0], -0.1101)
    rect = setup_stereo_from_kalibr(str(p))
    assert rect.camera.height == 482
    assert 0.10 < rect.camera.baseline < 0.12
    assert rect.map0_u.shape == (482, 640)


def test_rectified_rows_align(calib):
    # Functional check: a 3D point projected through both RECTIFIED cameras
    # must land on the same row.
    ours = stereo_rectify(calib)
    rng = np.random.default_rng(0)
    pts = rng.uniform([-2, -1, 4], [2, 1, 12], (100, 3))
    cam = ours.camera
    # Rectified cam0 frame: R_rect0 applied to cam0 coords.
    p0 = pts @ ours.R_rect0.T
    # cam1 coords then rectified.
    p1 = (pts @ calib.R_10.T + calib.t_10) @ ours.R_rect1.T
    v0 = cam.fy * p0[:, 1] / p0[:, 2] + cam.cy
    v1 = cam.fy * p1[:, 1] / p1[:, 2] + cam.cy
    assert np.abs(v0 - v1).max() < 0.01
    # And disparity is positive with x-only offset.
    u0 = cam.fx * p0[:, 0] / p0[:, 2] + cam.cx
    u1 = cam.fx * p1[:, 0] / p1[:, 2] + cam.cx
    disp = u0 - u1
    assert np.all(disp > 0)
