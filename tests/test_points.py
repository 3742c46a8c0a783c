"""Parity: the point engine must reproduce the dense engine exactly."""

import numpy as np
import pytest
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole, intrinsic_pyramid
from odometry_tpu.config import TrackerConfig, CameraConfig, DepthConfig
from odometry_tpu.data.synthetic import make_scene, render, render_stereo
from odometry_tpu.geometry import se3_exp, se3_inverse
from odometry_tpu.image import gaussian_image_pyramid, depth_pyramid, gaussian_blur3
from odometry_tpu.kernels.photometric import residual_jacobian, normal_equations
from odometry_tpu.kernels.points import (
    extract_points,
    depth_point_pyramid,
    residual_jacobian_points,
    normal_equations_points,
)
from odometry_tpu.kernels.select import select_points
from odometry_tpu.solvers.robust import robust_weights
from odometry_tpu.tracking.tracker import prepare_keyframe, solve_pose, solve_pose_points

H, W = 96, 160
CAM = Pinhole.create(240.0, 240.0, W / 2.0, H / 2.0)


def _scene_pair():
    scene = make_scene(21, depth=11.0)
    img_kf, z = render(scene, CAM, jnp.eye(4), H, W)
    T2 = se3_exp(jnp.asarray([0.15, -0.03, 0.3, 0.002, -0.004, 0.001], jnp.float32))
    img_cur, _ = render(scene, CAM, T2, H, W)
    rng = np.random.default_rng(3)
    inv = np.array(1.0 / z)  # writable copy
    inv[rng.random(inv.shape) < 0.9] = 0.0  # semi-dense
    return img_kf, jnp.asarray(inv), img_cur, se3_inverse(T2)


def test_extract_points_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.random((20, 30)).astype(np.float32)
    mask = rng.random((20, 30)) < 0.2
    pts = extract_points(jnp.asarray(vals), jnp.asarray(mask), capacity=256)
    n = int(pts.num)
    assert n == mask.sum()
    ys = np.asarray(pts.ys[:n]).astype(int)
    xs = np.asarray(pts.xs[:n]).astype(int)
    assert np.all(mask[ys, xs])
    assert np.allclose(np.asarray(pts.inv_depth[:n]), vals[ys, xs])
    assert np.all(np.asarray(pts.valid[:n]))
    assert not np.any(np.asarray(pts.valid[n:]))


def test_extract_points_capacity_cap():
    mask = jnp.ones((16, 16), bool)
    pts = extract_points(jnp.zeros((16, 16)), mask, capacity=100)
    assert int(pts.num) == 100
    assert int(pts.valid.sum()) == 100


@pytest.mark.slow
def test_point_system_matches_dense():
    img_kf, inv, img_cur, T_true = _scene_pair()
    cams = intrinsic_pyramid(CAM, 3)
    dpyr = depth_pyramid(inv, 3, indexing="even")
    pyr_kf = gaussian_image_pyramid(img_kf, 3, True)
    pyr_cur = gaussian_image_pyramid(img_cur, 3, True)
    cfg = TrackerConfig(num_levels=3, max_iterations=(10, 20, 30), depth_decimation="even")
    kf_levels = prepare_keyframe(pyr_kf, dpyr, cfg)
    T = se3_exp(jnp.asarray([0.1, 0.0, 0.2, 0.0, 0.002, 0.0], jnp.float32))
    for l in range(3):
        for interp in ("floor", "bilinear"):
            dsys = residual_jacobian(
                pyr_kf[l], dpyr[l], pyr_cur[l], cams[l], T, interp=interp
            )
            dw = robust_weights("huber", dsys.r, dsys.valid)
            deqs = normal_equations(dsys, dw)
            psys = residual_jacobian_points(
                kf_levels[l].pts, pyr_cur[l], cams[l], T,
                kf_intensity=kf_levels[l].intensity, interp=interp,
            )
            pw = robust_weights("huber", psys.r, psys.valid)
            peqs = normal_equations_points(psys, pw)
            assert int(deqs.num_valid) == int(peqs.num_valid), (l, interp)
            assert np.allclose(float(deqs.err), float(peqs.err), rtol=1e-5), (l, interp)
            assert np.allclose(
                np.asarray(deqs.JtWJ), np.asarray(peqs.JtWJ), rtol=1e-4, atol=0.5
            ), (l, interp)
            assert np.allclose(
                np.asarray(deqs.JtWr), np.asarray(peqs.JtWr), rtol=1e-4, atol=0.5
            ), (l, interp)


@pytest.mark.slow
def test_solve_pose_engines_agree():
    img_kf, inv, img_cur, T_true = _scene_pair()
    pyr_kf = gaussian_image_pyramid(img_kf, 3, True)
    pyr_cur = gaussian_image_pyramid(img_cur, 3, True)
    dpyr = depth_pyramid(inv, 3, indexing="even")
    # Floor mode: the point engine's precomputed-gradient sampling is
    # bit-identical to the dense path -> near-exact pose agreement.
    cfg_f = TrackerConfig(num_levels=3, max_iterations=(10, 20, 30),
                          depth_decimation="even", interp="floor")
    res_df = solve_pose(pyr_kf, dpyr, pyr_cur, CAM, cfg_f)
    res_pf = solve_pose_points(prepare_keyframe(pyr_kf, dpyr, cfg_f), pyr_cur, CAM, cfg_f)
    assert bool(res_df.ok) and bool(res_pf.ok)
    # Same iteration counts/costs; tiny drift from f32 reduction order only.
    assert np.allclose(np.asarray(res_df.T), np.asarray(res_pf.T), atol=5e-5)
    for sd, sp in zip(res_df.stats, res_pf.stats):
        assert int(sd.iters) == int(sp.iters)
    # Bilinear mode: the point engine samples gradients at the nearest pixel
    # (documented approximation) -> poses agree to sub-millimetre.
    cfg_b = TrackerConfig(num_levels=3, max_iterations=(10, 20, 30),
                          depth_decimation="even", interp="bilinear")
    res_db = solve_pose(pyr_kf, dpyr, pyr_cur, CAM, cfg_b)
    res_pb = solve_pose_points(prepare_keyframe(pyr_kf, dpyr, cfg_b), pyr_cur, CAM, cfg_b)
    assert np.abs(np.asarray(res_db.T)[:3, 3] - np.asarray(res_pb.T)[:3, 3]).max() < 1e-3
    assert np.abs(np.asarray(res_db.T)[:3, :3] - np.asarray(res_pb.T)[:3, :3]).max() < 1e-4


def test_compute_depth_point_path_filters():
    # End-to-end depth with the point refinement produces only in-range,
    # photometrically consistent survivors (same contract as dense).
    cam_cfg = CameraConfig(fx=240.0, fy=240.0, cx=W / 2, cy=H / 2, height=H, width=W)
    dcfg = DepthConfig(block_rows=8, block_cols=16, min_valid_points=30)
    from odometry_tpu.depth.estimator import compute_depth

    scene = make_scene(7, depth=10.0)
    left, right, z = render_stereo(scene, CAM, cam_cfg.baseline, jnp.eye(4), H, W)
    res = compute_depth(left, right, cam_cfg, dcfg)
    assert bool(res.ok)
    valid = np.asarray(res.valid)
    inv_map = np.asarray(res.inv_depth)
    assert valid.sum() == int(res.num_valid)
    depths = 1.0 / inv_map[valid]
    assert depths.min() >= dcfg.min_depth and depths.max() <= dcfg.max_depth
    assert np.all(inv_map[~valid] == 0)
