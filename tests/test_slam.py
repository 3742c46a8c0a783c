"""Full SLAM loop: odometry + map + in-loop BA on a synthetic sequence."""

import numpy as np
import jax.numpy as jnp
import pytest

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import (
    CameraConfig,
    DepthConfig,
    KeyframeConfig,
    PipelineConfig,
    TrackerConfig,
)
from odometry_tpu.data.synthetic import make_scene, drive_trajectory, stereo_sequence
from odometry_tpu.eval.metrics import ate_rmse
from odometry_tpu.mapping.ba import BAConfig
from odometry_tpu.pipeline.slam import run_slam

H, W = 96, 160
CFG = PipelineConfig(
    camera=CameraConfig(fx=240.0, fy=240.0, cx=W / 2.0, cy=H / 2.0, height=H, width=W),
    tracker=TrackerConfig(interp="bilinear", num_levels=3, max_iterations=(10, 20, 30),
                          depth_decimation="even", point_capacity=2048),
    depth=DepthConfig(block_rows=8, block_cols=16, min_valid_points=30,
                      interp="bilinear"),
    keyframe=KeyframeConfig(motion_threshold=0.2, reset_on_promote=True),
)
CAM = Pinhole.create(240.0, 240.0, W / 2.0, H / 2.0)


@pytest.fixture(scope="module")
def sequence():
    scene = make_scene(11, depth=12.0)
    poses = drive_trajectory(16, step=0.25, seed=2)
    frames = list(stereo_sequence(scene, CAM, CFG.camera.baseline, poses, H, W))
    return poses, frames


@pytest.mark.slow
def test_run_slam_builds_map_and_tracks(sequence):
    poses, frames = sequence
    res = run_slam(frames, CFG, map_capacity=8, window=3, ba_every=1,
                   ba_cfg=BAConfig(window=3, iters=3, fix_depths=True))
    assert res.failed_at is None
    assert res.num_frames == len(frames)
    # Keyframes were promoted and stored.
    assert len(res.keyframe_ids) >= 3
    assert int(res.store.count) == len(res.keyframe_ids)
    # BA actually ran once the window filled.
    assert res.ba_runs >= 1
    # Trajectory remains accurate with in-loop BA re-anchoring.
    assert ate_rmse(poses[: res.num_frames], res.poses) < 0.15


@pytest.mark.slow
def test_run_slam_store_poses_finite(sequence):
    poses, frames = sequence
    res = run_slam(frames, CFG, map_capacity=8, window=3, ba_every=2)
    occ = np.asarray(res.store.occupied)
    assert np.all(np.isfinite(np.asarray(res.store.pose)[occ]))
