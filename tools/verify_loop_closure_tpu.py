"""Drive run_slam (BA + loop closure) on the real TPU chip (verify recipe).

Out-and-back KITTI-sized trajectory on the production fast preset, run twice:
odometry-only vs BA+loop-closure. Prints one JSON line with endpoint drift
before/after and the fps cost of the mapping backend — the PERF.md L5
evidence (VERDICT r4 item 5).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import fast_config
from odometry_tpu.data.synthetic import make_driving_scene, render_stereo
from odometry_tpu.mapping.loop_closure import LoopClosureConfig
from odometry_tpu.pipeline.slam import run_slam


def main():
    import dataclasses

    cfg = fast_config()
    # Promote every ~3-4 frames so the ring holds enough keyframes for a
    # non-trivial proposal (reference threshold 1.1 would promote ~4 total).
    cfg = dataclasses.replace(
        cfg, keyframe=dataclasses.replace(cfg.keyframe, motion_threshold=0.4))
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_driving_scene(3, side_x=20.0, wall_z=26.0)
    n_half, step = 24, 0.35  # 49 frames, ~17 m travelled, ends at the start
    poses = []
    for k in range(2 * n_half + 1):
        z = step * (k if k <= n_half else 2 * n_half - k)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (0.1 * np.sin(0.9 * k), 0.0, z)
        poses.append(T)
    frames = [
        render_stereo(scene, cam, cfg.camera.baseline, jnp.asarray(T), H, W)[:2]
        for T in poses
    ]
    lc = LoopClosureConfig(radius=1.5, min_separation=3, min_inliers=200)

    # Warmup passes populate the jit caches; the timed passes measure the
    # steady-state fps cost of the mapping backend.
    run_slam(frames, cfg, map_capacity=32, window=4, ba_every=100,
             loop_closure=False)
    run_slam(frames, cfg, map_capacity=32, window=4, ba_every=2,
             loop_closure=True, lc_cfg=lc)
    res_odo = run_slam(frames, cfg, map_capacity=32, window=4, ba_every=100,
                       loop_closure=False)
    res_map = run_slam(frames, cfg, map_capacity=32, window=4, ba_every=2,
                       loop_closure=True, lc_cfg=lc)
    err_odo = float(np.linalg.norm(res_odo.poses[-1][:3, 3] - poses[-1][:3, 3]))
    err_map = float(np.linalg.norm(res_map.poses[-1][:3, 3] - poses[-1][:3, 3]))
    # Whole-trajectory error too: corrections propagate into poses[] now.
    ate_odo = float(np.mean(np.linalg.norm(
        res_odo.poses[:, :3, 3] - np.stack(poses)[:, :3, 3], axis=1)))
    ate_map = float(np.mean(np.linalg.norm(
        res_map.poses[:, :3, 3] - np.stack(poses)[:, :3, 3], axis=1)))
    out = dict(
        frames=res_map.num_frames, kf=len(res_map.keyframe_ids),
        closures=res_map.loop_closures, ba_runs=res_map.ba_runs,
        end_err_odom=round(err_odo, 4), end_err_slam=round(err_map, 4),
        ate_odom=round(ate_odo, 4), ate_slam=round(ate_map, 4),
        fps_odom=round(res_odo.fps, 1), fps_slam=round(res_map.fps, 1),
    )
    print(json.dumps(out))
    assert res_map.failed_at is None
    assert res_map.loop_closures >= 1, "no loop closure fired"
    assert err_map < 0.2, err_map
    assert err_map <= err_odo + 1e-6, (err_map, err_odo)
    print("OK")


if __name__ == "__main__":
    main()
