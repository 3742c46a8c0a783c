"""Drive run_slam(loop_closure=True) on the real TPU chip (verify recipe).

Out-and-back KITTI-sized trajectory; asserts a closure fires and the
end-of-trajectory pose error stays bounded.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import accurate_config
from odometry_tpu.data.synthetic import make_driving_scene, render_stereo
from odometry_tpu.mapping.loop_closure import LoopClosureConfig
from odometry_tpu.pipeline.slam import run_slam


def main():
    import dataclasses

    cfg = accurate_config()
    # Promote every ~3-4 frames so the ring holds enough keyframes for a
    # non-trivial proposal (reference threshold 1.1 would promote ~4 total).
    cfg = dataclasses.replace(
        cfg, keyframe=dataclasses.replace(cfg.keyframe, motion_threshold=0.4))
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_driving_scene(3)
    n_half, step = 10, 0.35  # bench-proven per-frame motion magnitude
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
    res = run_slam(
        frames, cfg, map_capacity=16, window=4, ba_every=100,
        loop_closure=True,
        lc_cfg=LoopClosureConfig(radius=1.5, min_separation=3, min_inliers=200),
    )
    err_end = float(np.linalg.norm(res.poses[-1][:3, 3] - poses[-1][:3, 3]))
    print(
        f"frames {res.num_frames} kf {len(res.keyframe_ids)} closures "
        f"{res.loop_closures} ba {res.ba_runs} end-err {err_end:.4f} m "
        f"fps {res.fps:.1f} failed_at {res.failed_at}"
    )
    assert res.failed_at is None
    assert res.loop_closures >= 1, "no loop closure fired"
    assert err_end < 0.2, err_end
    print("OK")


if __name__ == "__main__":
    main()
