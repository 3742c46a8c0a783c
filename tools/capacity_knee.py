"""Accuracy-vs-capacity knee: mte + fps for point_capacity / max_residuals.

VERDICT r3 #9: fast_config's caps were tuned blind. This measures the knee
on the bench workload (seed-3 plane scene + seed-4 trajectory, 49 frames,
KITTI size) so the chosen caps carry measured margins.

Run on the chip: python tools/capacity_knee.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import fast_config
from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence, _compiled


def measure(cfg, frames, poses):
    res = run_sequence(frames, cfg)
    if res.failed_at is not None:
        return float("inf"), 0.0, res
    mte = float(mean_translation_error(poses[: res.num_frames], res.poses))
    jit_init, jit_step = _compiled(cfg, False)
    state, _ = jit_init(*frames[0])
    for (l, r) in frames[1:4]:
        state, out = jit_step(state, l, r)
    jax.block_until_ready(out.cur_pose)
    n = 0
    t0 = time.perf_counter()
    for _ in range(2):
        for (l, r) in frames[1:]:
            state, out = jit_step(state, l, r)
            n += 1
    jax.block_until_ready(out.cur_pose)
    fps = n / (time.perf_counter() - t0)
    return mte, fps, res


def main():
    base = fast_config()
    H, W = base.camera.height, base.camera.width
    cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx, base.camera.cy)
    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(49, step=0.35, seed=4)
    render = jax.jit(lambda T: render_stereo(scene, cam, base.camera.baseline, T, H, W))
    frames = []
    for T in poses:
        l, r, _ = render(jnp.asarray(T))
        frames.append((jax.device_put(l), jax.device_put(r)))

    print("point_capacity sweep (max_residuals=16384):")
    for cap in (2048, 4096, 8192, 16384):
        cfg = dataclasses.replace(
            base, tracker=dataclasses.replace(base.tracker, point_capacity=cap))
        mte, fps, res = measure(cfg, frames, poses)
        print(f"  cap {cap:6d}: mte {mte:7.4f} fps {fps:7.1f} "
              f"kf {len(res.keyframe_ids)} lost {len(res.lost_ids)}", flush=True)

    print("max_residuals sweep (point_capacity=8192):")
    for mr in (8192, 16384, 32768):
        cfg = dataclasses.replace(
            base, depth=dataclasses.replace(base.depth, max_residuals=mr))
        mte, fps, res = measure(cfg, frames, poses)
        print(f"  mr {mr:6d}: mte {mte:7.4f} fps {fps:7.1f} "
              f"kf {len(res.keyframe_ids)} lost {len(res.lost_ids)}", flush=True)


if __name__ == "__main__":
    main()
