"""Depth-frontend accuracy vs exact GT on sweep scenes.

For each seed: render frame 0, run compute_depth, compare refined inverse
depth against GT (render's z) on valid pixels. Reports disparity-error
quantiles and the signed relative bias — the quantity that displaces the
photometric minimum if nonzero.

Usage: python tools/diag_depth.py [plane|driving] [fast|accurate] [seeds...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import accurate_config, fast_config
from odometry_tpu.data.synthetic import (
    drive_trajectory,
    make_driving_scene,
    make_natural_scene,
    make_scene,
    render_stereo,
)
from odometry_tpu.depth.estimator import compute_depth


def main(argv):
    scene_name = argv[1] if len(argv) > 1 else "plane"
    cfg_name = argv[2] if len(argv) > 2 else "fast"
    seeds = [int(s) for s in argv[3:]] or [3, 4, 5, 11, 23]
    cfg = {"fast": fast_config, "accurate": accurate_config}[cfg_name]()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene_fn = {
        "plane": lambda s: make_scene(s, depth=14.0),
        "driving": lambda s: make_driving_scene(s, side_x=20.0, wall_z=26.0),
        "textured": lambda s: make_natural_scene(s, depth=14.0),
    }[scene_name]
    fxb = cfg.camera.fx * cfg.camera.baseline

    jit_depth = jax.jit(lambda l, r: compute_depth(l, r, cfg.camera, cfg.depth))
    for seed in seeds:
        scene = scene_fn(seed)
        poses = drive_trajectory(2, step=0.25, seed=seed)
        l, r, z = jax.jit(
            lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W)
        )(jnp.asarray(poses[0]))
        res = jit_depth(l, r)
        valid = np.asarray(res.valid)
        inv = np.asarray(res.inv_depth)
        zgt = np.asarray(z)
        m = valid & (zgt > 0.1) & (zgt < 100.0)
        d_est = inv[m] * fxb  # estimated disparity (px)
        d_gt = fxb / zgt[m]
        derr = d_est - d_gt
        q = np.percentile(np.abs(derr), [50, 90, 99])
        print(
            f"{cfg_name}/{scene_name} seed {seed:3d}: n {m.sum():6d} "
            f"disp_gt med {np.median(d_gt):5.2f}px  |err| p50 {q[0]:6.3f} "
            f"p90 {q[1]:6.3f} p99 {q[2]:6.3f}px  bias {np.mean(derr):+7.4f}px "
            f"frac>1px {(np.abs(derr) > 1).mean():.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv)
