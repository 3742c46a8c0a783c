"""Single-frame basin experiment on a failing sweep cell.

Renders frames 0 and 1 of the sweep trajectory for a given scene seed, builds
the keyframe from frame 0, then solves frame 1's pose from (a) identity and
(b) the ground-truth pose, across tracker variants. Prints per-level
(err_first -> err_final, iters) and the final translation error, isolating
basin-of-attraction failures from iteration-budget and interpolation effects.

Usage: python tools/diag_basin.py [seed] [plane|driving]
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import fast_config
from odometry_tpu.data.synthetic import (
    drive_trajectory,
    make_driving_scene,
    make_scene,
    render_stereo,
)
from odometry_tpu.geometry import se3_inverse
from odometry_tpu.pipeline.odometry import init
from odometry_tpu.tracking.tracker import solve_pose_points


def main(argv):
    seed = int(argv[1]) if len(argv) > 1 else 11
    scene_name = argv[2] if len(argv) > 2 else "plane"
    base = fast_config()
    H, W = base.camera.height, base.camera.width
    cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx, base.camera.cy)
    scene = {
        "plane": lambda s: make_scene(s, depth=14.0),
        "driving": lambda s: make_driving_scene(s, side_x=20.0, wall_z=26.0),
    }[scene_name](seed)
    poses = drive_trajectory(3, step=0.25, seed=seed)
    render = jax.jit(
        lambda T: render_stereo(scene, cam, base.camera.baseline, T, H, W)
    )
    l0, r0, _ = render(jnp.asarray(poses[0]))
    l1, r1, _ = render(jnp.asarray(poses[1]))

    # Ground-truth relative pose: T maps kf-cam -> cur-cam = inv(P1) @ P0.
    T_gt = np.asarray(
        jnp.matmul(jnp.linalg.inv(jnp.asarray(poses[1])), jnp.asarray(poses[0]))
    )

    VARIANTS = [
        ("fast-asis", lambda t: t),
        ("bilinear", lambda t: dataclasses.replace(t, interp="bilinear")),
        ("cap16k", lambda t: dataclasses.replace(t, point_capacity=16384)),
        ("prec.995", lambda t: dataclasses.replace(t, precision=0.995)),
        ("iters20", lambda t: dataclasses.replace(
            t, max_iterations=(20, 30, 30, 30))),
        ("bilin+cap16k", lambda t: dataclasses.replace(
            t, interp="bilinear", point_capacity=16384)),
        ("cap16k+prec+it", lambda t: dataclasses.replace(
            t, point_capacity=16384, precision=0.995,
            max_iterations=(20, 30, 30, 30))),
    ]
    for vname, mod in VARIANTS:
        tcfg = mod(base.tracker)
        cfg = dataclasses.replace(base, tracker=tcfg)
        state, ok = jax.jit(lambda l, r: init(l, r, cfg, None))(l0, r0)
        pyr1 = None
        from odometry_tpu.image.pyramid import gaussian_image_pyramid

        pyr1 = gaussian_image_pyramid(l1, tcfg.num_levels, smooth=True)
        for init_name, T0 in (("identity", np.eye(4, dtype=np.float32)),
                              ("gt", T_gt)):
            res = jax.jit(
                lambda kf, T: solve_pose_points(kf, pyr1, cam, tcfg, T)
            )(state.kf_track, jnp.asarray(T0))
            T = np.asarray(res.T)
            terr = float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3]))
            per_level = "  ".join(
                f"L{tcfg.num_levels - 1 - i}:{float(s.err_first):7.1f}->"
                f"{float(s.err_final):7.1f}/{int(s.iters):2d}"
                for i, s in enumerate(res.stats)
            )
            print(
                f"{vname:16s} {init_name:8s} terr {terr:7.4f}  {per_level}",
                flush=True,
            )


if __name__ == "__main__":
    main(sys.argv)
