"""Reverse bisect: walk from accurate (green on plane11) toward fast to find
the knob(s) that break tracking. plane11 + driving11, 49 frames."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import accurate_config
from odometry_tpu.data.synthetic import (
    drive_trajectory, make_driving_scene, make_scene, render_stereo)
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence

base = accurate_config()
H, W = base.camera.height, base.camera.width
cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx, base.camera.cy)

D = lambda c, **kw: dataclasses.replace(c, depth=dataclasses.replace(c.depth, **kw))
T = lambda c, **kw: dataclasses.replace(c, tracker=dataclasses.replace(c.tracker, **kw))

VARIANTS = [
    ("accurate", base),
    ("+tracker-mm", T(base, interp="mm")),
    ("+step-tol", T(base, step_tol=1e-5)),
    ("+cap4096", T(base, point_capacity=4096)),
    ("+blocked", T(D(base, point_order="blocked"), point_order="blocked")),
    ("+band192+prec99+lazy+mr8192", dataclasses.replace(
        D(base, max_disparity=192, precision=0.99, max_residuals=8192),
        depth_every_frame=False)),
    ("+cap4096+blocked", T(D(base, point_order="blocked"),
                           point_capacity=4096, point_order="blocked")),
]

CASES = []
for name, scene, seed in (("plane11", make_scene(11, depth=14.0), 11),
                          ("drive11", make_driving_scene(11, side_x=20.0, wall_z=26.0), 11)):
    poses = drive_trajectory(49, step=0.25, seed=seed)
    render = jax.jit(lambda Tm, s=scene: render_stereo(s, cam, base.camera.baseline, Tm, H, W))
    fr = []
    for Tm in poses:
        l, r, _ = render(jnp.asarray(Tm))
        fr.append((jax.device_put(l), jax.device_put(r)))
    CASES.append((name, fr, poses))

for vname, cfg in VARIANTS:
    for cname, fr, poses in CASES:
        try:
            res = run_sequence(fr, cfg)
            mte = float(mean_translation_error(poses[: res.num_frames], res.poses))
            print(f"{vname:28s} {cname:8s}: mte {mte:7.4f} kf {len(res.keyframe_ids)} "
                  f"lost {len(res.lost_ids)}", flush=True)
        except RuntimeError as e:
            print(f"{vname:28s} {cname:8s}: {e}", flush=True)
