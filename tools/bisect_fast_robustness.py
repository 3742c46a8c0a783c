"""Which fast_config knob costs the multi-seed robustness? One-knob bisect
on the sweep's failing cases (driving seed 4, plane seed 11, 49 frames)."""
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
    drive_trajectory, make_driving_scene, make_scene, render_stereo)
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence

base = fast_config()
H, W = base.camera.height, base.camera.width
cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx, base.camera.cy)

CASES = [
    ("plane11", make_scene(11, depth=14.0), 11),
    ("drive4", make_driving_scene(4, side_x=20.0, wall_z=26.0), 4),
]
VARIANTS = [
    ("fast(asis)", lambda c: c),
    ("tracker-bilinear", lambda c: dataclasses.replace(
        c, tracker=dataclasses.replace(c.tracker, interp="bilinear"))),
    ("no-step-tol", lambda c: dataclasses.replace(
        c, tracker=dataclasses.replace(c.tracker, step_tol=0.0))),
    ("caps-8k-16k", lambda c: dataclasses.replace(
        c, tracker=dataclasses.replace(c.tracker, point_capacity=8192),
        depth=dataclasses.replace(c.depth, max_residuals=16384))),
    ("depth-bilinear", lambda c: dataclasses.replace(
        c, depth=dataclasses.replace(c.depth, interp="bilinear"))),
    ("eager-depth", lambda c: dataclasses.replace(c, depth_every_frame=True)),
]

frames_by_case = {}
for name, scene, seed in CASES:
    poses = drive_trajectory(49, step=0.25, seed=seed)
    render = jax.jit(lambda T, s=scene: render_stereo(s, cam, base.camera.baseline, T, H, W))
    fr = []
    for T in poses:
        l, r, _ = render(jnp.asarray(T))
        fr.append((jax.device_put(l), jax.device_put(r)))
    frames_by_case[name] = (fr, poses)

for vname, mod in VARIANTS:
    cfg = mod(base)
    for cname, _, _ in [(c[0], None, None) for c in CASES]:
        fr, poses = frames_by_case[cname]
        try:
            res = run_sequence(fr, cfg)
            mte = float(mean_translation_error(poses[: res.num_frames], res.poses))
            print(f"{vname:18s} {cname:8s}: mte {mte:7.4f} kf {len(res.keyframe_ids)} "
                  f"lost {len(res.lost_ids)}", flush=True)
        except RuntimeError as e:
            print(f"{vname:18s} {cname:8s}: {e}", flush=True)
