"""Isolate the plane11 breaker among {band192, precision0.99, mr8192, lazy}."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import accurate_config
from odometry_tpu.data.synthetic import drive_trajectory, make_scene, render_stereo
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence

base = accurate_config()
H, W = base.camera.height, base.camera.width
cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx, base.camera.cy)
D = lambda c, **kw: dataclasses.replace(c, depth=dataclasses.replace(c.depth, **kw))

scene = make_scene(11, depth=14.0)
poses = drive_trajectory(49, step=0.25, seed=11)
render = jax.jit(lambda Tm: render_stereo(scene, cam, base.camera.baseline, Tm, H, W))
fr = []
for Tm in poses:
    l, r, _ = render(jnp.asarray(Tm))
    fr.append((jax.device_put(l), jax.device_put(r)))

VARIANTS = [
    ("+band192", D(base, max_disparity=192)),
    ("+prec99", D(base, precision=0.99)),
    ("+mr8192", D(base, max_residuals=8192)),
    ("+lazy", dataclasses.replace(base, depth_every_frame=False)),
]
for vname, cfg in VARIANTS:
    res = run_sequence(fr, cfg)
    mte = float(mean_translation_error(poses[: res.num_frames], res.poses))
    print(f"{vname:10s} plane11: mte {mte:7.4f} kf {len(res.keyframe_ids)} "
          f"lost {len(res.lost_ids)}", flush=True)
