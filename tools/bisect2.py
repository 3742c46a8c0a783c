"""Round 2: fps cost of depth-bilinear; what else plane11 needs."""
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
from odometry_tpu.data.synthetic import (
    drive_trajectory, make_driving_scene, make_scene, render_stereo)
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence, _compiled

base = fast_config()
H, W = base.camera.height, base.camera.width
cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx, base.camera.cy)

D = lambda c, **kw: dataclasses.replace(c, depth=dataclasses.replace(c.depth, **kw))
T = lambda c, **kw: dataclasses.replace(c, tracker=dataclasses.replace(c.tracker, **kw))

fast_db = D(base, interp="bilinear")

# --- fps on the bench workload with depth-bilinear
scene = make_scene(3, depth=14.0)
poses = drive_trajectory(49, step=0.35, seed=4)
render = jax.jit(lambda Tm: render_stereo(scene, cam, base.camera.baseline, Tm, H, W))
frames = []
for Tm in poses:
    l, r, _ = render(jnp.asarray(Tm))
    frames.append((jax.device_put(l), jax.device_put(r)))
res = run_sequence(frames, fast_db)
mte = float(mean_translation_error(poses[: res.num_frames], res.poses))
jit_init, jit_step = _compiled(fast_db, False)
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
print(f"bench fast+depth-bilinear: fps {n/(time.perf_counter()-t0):.1f} mte {mte:.4f}",
      flush=True)

# --- plane11 second-level bisect on top of depth-bilinear
scene11 = make_scene(11, depth=14.0)
poses11 = drive_trajectory(49, step=0.25, seed=11)
render11 = jax.jit(lambda Tm: render_stereo(scene11, cam, base.camera.baseline, Tm, H, W))
fr11 = []
for Tm in poses11:
    l, r, _ = render11(jnp.asarray(Tm))
    fr11.append((jax.device_put(l), jax.device_put(r)))

VARIANTS = [
    ("db(asis)", fast_db),
    ("db+precision995", D(fast_db, precision=0.995)),
    ("db+row-order", T(D(fast_db, point_order="spread"), point_order="spread")),
    ("db+big-caps", T(D(fast_db, max_residuals=40960), point_capacity=40960)),
    ("db+tracker-bilinear", T(fast_db, interp="bilinear")),
]
for name, cfg in VARIANTS:
    try:
        res = run_sequence(fr11, cfg)
        mte = float(mean_translation_error(poses11[: res.num_frames], res.poses))
        print(f"plane11 {name:22s}: mte {mte:7.4f} kf {len(res.keyframe_ids)} "
              f"lost {len(res.lost_ids)}", flush=True)
    except RuntimeError as e:
        print(f"plane11 {name:22s}: {e}", flush=True)
