"""Per-stage latency breakdown of the odometry step on the real chip.

Times each pipeline stage in isolation (jitted, warmed, synced) plus the
full step, and reports the tracker's actual LM iteration usage per level —
the data that decides where optimization effort goes.
"""

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
from odometry_tpu.depth.estimator import compute_depth
from odometry_tpu.image.pyramid import gaussian_image_pyramid
from odometry_tpu.pipeline.odometry import init, step
from odometry_tpu.tracking.tracker import solve_pose_points


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(8, step=0.35, seed=4)
    render = jax.jit(lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W))
    frames = [render(jnp.asarray(T))[:2] for T in poses]
    frames = [(jax.device_put(l), jax.device_put(r)) for l, r in frames]

    jit_init = jax.jit(lambda l, r: init(l, r, cfg))
    jit_step = jax.jit(lambda s, l, r: step(s, l, r, cfg))
    state, ok = jit_init(*frames[0])
    print("init ok:", bool(ok))

    l1, r1 = frames[1]

    t_pyr = timeit(jax.jit(lambda x: gaussian_image_pyramid(x, cfg.tracker.num_levels, True)), l1)
    print(f"pyramid:        {t_pyr:7.3f} ms")

    jit_track = jax.jit(
        lambda kfl, pyr, T0: solve_pose_points(kfl, pyr, cam, cfg.tracker, T0)
    )
    pyr_cur = jax.jit(lambda x: gaussian_image_pyramid(x, cfg.tracker.num_levels, True))(l1)
    res = jit_track(state.kf_track, pyr_cur, state.pose_init)
    t_track = timeit(jit_track, state.kf_track, pyr_cur, state.pose_init)
    iters = [int(s.iters) for s in res.stats]
    print(f"tracker:        {t_track:7.3f} ms   iters per level (coarse->fine): {iters}")

    jit_depth = jax.jit(lambda l, r: compute_depth(l, r, cfg.camera, cfg.depth))
    dres = jit_depth(l1, r1)
    t_depth = timeit(jit_depth, l1, r1, reps=10)
    print(f"depth frontend: {t_depth:7.3f} ms   iters={int(dres.iters)} valid={int(dres.num_valid)}")

    t_step = timeit(jit_step, state, l1, r1, reps=20)
    print(f"full step:      {t_step:7.3f} ms   ({1000.0 / t_step:.1f} fps)")

    # Per-iteration tracker cost: force exact iteration counts via precision=2
    # (never converges) and no step_tol.
    import dataclasses

    for its in [(1, 1, 1, 1), (2, 2, 2, 2), (4, 4, 4, 4)]:
        tcfg = dataclasses.replace(
            cfg.tracker, max_iterations=its, precision=2.0, step_tol=0.0
        )
        jt = jax.jit(lambda kfl, pyr, T0: solve_pose_points(kfl, pyr, cam, tcfg, T0))
        t = timeit(jt, state.kf_track, pyr_cur, state.pose_init)
        print(f"tracker fixed {its}: {t:7.3f} ms")


if __name__ == "__main__":
    main()
