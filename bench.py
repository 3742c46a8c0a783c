"""Benchmark: full odometry pipeline frames/s on one TPU chip, KITTI-sized.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ runs camera tracking at ~30 ms/frame on one CPU
core (README.md:80) and additionally computes depth every frame; 33.3 fps is
therefore a generous single-core full-pipeline baseline (BASELINE.md). The
driver target is >= 10x that (~333 fps) on one chip.

The workload matches the reference's KITTI offline path: 376x1241 grayscale
stereo, 4-level pyramids, frame-to-keyframe LM tracking + semi-dense depth
every frame, keyframe promotion by weighted motion. Synthetic frames (no
datasets in this container) with KITTI-like flow magnitudes.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from odometry_tpu.camera import Pinhole
    from odometry_tpu.config import kitti_config
    from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo
    from odometry_tpu.pipeline.odometry import init, step

    cfg = kitti_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)

    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(12, step=0.35, seed=4)
    render = jax.jit(lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W))
    frames = []
    for T in poses:
        l, r, _ = render(jnp.asarray(T))
        frames.append((jax.device_put(l), jax.device_put(r)))

    jit_init = jax.jit(lambda l, r: init(l, r, cfg))
    jit_step = jax.jit(lambda s, l, r: step(s, l, r, cfg))

    state, ok = jit_init(*frames[0])
    assert bool(ok), "frame-0 depth init failed"
    # Warmup: compile + one steady-state pass over a few frames.
    for (l, r) in frames[1:4]:
        state, out = jit_step(state, l, r)
    jax.block_until_ready(out.cur_pose)

    # Timed: loop the remaining frames several times (state keeps evolving;
    # shapes are static so no recompiles).
    n_timed = 0
    t0 = time.perf_counter()
    for _ in range(3):
        for (l, r) in frames[1:]:
            state, out = jit_step(state, l, r)
            n_timed += 1
    jax.block_until_ready(out.cur_pose)
    dt = time.perf_counter() - t0

    fps = n_timed / dt
    baseline_fps = 1000.0 / 30.0  # reference tracking-only latency, README.md:80
    print(
        json.dumps(
            {
                "metric": "full_pipeline_frames_per_second_kitti_size_1chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
