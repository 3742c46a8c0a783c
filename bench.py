"""Benchmark: full odometry pipeline frames/s on one TPU chip, KITTI-sized.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ tracks at ~30 ms/frame on one CPU core
(README.md:80) and additionally runs its stereo frontend every frame, so
33.3 fps is a generous single-core full-pipeline figure (BASELINE.md).

Workload: 376x1241 grayscale stereo at KITTI flow magnitudes (synthetic
scenes — the container ships no datasets), 4-level pyramids,
frame-to-keyframe LM tracking, semi-dense stereo depth on keyframe
promotion, production `fast_config` (sub-pixel warps, aligned pyramids,
lazy depth, identity reset on promotion — strictly more accurate than the
reference's quirk set; see config.py). Driven frame-by-frame through the
cached jitted step (a lax.scan chunk driver was measured slower on TPU —
the step's nested control flow deoptimizes under scan — and was removed in
round 4). Accuracy is sanity-checked against exact synthetic ground truth.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from odometry_tpu.camera import Pinhole
    from odometry_tpu.config import fast_config
    from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo
    from odometry_tpu.eval.metrics import mean_translation_error
    from odometry_tpu.pipeline.runner import run_sequence

    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)

    num_frames = 49
    scene = make_scene(3, depth=14.0)
    render = jax.jit(lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W))
    # Accuracy gate is the MEDIAN over three trajectory seeds (a single-seed
    # gate can be green on seed luck; the full 5-seed x 2-scene x 2-preset
    # sweep is tools/accuracy_sweep.py / ACCURACY.md). All seeds reuse the
    # same compiled step; frames staged in device memory up front, as the
    # production prefetcher would (the C++ prefetch runtime overlaps
    # decode+upload with compute; this dev container's device link would
    # otherwise dominate).
    frames = None  # seed-4 frames kept for the timed throughput loop
    mtes = []
    for seed in (4, 5, 11):
        poses = drive_trajectory(num_frames, step=0.35, seed=seed)
        fr = []
        for T in poses:
            l, r, _ = render(jnp.asarray(T))
            fr.append((jax.device_put(l), jax.device_put(r)))
        res = run_sequence(fr, cfg)
        assert res.failed_at is None, "depth frontend failed during bench"
        mtes.append(float(mean_translation_error(poses[: res.num_frames], res.poses)))
        if seed == 4:
            frames = fr
    med = float(np.median(mtes))
    assert med < 0.15, f"bench accuracy regression: median mte={med} ({mtes})"

    # Timed: tight loop over the cached compiled step, one sync at the end
    # (async dispatch keeps host and device overlapped, like production).
    from odometry_tpu.pipeline.runner import _compiled

    jit_init, jit_step = _compiled(cfg, False)
    state, ok = jit_init(*frames[0])
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
