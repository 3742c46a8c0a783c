"""Per-frame divergence diagnostic for the accuracy sweep's failing cells.

For each (config, scene, seed) cell this prints one line per frame:
translation error vs exact GT, weighted motion, promotion/lost flags,
finest-level final cost, and depth survivor count — so the frame where a
run leaves the rails (and what the failure detector saw there) is visible.

Usage:  python tools/diag_divergence.py [fast|accurate] [plane|driving] [seeds...]
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
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence


def main(argv):
    cfg_name = argv[1] if len(argv) > 1 else "fast"
    scene_name = argv[2] if len(argv) > 2 else "plane"
    seeds = [int(s) for s in argv[3:]] or [3, 4, 5, 11, 23]
    cfg = {"fast": fast_config, "accurate": accurate_config}[cfg_name]()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    render = jax.jit(
        lambda scene, T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W)
    )
    scene_fn = {
        "plane": lambda s: make_scene(s, depth=14.0),
        "driving": lambda s: make_driving_scene(s, side_x=20.0, wall_z=26.0),
        "textured": lambda s: make_natural_scene(s, depth=14.0),
    }[scene_name]

    for seed in seeds:
        scene = scene_fn(seed)
        poses = drive_trajectory(49, step=0.25, seed=seed)
        frames = []
        for T in poses:
            l, r, _ = render(scene, jnp.asarray(T))
            frames.append((jax.device_put(l), jax.device_put(r)))

        rows = []

        def progress(i, out):
            stats = out.track_stats[-1]
            rows.append(
                (
                    i,
                    np.asarray(out.cur_pose),
                    float(out.motion),
                    bool(out.promoted),
                    bool(out.lost),
                    float(stats.err_final),
                    float(stats.err_first),
                    int(stats.iters),
                    int(out.num_valid_depth),
                )
            )

        res = run_sequence(frames, cfg, progress=progress)
        print(f"=== {cfg_name}/{scene_name} seed {seed} ===", flush=True)
        for (i, P, motion, promoted, lost, ef, ei, iters, nvd) in rows:
            err = float(np.linalg.norm(P[:3, 3] - poses[i][:3, 3]))
            flags = ("K" if promoted else " ") + ("L" if lost else " ")
            print(
                f"  f{i:02d} {flags} err {err:7.3f}  motion {motion:6.3f}  "
                f"err0 {ei:8.1f}->{ef:8.1f} it {iters:2d}  nvd {nvd:6d}",
                flush=True,
            )
        mte = float(mean_translation_error(poses[: res.num_frames], res.poses))
        print(
            f"  => mte {mte:.4f} kf {len(res.keyframe_ids)} lost {len(res.lost_ids)}",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv)
