"""Evaluate the depth-frontend outlier filters (ratio test, block
consistency) across sweep scenes/seeds: outlier fraction vs survivor count.

Usage: python tools/diag_depth_filters.py
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
from odometry_tpu.depth.estimator import compute_depth

SEEDS = [3, 4, 5, 11, 23]
VARIANTS = [
    ("base", dict()),
    ("nounm", dict(refine_unmatched=False)),
    ("shift1.5", dict(refine_max_shift=1.5)),
    ("nounm+s1.5", dict(refine_unmatched=False, refine_max_shift=1.5)),
    ("num+s+r.8", dict(refine_unmatched=False, refine_max_shift=1.5,
                       ratio_test=0.8)),
    ("num+s+blk4", dict(refine_unmatched=False, refine_max_shift=1.5,
                        block_consistency_tol=4.0)),
    ("all", dict(refine_unmatched=False, refine_max_shift=1.5,
                 ratio_test=0.8, block_consistency_tol=4.0)),
]


def main():
    base = fast_config()
    H, W = base.camera.height, base.camera.width
    cam = Pinhole.create(base.camera.fx, base.camera.fy, base.camera.cx,
                         base.camera.cy)
    fxb = base.camera.fx * base.camera.baseline
    scenes = {
        "plane": lambda s: make_scene(s, depth=14.0),
        "driving": lambda s: make_driving_scene(s, side_x=20.0, wall_z=26.0),
    }
    render = jax.jit(
        lambda scene, T: render_stereo(scene, cam, base.camera.baseline, T, H, W)
    )
    data = {}
    for sname, fn in scenes.items():
        for seed in SEEDS:
            poses = drive_trajectory(2, step=0.25, seed=seed)
            l, r, z = render(fn(seed), jnp.asarray(poses[0]))
            data[(sname, seed)] = (l, r, np.asarray(z))

    for vname, kw in VARIANTS:
        cfg = dataclasses.replace(base, depth=dataclasses.replace(base.depth, **kw))
        jd = jax.jit(lambda l, r: compute_depth(l, r, cfg.camera, cfg.depth))
        for sname in scenes:
            fr1, nv, bias = [], [], []
            for seed in SEEDS:
                l, r, zgt = data[(sname, seed)]
                res = jd(l, r)
                valid = np.asarray(res.valid)
                inv = np.asarray(res.inv_depth)
                m = valid & (zgt > 0.1) & (zgt < 100.0)
                derr = inv[m] * fxb - fxb / zgt[m]
                fr1.append((np.abs(derr) > 1).mean() if m.sum() else 1.0)
                nv.append(int(m.sum()))
                bias.append(float(np.mean(derr)) if m.sum() else 0.0)
            print(
                f"{vname:10s} {sname:8s}: frac>1px "
                + " ".join(f"{f:.3f}" for f in fr1)
                + f"  n {min(nv)}-{max(nv)}  bias med {np.median(bias):+.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
