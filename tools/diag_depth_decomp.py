"""Decompose depth-frontend error: search winner vs refined value, and the
error distribution. Usage: python tools/diag_depth_decomp.py [plane|driving] [seed]"""

from __future__ import annotations

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
from odometry_tpu.depth.estimator import compute_depth


def main(argv):
    sname = argv[1] if len(argv) > 1 else "plane"
    seed = int(argv[2]) if len(argv) > 2 else 5
    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    fxb = cfg.camera.fx * cfg.camera.baseline
    scene = {
        "plane": lambda s: make_scene(s, depth=14.0),
        "driving": lambda s: make_driving_scene(s, side_x=20.0, wall_z=26.0),
    }[sname](seed)
    poses = drive_trajectory(2, step=0.25, seed=seed)
    l, r, z = jax.jit(
        lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W)
    )(jnp.asarray(poses[0]))
    res = jax.jit(lambda a, b: compute_depth(a, b, cfg.camera, cfg.depth))(l, r)
    valid = np.asarray(res.valid)
    inv = np.asarray(res.inv_depth)
    disp_raw = np.asarray(res.disparity)  # integer search disparity at lanes
    zgt = np.asarray(z)
    m = valid & (zgt > 0.1) & (zgt < 100.0)
    d_gt = fxb / zgt[m]
    e_refined = inv[m] * fxb - d_gt
    e_search = disp_raw[m] - d_gt
    for name, e in (("search", e_search), ("refined", e_refined)):
        q = np.percentile(np.abs(e), [50, 90, 95, 99])
        print(
            f"{name:8s}: p50 {q[0]:7.3f} p90 {q[1]:7.3f} p95 {q[2]:7.3f} "
            f"p99 {q[3]:8.3f}  frac>1 {(np.abs(e) > 1).mean():.3f} "
            f"frac>5 {(np.abs(e) > 5).mean():.3f}",
        )
    # Who is bad: points whose search was good (<1) but refinement bad (>1)?
    sg = np.abs(e_search) <= 1
    rb = np.abs(e_refined) > 1
    print(f"search-good&refine-bad: {(sg & rb).mean():.3f}  "
          f"search-bad: {(~sg).mean():.3f}  both-bad {((~sg) & rb).mean():.3f}")
    # Spatial structure: error fraction per image column band and row band.
    ys, xs = np.nonzero(m)
    bad = np.abs(e_refined) > 1
    mm = np.zeros_like(valid, bool)
    mm[ys, xs] = True
    for axis, name, nb in ((0, "rows", 8), (1, "cols", 10)):
        edges = np.linspace(0, valid.shape[axis], nb + 1).astype(int)
        fr = []
        for i in range(nb):
            selb = (ys >= edges[i]) & (ys < edges[i + 1]) if axis == 0 else (
                (xs >= edges[i]) & (xs < edges[i + 1]))
            fr.append(bad[selb].mean() if selb.sum() else 0.0)
        print(f"bad-frac by {name}: " + " ".join(f"{f:.2f}" for f in fr))
    # Value structure of bad errors.
    be = e_refined[np.abs(e_refined) > 1]
    if be.size:
        q = np.percentile(be, [5, 25, 50, 75, 95])
        print("bad err quantiles:", " ".join(f"{v:+.1f}" for v in q))


if __name__ == "__main__":
    main(sys.argv)
