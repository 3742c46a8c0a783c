"""Device-time breakdown of the depth frontend pieces."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def dev_time(body, K=20, reps=3):
    def f():
        def b(i, acc):
            return acc + body(i, acc)

        return jax.lax.fori_loop(0, K, b, jnp.float32(0.0))

    jf = jax.jit(f)
    out = jf()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / K * 1e3


def main():
    key = jax.random.PRNGKey(0)
    from odometry_tpu.config import fast_config
    from odometry_tpu.camera import Pinhole
    from odometry_tpu.data.synthetic import make_scene, render_stereo
    from odometry_tpu.image.pyramid import gaussian_blur3
    from odometry_tpu.kernels.select import select_points
    from odometry_tpu.kernels.disparity import disparity_search
    from odometry_tpu.kernels.points import extract_points
    from odometry_tpu.depth.estimator import refine_depth_points, compute_depth
    from odometry_tpu.tracking.tracker import prepare_keyframe
    from odometry_tpu.image.pyramid import gaussian_image_pyramid, depth_pyramid

    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_scene(3, depth=14.0)
    l, r, _ = jax.jit(
        lambda: render_stereo(scene, cam, cfg.camera.baseline, jnp.eye(4), H, W)
    )()

    ls = gaussian_blur3(l)
    rs = gaussian_blur3(r)

    t = dev_time(lambda i, acc: select_points(
        ls + acc, boundary=cfg.depth.boundary, block_rows=cfg.depth.block_rows,
        block_cols=cfg.depth.block_cols, grad_th=cfg.depth.grad_th,
        max_points_per_block=cfg.depth.max_points_per_block,
    ).sum().astype(jnp.float32) * 0.0)
    print(f"select_points:   {t:7.3f} ms")

    sel = select_points(ls, boundary=cfg.depth.boundary, block_rows=cfg.depth.block_rows,
                        block_cols=cfg.depth.block_cols, grad_th=cfg.depth.grad_th,
                        max_points_per_block=cfg.depth.max_points_per_block)

    max_disp = cfg.depth.max_disparity
    band_max = int(cam.fx * cfg.camera.baseline / cfg.depth.min_depth) + 1
    max_disp = min(max_disp, band_max)
    min_disp = max(1, int(cam.fx * cfg.camera.baseline / cfg.depth.max_depth))

    def search(i, acc):
        d = disparity_search(ls + acc, rs, sel, fx=cam.fx, baseline=cfg.camera.baseline,
                             boundary=cfg.depth.boundary, ssd_th=cfg.depth.ssd_th,
                             max_disparity=max_disp, min_disparity=min_disp,
                             lr_check=cfg.depth.lr_check, lr_tol=cfg.depth.lr_tol,
                             backend="auto")
        return d.inv_depth[0, 0] * 0.0

    print(f"disparity search:{dev_time(search):7.3f} ms")

    disp = disparity_search(ls, rs, sel, fx=cam.fx, baseline=cfg.camera.baseline,
                            boundary=cfg.depth.boundary, ssd_th=cfg.depth.ssd_th,
                            max_disparity=max_disp, min_disparity=min_disp,
                            lr_check=cfg.depth.lr_check, lr_tol=cfg.depth.lr_tol,
                            backend="auto")

    cap = min(cfg.depth.max_residuals,
              cfg.depth.block_rows * cfg.depth.block_cols * cfg.depth.max_points_per_block)
    t = dev_time(lambda i, acc: extract_points(disp.inv_depth + acc, sel, cap).xs.sum() * 0.0)
    print(f"extract_points (cap={cap}): {t:7.3f} ms")

    pts = extract_points(disp.inv_depth, sel, cap)

    def refine(i, acc):
        refined, resid, iters, cost = refine_depth_points(
            l + acc, r, pts, cfg.camera, cfg.depth)
        return refined.sum() * 0.0

    print(f"refine_depth_points: {dev_time(refine, K=5):7.3f} ms")

    def full(i, acc):
        return compute_depth(l + acc, r, cfg.camera, cfg.depth).inv_depth[0, 0] * 0.0

    print(f"compute_depth:   {dev_time(full, K=5):7.3f} ms")

    # keyframe prep
    pyr = gaussian_image_pyramid(l, 4, True)
    dres = compute_depth(l, r, cfg.camera, cfg.depth)
    dpyr = depth_pyramid(dres.inv_depth, 4, indexing="even")

    def prep(i, acc):
        kfl = prepare_keyframe([p + acc for p in pyr], dpyr, cfg.tracker)
        return kfl[0].intensity.sum() * 0.0

    print(f"prepare_keyframe:{dev_time(prep):7.3f} ms")


if __name__ == "__main__":
    main()
