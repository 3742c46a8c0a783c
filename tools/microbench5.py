"""True device-time per LM iteration / pyramid / full step via in-dispatch loops."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit1(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    from odometry_tpu.camera import Pinhole
    from odometry_tpu.config import fast_config
    from odometry_tpu.kernels.points import (
        PointSet, residual_jacobian_points, normal_equations_points,
    )
    from odometry_tpu.image.pyramid import central_gradients, gaussian_image_pyramid
    from odometry_tpu.solvers.robust import robust_weights
    from odometry_tpu.solvers.linear6 import solve_spd6
    from odometry_tpu.geometry import se3_exp, se3_compose

    N = 40960
    H, W = 376, 1241
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    idx = jax.random.randint(key, (N,), 0, H * W)
    pts = PointSet(
        xs=(idx % W).astype(jnp.float32),
        ys=(idx // W).astype(jnp.float32),
        inv_depth=jnp.full((N,), 0.1, jnp.float32),
        valid=jnp.ones((N,), bool),
        num=jnp.asarray(N, jnp.int32),
    )
    cam = Pinhole.create(718.0, 718.0, 620.0, 188.0)
    kf_i = jax.random.uniform(key, (N,), jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32)

    def body(T, img, pts, kf_i):
        grads = central_gradients(img)
        sys_ = residual_jacobian_points(pts, img, cam, T, kf_intensity=kf_i,
                                        interp="bilinear", grads=grads)
        w = robust_weights("huber", sys_.r, sys_.valid, huber_delta=28.0,
                           tdist_dof=200.0, tdist_sigma_init=5.0)
        eqs = normal_equations_points(sys_, w)
        A = eqs.JtWJ + 0.01 * jnp.diag(jnp.diag(eqs.JtWJ)) + 1e-12 * jnp.eye(6)
        delta = solve_spd6(A, -eqs.JtWr)
        return se3_compose(se3_exp(delta * 1e-6), T)

    K = 200

    def loopK(img, pts, kf_i):
        def b(i, T):
            return body(T, img, pts, kf_i)

        return jax.lax.fori_loop(0, K, b, T0)

    t = timeit1(jax.jit(loopK), img, pts, kf_i)
    print(f"LM iter device time (N=40960): {t / K:7.4f} ms/iter  ({t:.1f} ms / {K})")

    # smaller N
    for n in (8192, 16384):
        pts_n = PointSet(pts.xs[:n], pts.ys[:n], pts.inv_depth[:n], pts.valid[:n],
                         jnp.asarray(n, jnp.int32))
        kf_n = kf_i[:n]

        def loopKn(img, pts_n, kf_n):
            def b(i, T):
                return body(T, img, pts_n, kf_n)

            return jax.lax.fori_loop(0, K, b, T0)

        t = timeit1(jax.jit(loopKn), img, pts_n, kf_n)
        print(f"LM iter device time (N={n}): {t / K:7.4f} ms/iter")

    # pyramid device time
    def pyrK(img):
        def b(i, acc):
            p = gaussian_image_pyramid(img + acc, 4, True)
            return acc + p[0][0, 0] + p[3][0, 0]

        return jax.lax.fori_loop(0, K, b, jnp.float32(0.0))

    t = timeit1(jax.jit(pyrK), img)
    print(f"pyramid4 device time: {t / K:7.4f} ms")

    # full step via scan over repeated frames
    from odometry_tpu.pipeline.odometry import init, step

    cfg = fast_config()
    from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo

    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(17, step=0.35, seed=4)
    render = jax.jit(lambda t_: render_stereo(scene, cam, cfg.camera.baseline, t_, H, W))
    ls, rs = [], []
    for T in poses:
        l, r, _ = render(jnp.asarray(T))
        ls.append(l)
        rs.append(r)
    lefts = jnp.stack(ls[1:])
    rights = jnp.stack(rs[1:])
    state, ok = jax.jit(lambda l, r: init(l, r, cfg))(ls[0], rs[0])

    def scan_steps(state, lefts, rights):
        def b(s, lr):
            s2, out = step(s, lr[0], lr[1], cfg)
            return s2, out.cur_pose

        return jax.lax.scan(b, state, (lefts, rights))

    t = timeit1(jax.jit(scan_steps), state, lefts, rights, reps=5)
    print(f"full step device time (scan/16): {t / 16:7.4f} ms/frame -> {16 * 1000 / t:.0f} fps")


if __name__ == "__main__":
    main()
