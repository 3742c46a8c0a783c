"""Bisect the slow system eval inside residual_jacobian_points."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=50):
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
    from odometry_tpu.kernels.points import PointSet, residual_jacobian_points
    from odometry_tpu.image.pyramid import central_gradients
    from odometry_tpu.image.sampling import sample_bilinear, clip_gather_2d

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
    T = jnp.eye(4, dtype=jnp.float32)

    def rj(img, pts, T, kf_i):
        grads = central_gradients(img)
        return residual_jacobian_points(pts, img, cam, T, kf_intensity=kf_i,
                                        interp="bilinear", grads=grads)

    print(f"rj bilinear+grads: {timeit(jax.jit(rj), img, pts, T, kf_i):7.3f} ms")

    def rj_floor(img, pts, T, kf_i):
        grads = central_gradients(img)
        return residual_jacobian_points(pts, img, cam, T, kf_intensity=kf_i,
                                        interp="floor", grads=grads)

    print(f"rj floor+grads:    {timeit(jax.jit(rj_floor), img, pts, T, kf_i):7.3f} ms")

    def proj_only(pts, T):
        d = pts.inv_depth
        Z0 = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
        X = Z0 * (pts.xs - cam.cx) / cam.fx
        Y = Z0 * (pts.ys - cam.cy) / cam.fy
        R = T[:3, :3]
        t = T[:3, 3]
        Xw = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * Z0 + t[0]
        Yw = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * Z0 + t[1]
        Zw = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * Z0 + t[2]
        u = cam.fx * Xw / jnp.where(Zw == 0, 1.0, Zw) + cam.cx
        v = cam.fy * Yw / jnp.where(Zw == 0, 1.0, Zw) + cam.cy
        return u, v

    print(f"projection only:   {timeit(jax.jit(proj_only), pts, T):7.3f} ms")

    def samp(img, pts, T):
        u, v = proj_only(pts, T)
        return sample_bilinear(img, u, v)

    print(f"proj+bilinear:     {timeit(jax.jit(samp), img, pts, T):7.3f} ms")

    def samp_grads(img, pts, T):
        u, v = proj_only(pts, T)
        grads = central_gradients(img)
        xi = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        gx = clip_gather_2d(grads[0], yi, xi)
        gy = clip_gather_2d(grads[1], yi, xi)
        return sample_bilinear(img, u, v), gx, gy

    print(f"proj+bil+grads:    {timeit(jax.jit(samp_grads), img, pts, T):7.3f} ms")

    # bilinear on random coords (no projection dependency)
    u = jax.random.uniform(key, (N,), jnp.float32) * (W - 2)
    v = jax.random.uniform(key, (N,), jnp.float32) * (H - 2)
    print(f"bilinear alone:    {timeit(jax.jit(sample_bilinear), img, u, v):7.3f} ms")

    # gather with computed idx (int cast chain)
    def gath_cast(img, u, v):
        yi = v.astype(jnp.int32)
        xi = u.astype(jnp.int32)
        return clip_gather_2d(img, yi, xi)

    print(f"gather f32->i32:   {timeit(jax.jit(gath_cast), img, u, v):7.3f} ms")


if __name__ == "__main__":
    main()
