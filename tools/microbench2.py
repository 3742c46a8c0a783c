"""Microbench the LM-iteration small-op tail: 6x6 solve, se3_exp, weights."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    Jr = jax.random.normal(key, (6, 6), jnp.float32)
    A = Jr @ Jr.T + 6 * jnp.eye(6)
    b = jax.random.normal(key, (6,), jnp.float32)

    from odometry_tpu.solvers.linear6 import solve_spd6
    from odometry_tpu.solvers.robust import robust_weights
    from odometry_tpu.geometry import se3_exp, se3_compose

    print(f"solve_spd6:       {timeit(jax.jit(solve_spd6), A, b):7.3f} ms")
    print(f"linalg.solve 6x6: {timeit(jax.jit(jnp.linalg.solve), A, b):7.3f} ms")
    print(f"se3_exp:          {timeit(jax.jit(se3_exp), b):7.3f} ms")

    T = jnp.eye(4)
    print(f"se3_compose:      {timeit(jax.jit(se3_compose), T, T):7.3f} ms")

    N = 40960
    r = jax.random.normal(key, (N,), jnp.float32)
    valid = r > -10

    def w_h(r, valid):
        return robust_weights("huber", r, valid, huber_delta=28.0, tdist_dof=200.0, tdist_sigma_init=5.0)

    print(f"huber weights:    {timeit(jax.jit(w_h), r, valid):7.3f} ms")

    # Full tracker system eval + LM body equivalents
    from odometry_tpu.camera import Pinhole
    from odometry_tpu.config import fast_config
    from odometry_tpu.kernels.points import (
        PointSet, residual_jacobian_points, normal_equations_points,
    )
    from odometry_tpu.image.pyramid import central_gradients

    cfg = fast_config().tracker
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

    def system(img, pts, T, kf_i):
        grads = central_gradients(img)
        sys_ = residual_jacobian_points(pts, img, cam, T, kf_intensity=kf_i,
                                        interp="bilinear", grads=grads)
        w = robust_weights("huber", sys_.r, sys_.valid, huber_delta=28.0,
                           tdist_dof=200.0, tdist_sigma_init=5.0)
        return normal_equations_points(sys_, w)

    print(f"full system eval: {timeit(jax.jit(system), img, pts, T, kf_i):7.3f} ms")

    def body(img, pts, T, kf_i, lam):
        eqs = system(img, pts, T, kf_i)
        A = eqs.JtWJ + lam * jnp.diag(jnp.diag(eqs.JtWJ)) + 1e-12 * jnp.eye(6)
        delta = solve_spd6(A, -eqs.JtWr)
        return se3_compose(se3_exp(delta), T), eqs.err

    print(f"full LM body:     {timeit(jax.jit(body), img, pts, T, kf_i, jnp.float32(0.01)):7.3f} ms")

    # 10 chained LM bodies (sequential dependency, like the while_loop)
    def chain10(img, pts, T, kf_i, lam):
        for _ in range(10):
            T, err = body(img, pts, T, kf_i, lam)
        return T, err

    print(f"10 chained bodies:{timeit(jax.jit(chain10), img, pts, T, kf_i, jnp.float32(0.01)):7.3f} ms")

    # Same but in a while_loop
    def wl10(img, pts, T, kf_i):
        def cond(c):
            return c[0] < 10

        def bd(c):
            i, T = c
            T2, _ = body(img, pts, T, kf_i, jnp.float32(0.01))
            return i + 1, T2

        return jax.lax.while_loop(cond, bd, (0, T))[1]

    print(f"while10 bodies:   {timeit(jax.jit(wl10), img, pts, T, kf_i):7.3f} ms")


if __name__ == "__main__":
    main()
