"""Round-3 targeted microbenches: pyramid, gradients, mm-sampling variants.

Measures the candidate optimizations before committing to them:
  1. gaussian_blur3 via shifted sums (current) vs banded matmul.
  2. central_gradients via concats (current) vs banded matmuls.
  3. sample_channels_mm 3-channel (current) vs fused 1-channel stencil
     sampling (gradients folded into the interpolation vectors).
"""

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


def banded_blur3_matrix(n):
    A = np.zeros((n, n), np.float32)
    taps = (0.25, 0.5, 0.25)
    for o in range(n):
        for j, t in enumerate(taps):
            idx = o + j - 1
            if idx < 0:
                idx = -idx
            elif idx >= n:
                idx = 2 * (n - 1) - idx
            A[o, idx] += t
    return A


def grad_matrix(n):
    # Clamped central difference: gx[i] = 0.5*(x[min(i+1,n-1)] - x[max(i-1,0)])
    A = np.zeros((n, n), np.float32)
    for o in range(n):
        A[o, min(o + 1, n - 1)] += 0.5
        A[o, max(o - 1, 0)] -= 0.5
    return A


def main():
    H, W, N = 376, 1241, 8192
    HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W), np.float32) * 255.0)
    u = jnp.asarray(rng.random(N, np.float32) * (W - 2))
    v = jnp.asarray(rng.random(N, np.float32) * (H - 2))

    from odometry_tpu.image.pyramid import (
        gaussian_blur3,
        central_gradients,
        gaussian_image_pyramid,
    )
    from odometry_tpu.image.sampling import sample_channels_mm

    print(f"blur3 shifted-sums:    {timeit(jax.jit(gaussian_blur3), img):7.3f} ms")

    Bv = jnp.asarray(banded_blur3_matrix(H))
    Bh = jnp.asarray(banded_blur3_matrix(W))

    def blur3_mm(x):
        t = jax.lax.dot_general(Bv, x, (((1,), (0,)), ((), ())), precision=HI)
        return jax.lax.dot_general(t, Bh, (((1,), (1,)), ((), ())), precision=HI)

    jb = jax.jit(blur3_mm)
    err = float(jnp.max(jnp.abs(jb(img) - gaussian_blur3(img))))
    print(f"blur3 banded matmul:   {timeit(jb, img):7.3f} ms   max|diff|={err:.2e}")

    print(f"full 4-level pyramid:  {timeit(jax.jit(lambda x: gaussian_image_pyramid(x, 4, True)), img):7.3f} ms")

    print(f"central_gradients:     {timeit(jax.jit(central_gradients), img):7.3f} ms")

    Gv = jnp.asarray(grad_matrix(H))
    Gh = jnp.asarray(grad_matrix(W))

    def grads_mm(x):
        gx = jax.lax.dot_general(x, Gh, (((1,), (1,)), ((), ())), precision=HI)
        gy = jax.lax.dot_general(Gv, x, (((1,), (0,)), ((), ())), precision=HI)
        return gx, gy

    jg = jax.jit(grads_mm)
    gx0, gy0 = central_gradients(img)
    gx1, gy1 = jg(img)
    err = max(float(jnp.max(jnp.abs(gx0 - gx1))), float(jnp.max(jnp.abs(gy0 - gy1))))
    print(f"gradients via matmul:  {timeit(jg, img):7.3f} ms   max|diff|={err:.2e}")

    # --- Sampling: current 3-channel mm ---
    gx, gy = central_gradients(img)
    chan = jnp.stack([img, gx, gy])

    def cur(chan, u, v):
        return sample_channels_mm(chan, u, v)

    jc = jax.jit(cur)
    ref = jc(chan, u, v)
    print(f"mm sample 3ch (cur):   {timeit(jc, chan, u, v):7.3f} ms")

    # --- Fused stencil sampling: 1 image, gradient taps folded into Eu/Ev ---
    def fused(imgf, u, v, dtype=jnp.bfloat16):
        Hh, Ww = imgf.shape
        u = jnp.clip(u, 0.0, Ww - 1.0)
        v = jnp.clip(v, 0.0, Hh - 1.0)
        x0 = jnp.floor(u)
        y0 = jnp.floor(v)
        fx = (u - x0).astype(jnp.float32)
        fy = (v - y0).astype(jnp.float32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        cols = jax.lax.broadcasted_iota(jnp.int32, (Ww,) + u.shape, 0)
        # Bilinear u-taps e_u: support {x0, x0+1}
        Eu = jnp.where(
            cols == x0i[None, :],
            (1.0 - fx)[None, :],
            jnp.where(cols == x0i[None, :] + 1, fx[None, :], 0.0),
        )
        # Gradient-sampling taps Dh^T e_u: gx = I @ Gh^T with clamped central
        # diff; (Gh^T e_u)[k] = sum_x e_u[x] * Gh[x, k]. Support {x0-1..x0+2}.
        # Build by shifting the two taps of e_u by +-1 with 0.5 weights; the
        # clamp rows add corrections only at the borders (negligible for
        # interior points; exactness checked below vs interior-only points).
        w0 = (1.0 - fx)[None, :]
        w1 = fx[None, :]
        c = cols
        x0b = x0i[None, :]
        EuG = (
            jnp.where(c == x0b + 1, 0.5 * w0, 0.0)
            + jnp.where(c == x0b - 1, -0.5 * w0, 0.0)
            + jnp.where(c == x0b + 2, 0.5 * w1, 0.0)
            + jnp.where(c == x0b, -0.5 * w1, 0.0)
        )
        E2 = jnp.concatenate([Eu, EuG], axis=1).astype(dtype)
        M = jax.lax.dot_general(
            imgf.astype(dtype), E2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, 2N)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Hh,) + v.shape, 0)
        y0b = y0i[None, :]
        Ev = jnp.where(
            rows == y0b, (1.0 - fy)[None, :],
            jnp.where(rows == y0b + 1, fy[None, :], 0.0),
        )
        EvG = (
            jnp.where(rows == y0b + 1, 0.5 * (1.0 - fy)[None, :], 0.0)
            + jnp.where(rows == y0b - 1, -0.5 * (1.0 - fy)[None, :], 0.0)
            + jnp.where(rows == y0b + 2, 0.5 * fy[None, :], 0.0)
            + jnp.where(rows == y0b, -0.5 * fy[None, :], 0.0)
        )
        n = u.shape[0]
        I2w = jnp.sum(M[:, :n] * Ev, axis=0)
        gxs = jnp.sum(M[:, n:] * Ev, axis=0)
        gys = jnp.sum(M[:, :n] * EvG, axis=0)
        return jnp.stack([I2w, gxs, gys])

    jf = jax.jit(fused)
    out = jf(img, u, v)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"mm sample fused 1ch:   {timeit(jf, img, u, v):7.3f} ms   max|diff vs cur|={err:.2e}")

    # Smaller N (level-1 scale)
    u1 = u[:2048] / 2
    v1 = v[:2048] / 2
    img1 = img[::2, ::2]
    chan1 = jnp.stack([img1, *central_gradients(img1)])
    print(f"mm 3ch L1 (2048):      {timeit(jc, chan1, u1, v1):7.3f} ms")
    print(f"fused L1 (2048):       {timeit(jf, img1, u1, v1):7.3f} ms")


if __name__ == "__main__":
    main()
