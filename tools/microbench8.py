"""Prototype: gather-free bilinear sampling via MXU one-hot matmuls.

sample(I, u, v) = e_v(v)^T @ I @ e_u(u), with e_u/e_v the 2-tap bilinear
interpolation vectors. Stage 1: I @ E_u -> (H, N); stage 2: column-weighted
sum over H with E_v -> (N,). All dense regular math, no gathers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def dev_time(body, K=50, reps=3):
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


def mm_sample(img, u, v, dtype=jnp.bfloat16):
    """Bilinear sample at (u, v) via two one-hot matmuls. img (H, W)."""
    H, W = img.shape
    N = u.shape[0]
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0).astype(dtype)
    fy = (v - y0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
    Eu = jnp.where(cols == x0i[None, :], (1 - fx)[None, :],
                   jnp.where(cols == x0i[None, :] + 1, fx[None, :], 0)).astype(dtype)
    M = jax.lax.dot_general(
        img.astype(dtype), Eu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, N)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, N), 0)
    Ev = jnp.where(rows == y0i[None, :], (1 - fy)[None, :],
                   jnp.where(rows == y0i[None, :] + 1, fy[None, :], 0)).astype(jnp.float32)
    return jnp.sum(M * Ev, axis=0)


def mm_sample3(imgs, u, v, dtype=jnp.bfloat16):
    """Sample 3 channels stacked (3, H, W) at the same (u, v)."""
    C, H, W = imgs.shape
    N = u.shape[0]
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0).astype(dtype)
    fy = (v - y0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
    Eu = jnp.where(cols == x0i[None, :], (1 - fx)[None, :],
                   jnp.where(cols == x0i[None, :] + 1, fx[None, :], 0)).astype(dtype)
    M = jax.lax.dot_general(
        imgs.astype(dtype).reshape(C * H, W), Eu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(C, H, N)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, N), 0)
    Ev = jnp.where(rows == y0i[None, :], (1 - fy)[None, :],
                   jnp.where(rows == y0i[None, :] + 1, fy[None, :], 0)).astype(jnp.float32)
    return jnp.sum(M * Ev[None], axis=1)  # (3, N)


def main():
    key = jax.random.PRNGKey(0)
    H, W = 376, 1241
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0

    # correctness vs gather bilinear
    from odometry_tpu.image.sampling import sample_bilinear

    N = 8192
    ku, kv = jax.random.split(key)
    u = jax.random.uniform(ku, (N,), jnp.float32) * (W - 1)
    v = jax.random.uniform(kv, (N,), jnp.float32) * (H - 1)
    ref = sample_bilinear(img, u, v)
    got = mm_sample(img, u, v)
    err = jnp.max(jnp.abs(ref - got))
    print(f"max abs err bf16 (0-255 range): {float(err):.4f}")
    got32 = mm_sample(img, u, v, dtype=jnp.float32)
    print(f"max abs err f32:                {float(jnp.max(jnp.abs(ref - got32))):.6f}")

    imgs3 = jnp.stack([img, img * 0.5, img * 0.25])

    for n in (2048, 4096, 8192, 16384):
        un, vn = u[:n] if n <= N else jnp.tile(u, 2)[:n], v[:n] if n <= N else jnp.tile(v, 2)[:n]

        t = dev_time(lambda i, acc, un=un, vn=vn: mm_sample(img, un + acc, vn).sum() * 0.0)
        t3 = dev_time(lambda i, acc, un=un, vn=vn: mm_sample3(imgs3, un + acc, vn).sum() * 0.0)
        tg = dev_time(lambda i, acc, un=un, vn=vn: sample_bilinear(img, un + acc, vn).sum() * 0.0)
        print(f"N={n:6d}: mm {t:7.4f} ms   mm3ch {t3:7.4f} ms   gather {tg:7.4f} ms")

    # f32 variant at 8192
    t = dev_time(lambda i, acc: mm_sample(img, u + acc, v, jnp.float32).sum() * 0.0)
    print(f"N=8192 mm f32: {t:7.4f} ms")

    # pyramid decimation via matmul: blur+down both axes as banded matmuls
    k5 = np.array([1, 4, 6, 4, 1], np.float32) / 16.0

    def banded(n_in, n_out, stride):
        A = np.zeros((n_out, n_in), np.float32)
        for o in range(n_out):
            c = o * stride
            for j, t in enumerate(k5):
                idx = c + j - 2
                idx = min(max(idx, -idx), 2 * (n_in - 1) - idx) if idx < 0 else (
                    idx if idx < n_in else 2 * (n_in - 1) - idx)
                A[o, idx] += t
        return jnp.asarray(A)

    Av = banded(H, H // 2, 2)  # (H/2, H)
    Ah = banded(W, W // 2, 2).T  # (W, W/2)

    def down_mm(x):
        return jax.lax.dot_general(
            jax.lax.dot_general(Av, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST),
            Ah, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    from odometry_tpu.image.pyramid import pyr_down

    refd = pyr_down(img)
    gotd = down_mm(img)
    print(f"pyr_down mm err: {float(jnp.max(jnp.abs(refd - gotd))):.5f}")
    t = dev_time(lambda i, acc: down_mm(img + acc)[0, 0] * 0.0, K=200)
    print(f"pyr_down mm f32 HIGHEST: {t:7.4f} ms")

    def down_mm_default(x):
        a = jax.lax.dot_general(Av, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(a, Ah, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    gotd2 = down_mm_default(img)
    print(f"pyr_down mm default err: {float(jnp.max(jnp.abs(refd - gotd2))):.5f}")
    t = dev_time(lambda i, acc: down_mm_default(img + acc)[0, 0] * 0.0, K=200)
    print(f"pyr_down mm default:     {t:7.4f} ms")


if __name__ == "__main__":
    main()
