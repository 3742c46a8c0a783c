"""Bisect the ~1ms scale-invariant cost inside sample_channels_mm."""

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
    H, W, N = 376, 1241, 8192
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((3, H, W), np.float32) * 255.0)
    u = jnp.asarray(rng.random(N, np.float32) * (W - 2))
    v = jnp.asarray(rng.random(N, np.float32) * (H - 2))

    def build_eu(u):
        x0 = jnp.floor(u)
        fx = (u - x0).astype(jnp.bfloat16)
        x0i = x0.astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W,) + u.shape, 0)
        return jnp.where(
            cols == x0i[None, :], (1 - fx)[None, :],
            jnp.where(cols == x0i[None, :] + 1, fx[None, :], jnp.asarray(0, jnp.bfloat16)),
        ).astype(jnp.bfloat16)

    def build_eu_T(u):
        # transposed layout: (N, W) with W minor
        x0 = jnp.floor(u)
        fx = (u - x0).astype(jnp.bfloat16)
        x0i = x0.astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, u.shape + (W,), 1)
        return jnp.where(
            cols == x0i[:, None], (1 - fx)[:, None],
            jnp.where(cols == x0i[:, None] + 1, fx[:, None], jnp.asarray(0, jnp.bfloat16)),
        ).astype(jnp.bfloat16)

    jeu = jax.jit(build_eu)
    Eu = jeu(u)
    print(f"Eu build (W,N):        {timeit(jeu, u):7.3f} ms")
    jeut = jax.jit(build_eu_T)
    EuT = jeut(u)
    print(f"Eu build (N,W):        {timeit(jeut, u):7.3f} ms")

    imb = imgs.astype(jnp.bfloat16).reshape(3 * H, W)

    def stage1(imb, Eu):
        return jax.lax.dot_general(
            imb, Eu, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    js1 = jax.jit(stage1)
    M = js1(imb, Eu)
    print(f"stage1 matmul:         {timeit(js1, imb, Eu):7.3f} ms")

    def stage1t(imb, EuT):
        return jax.lax.dot_general(
            imb, EuT, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    js1t = jax.jit(stage1t)
    print(f"stage1 matmul (N,W)T:  {timeit(js1t, imb, EuT):7.3f} ms")

    def build_ev(v):
        y0 = jnp.floor(v)
        fy = (v - y0).astype(jnp.float32)
        y0i = y0.astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H,) + v.shape, 0)
        return jnp.where(
            rows == y0i[None, :], (1 - fy)[None, :],
            jnp.where(rows == y0i[None, :] + 1, fy[None, :], 0.0),
        )

    jev = jax.jit(build_ev)
    Ev = jev(v)
    print(f"Ev build:              {timeit(jev, v):7.3f} ms")

    def stage2(M, Ev):
        Mr = M.reshape(3, H, -1)
        return jnp.sum(Mr * Ev[None], axis=1)

    js2 = jax.jit(stage2)
    print(f"stage2 mul+reduce:     {timeit(js2, M, Ev):7.3f} ms")

    # stage2 as matmul over a flattened (3N) batch? Alternative: einsum chn,hn->cn
    def stage2e(M, Ev):
        Mr = M.reshape(3, H, -1)
        return jnp.einsum("chn,hn->cn", Mr, Ev)

    js2e = jax.jit(stage2e)
    print(f"stage2 einsum:         {timeit(js2e, M, Ev):7.3f} ms")

    # Fused end-to-end for reference
    from odometry_tpu.image.sampling import sample_channels_mm

    jf = jax.jit(lambda i, u, v: sample_channels_mm(i, u, v))
    print(f"sample_channels_mm:    {timeit(jf, imgs, u, v):7.3f} ms")

    # one-hot via jax.nn.one_hot-style equality on f32 iota?
    # Also try: 2-pass gather baseline for comparison
    def gather6(imgs, u, v):
        from odometry_tpu.image.sampling import sample_bilinear
        return jnp.stack([sample_bilinear(imgs[c], u, v) for c in range(3)])

    jg = jax.jit(gather6)
    print(f"12-gather bilinear:    {timeit(jg, imgs, u, v):7.3f} ms")

    def gather_rowcol(imgs, u, v):
        # Row-gather then per-point column gather via take_along_axis:
        # rows first: (N, W) = imgs[c][y0i] via jnp.take (row DMA), then
        # take_along_axis over W.
        x0 = jnp.floor(u); y0 = jnp.floor(v)
        fx = (u - x0); fy = (v - y0)
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        out = []
        for c in range(3):
            r0 = jnp.take(imgs[c], y0i, axis=0)         # (N, W)
            r1 = jnp.take(imgs[c], jnp.minimum(y0i + 1, H - 1), axis=0)
            row = r0 * (1 - fy)[:, None] + r1 * fy[:, None]
            c0 = jnp.take_along_axis(row, x0i[:, None], axis=1)[:, 0]
            c1 = jnp.take_along_axis(row, jnp.minimum(x0i + 1, W - 1)[:, None], axis=1)[:, 0]
            out.append(c0 * (1 - fx) + c1 * fx)
        return jnp.stack(out)

    jrc = jax.jit(gather_rowcol)
    print(f"row-gather bilinear:   {timeit(jrc, imgs, u, v):7.3f} ms")


if __name__ == "__main__":
    main()
