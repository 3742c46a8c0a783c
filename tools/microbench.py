"""Microbenchmarks for the primitive ops on the real chip."""

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
    H, W = 376, 1241
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0

    from odometry_tpu.image.pyramid import (
        gaussian_blur3,
        pyr_down,
        central_gradients,
        gaussian_image_pyramid,
    )

    print(f"blur3:            {timeit(jax.jit(gaussian_blur3), img):7.3f} ms")
    print(f"pyr_down:         {timeit(jax.jit(pyr_down), img):7.3f} ms")
    print(f"central_grads:    {timeit(jax.jit(central_gradients), img):7.3f} ms")
    print(f"pyramid4:         {timeit(jax.jit(lambda x: gaussian_image_pyramid(x, 4, True)), img):7.3f} ms")

    # conv_general_dilated version of blur3 for comparison
    def blur3_conv(x):
        k = jnp.array([0.25, 0.5, 0.25], jnp.float32)
        k2 = jnp.outer(k, k)[None, None]
        xp = jnp.pad(x, 1, mode="reflect")[None, None]
        return jax.lax.conv_general_dilated(xp, k2, (1, 1), "VALID")[0, 0]

    print(f"blur3_conv:       {timeit(jax.jit(blur3_conv), img):7.3f} ms")

    # Gathers
    N = 40960
    idx = jax.random.randint(key, (N,), 0, H * W)
    yi = idx // W
    xi = idx % W

    def g1(img, yi, xi):
        return img.reshape(-1)[yi * W + xi]

    print(f"gather {N} x1:   {timeit(jax.jit(g1), img, yi, xi):7.3f} ms")

    def g6(img, yi, xi):
        f = img.reshape(-1)
        o = 0.0
        for dy in (-1, 0, 1):
            for dx in (0, 1):
                o = o + f[jnp.clip((yi + dy) * W + xi + dx, 0, H * W - 1)]
        return o

    print(f"gather {N} x6:   {timeit(jax.jit(g6), img, yi, xi):7.3f} ms")

    # Patch gather: slice_sizes (3, 4) per index
    def gpatch(img, yi, xi):
        starts = jnp.stack([jnp.clip(yi - 1, 0, H - 3), jnp.clip(xi - 1, 0, W - 4)], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1),
            operand_batching_dims=(), start_indices_batching_dims=(),
        )
        return jax.lax.gather(
            img, starts, dn, slice_sizes=(3, 4),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    print(f"gather {N} patch(3,4): {timeit(jax.jit(gpatch), img, yi, xi):7.3f} ms")

    for n in (8192, 16384):
        print(
            f"gather {n} x6:   "
            f"{timeit(jax.jit(g6), img, yi[:n], xi[:n]):7.3f} ms"
        )

    # einsum normal equations
    J = jax.random.normal(key, (N, 6), jnp.float32)
    r = jax.random.normal(key, (N,), jnp.float32)

    def neq(J, r):
        return jnp.einsum("ni,nj->ij", J, J), jnp.einsum("ni,n->i", J, r)

    print(f"normal eqs {N}:  {timeit(jax.jit(neq), J, r):7.3f} ms")

    # while_loop overhead: 10 trivial iterations
    def wl(x):
        def body(c):
            i, v = c
            return i + 1, v * 1.0001 + 1.0

        def cond(c):
            return c[0] < 10

        return jax.lax.while_loop(cond, body, (0, x))[1]

    print(f"while10 trivial:  {timeit(jax.jit(wl), jnp.float32(1.0)):7.3f} ms")

    # One tracker-iteration equivalent: 6 gathers + arithmetic + neq
    def iter_equiv(img, yi, xi, J, r):
        v = g6(img, yi, xi)
        return neq(J * v[:, None], r + v)

    print(f"iter equiv {N}:  {timeit(jax.jit(iter_equiv), img, yi, xi, J, r):7.3f} ms")


if __name__ == "__main__":
    main()
