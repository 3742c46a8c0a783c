"""Controlled experiments: why do elementwise chains on (N,) cost ~1ms?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def chain(n_ops):
    def f(x):
        for i in range(n_ops):
            x = x * 1.0001 + 0.5
        return x

    return f


def main():
    key = jax.random.PRNGKey(0)
    N = 40960
    x1 = jax.random.uniform(key, (N,), jnp.float32)
    x2 = jax.random.uniform(key, (320, 128), jnp.float32)

    for n_ops in (1, 5, 10, 30, 60):
        t1 = timeit(jax.jit(chain(n_ops)), x1)
        t2 = timeit(jax.jit(chain(n_ops)), x2)
        print(f"chain{n_ops:3d}: 1D {t1:7.3f} ms   2D {t2:7.3f} ms")

    # cast chain
    H, W = 376, 1241
    img = jax.random.uniform(key, (H, W), jnp.float32)
    u = jax.random.uniform(key, (N,), jnp.float32) * (W - 2)
    v = jax.random.uniform(key, (N,), jnp.float32) * (H - 2)
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)

    def g_int(img, vi, ui):
        return img.reshape(-1)[vi * W + ui]

    def g_cast(img, v, u):
        return img.reshape(-1)[v.astype(jnp.int32) * W + u.astype(jnp.int32)]

    print(f"gather int idx:  {timeit(jax.jit(g_int), img, vi, ui):7.3f} ms")
    print(f"gather cast idx: {timeit(jax.jit(g_cast), img, v, u):7.3f} ms")

    # float chain then cast then gather
    def g_chain_cast(img, v, u):
        uu = u * 1.0001 + 0.1
        vv = v * 1.0001 + 0.1
        return img.reshape(-1)[vv.astype(jnp.int32) * W + uu.astype(jnp.int32)]

    print(f"gather chain+cast: {timeit(jax.jit(g_chain_cast), img, v, u):7.3f} ms")

    # is it jnp.take vs indexing?
    def g_take(img, vi, ui):
        return jnp.take(img.reshape(-1), vi * W + ui, mode="clip")

    print(f"take int idx:    {timeit(jax.jit(g_take), img, vi, ui):7.3f} ms")

    # dispatch-only floor: identity jit
    print(f"identity jit 1D: {timeit(jax.jit(lambda a: a), x1):7.3f} ms")
    print(f"identity+1 op:   {timeit(jax.jit(lambda a: a + 1.0), x1):7.3f} ms")

    # reps sensitivity (pipelining?)
    t = timeit(jax.jit(chain(30)), x1, reps=500)
    print(f"chain30 1D reps=500: {t:7.3f} ms")


if __name__ == "__main__":
    main()
