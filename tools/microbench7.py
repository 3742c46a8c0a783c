"""Gather formulation shootout (all true device time, in-dispatch loops)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp


def dev_time(body, K=100, reps=3):
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
    H, W = 376, 1241
    HW = H * W
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    flat = img.reshape(-1)
    img_bf16 = img.astype(jnp.bfloat16)

    for N in (8192, 40960):
        idx = jax.random.randint(key, (N,), 0, HW)
        idx_sorted = jnp.sort(idx)
        yi = idx // W
        xi = idx % W

        def g_flat(i, acc, idx=idx):
            return flat[idx + (i.astype(jnp.int32) % 2)].sum() * 0.0

        def g_sorted(i, acc, idx=idx_sorted):
            return flat[idx + (i.astype(jnp.int32) % 2)].sum() * 0.0

        def g_2d(i, acc, yi=yi, xi=xi):
            starts = jnp.stack([yi + (i.astype(jnp.int32) % 2), xi], -1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0, 1), start_index_map=(0, 1),
            )
            return jax.lax.gather(img, starts, dn, slice_sizes=(1, 1),
                                  mode=jax.lax.GatherScatterMode.CLIP).sum() * 0.0

        def g_bf16(i, acc, idx=idx):
            return img_bf16.reshape(-1)[idx + (i.astype(jnp.int32) % 2)].sum().astype(jnp.float32) * 0.0

        # gather shaped as (N/128, 128) indices (2D index array)
        idx2 = idx.reshape(-1, 128)

        def g_shaped(i, acc, idx2=idx2):
            return flat[idx2 + (i.astype(jnp.int32) % 2)].sum() * 0.0

        # take_along_axis on rows: gather one element per (row-major point) —
        # point i gathers from row yi[i]: one_hot trick along W via dot:
        # skip (too big). Instead: dynamic_slice in a vmapped scan? skip.

        print(f"N={N}")
        print(f"  flat 1D idx:    {dev_time(g_flat):7.4f} ms")
        print(f"  sorted idx:     {dev_time(g_sorted):7.4f} ms")
        print(f"  2D (N,2) idx:   {dev_time(g_2d):7.4f} ms")
        print(f"  bf16 flat:      {dev_time(g_bf16):7.4f} ms")
        print(f"  (N/128,128) idx:{dev_time(g_shaped):7.4f} ms")

    # Row-blocked gather: operand (H, W) -> gather rows then in-row index?
    # one_hot matmul along W for a row-batch: cost model check with (8, W) x (W, 128)
    # segment trick skipped.

    # How does gather scale with operand size? small operand (fits VMEM)
    small = jax.random.uniform(key, (64, 128), jnp.float32)
    sflat = small.reshape(-1)
    N = 40960
    sidx = jax.random.randint(key, (N,), 0, 64 * 128)

    def g_small(i, acc):
        return sflat[sidx + (i.astype(jnp.int32) % 2)].sum() * 0.0

    print(f"gather from 8K-elem operand (N=40960): {dev_time(g_small):7.4f} ms")

    # iota-based select: is it bandwidth or per-index? gather N=128 only
    tidx = jax.random.randint(key, (128,), 0, HW)

    def g_tiny(i, acc):
        return flat[tidx + (i.astype(jnp.int32) % 2)].sum() * 0.0

    print(f"gather N=128:                          {dev_time(g_tiny):7.4f} ms")


if __name__ == "__main__":
    main()
