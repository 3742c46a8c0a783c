"""In-dispatch bisection of the LM body and pyramid (true device times)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def dev_time(make_body, K=200, reps=3):
    """Time K sequential applications of body inside one dispatch."""
    f = jax.jit(make_body(K))
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / K * 1e3


def main():
    key = jax.random.PRNGKey(0)
    N = 40960
    H, W = 376, 1241
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    idx = jax.random.randint(key, (N,), 0, H * W)
    yi0 = idx // W
    xi0 = idx % W
    u0 = xi0.astype(jnp.float32)
    v0 = yi0.astype(jnp.float32)

    from odometry_tpu.image.sampling import clip_gather_2d, sample_bilinear

    def loop(body):
        def f():
            def b(i, acc):
                return acc + body(i, acc)

            return jax.lax.fori_loop(0, 200, b, jnp.float32(0.0))

        return f

    def mk(body):
        def make(K):
            def f():
                def b(i, acc):
                    return acc + body(i, acc)

                return jax.lax.fori_loop(0, K, b, jnp.float32(0.0))

            return f

        return make

    # 1 gather of N
    t = dev_time(mk(lambda i, acc: clip_gather_2d(img, yi0 + (i % 2), xi0).sum() * 0.0))
    print(f"1 gather (N=40960):      {t:7.4f} ms")

    # 6 gathers
    def g6(i, acc):
        s = 0.0
        for dy in (-1, 0, 1):
            for dx in (0, 1):
                s = s + clip_gather_2d(img, yi0 + dy + (i % 2), xi0 + dx)
        return s.sum() * 0.0

    print(f"6 gathers:               {dev_time(mk(g6)):7.4f} ms")

    # bilinear (4 gathers + lerp)
    def bil(i, acc):
        return sample_bilinear(img, u0 + acc, v0).sum() * 0.0

    print(f"bilinear:                {dev_time(mk(bil)):7.4f} ms")

    # patch gather (1,4) slices per index: 1 gather fetching 4 elems
    def gpatch(i, acc):
        starts = jnp.stack([yi0 + (i % 2), xi0], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1),
        )
        return jax.lax.gather(
            img, starts, dn, slice_sizes=(2, 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).sum() * 0.0

    print(f"patch (2,2) gather:      {dev_time(mk(gpatch)):7.4f} ms")

    # elementwise chain of 30 on (N,)
    x1 = jax.random.uniform(key, (N,), jnp.float32)

    def ch30(i, acc):
        x = x1 + acc
        for _ in range(30):
            x = x * 1.0001 + 0.5
        return x.sum() * 0.0

    print(f"30-op chain (N,):        {dev_time(mk(ch30)):7.4f} ms")

    # J stack -> (N,6) einsum
    J6 = [jax.random.uniform(key, (N,), jnp.float32) for _ in range(6)]
    r = jax.random.uniform(key, (N,), jnp.float32)

    def neq_n6(i, acc):
        J = jnp.stack([j + acc for j in J6], axis=-1)  # (N, 6)
        JtWJ = jnp.einsum("ni,nj->ij", J, J, precision=jax.lax.Precision.HIGHEST)
        JtWr = jnp.einsum("ni,n->i", J, r, precision=jax.lax.Precision.HIGHEST)
        return JtWJ[0, 0] * 0.0 + JtWr[0] * 0.0

    print(f"neq (N,6) stack+einsum:  {dev_time(mk(neq_n6)):7.4f} ms")

    def neq_6n(i, acc):
        J = jnp.stack([j + acc for j in J6], axis=0)  # (6, N)
        JtWJ = jax.lax.dot_general(J, J, (((1,), (1,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)
        JtWr = J @ r
        return JtWJ[0, 0] * 0.0 + JtWr[0] * 0.0

    print(f"neq (6,N) dot_general:   {dev_time(mk(neq_6n)):7.4f} ms")

    # pyramid pieces
    from odometry_tpu.image.pyramid import gaussian_blur3, pyr_down

    print(f"blur3:                   {dev_time(mk(lambda i, acc: gaussian_blur3(img + acc)[0, 0] * 0.0)):7.4f} ms")
    print(f"pyr_down:                {dev_time(mk(lambda i, acc: pyr_down(img + acc)[0, 0] * 0.0)):7.4f} ms")

    # conv-based blur/down alternatives
    def blur3_conv(x):
        k = jnp.array([0.25, 0.5, 0.25], jnp.float32)
        xp = jnp.pad(x, 1, mode="reflect")[None, None]
        h = jax.lax.conv_general_dilated(xp, k.reshape(1, 1, 1, 3), (1, 1), "VALID")
        return jax.lax.conv_general_dilated(h, k.reshape(1, 1, 3, 1), (1, 1), "VALID")[0, 0]

    print(f"blur3 via conv:          {dev_time(mk(lambda i, acc: blur3_conv(img + acc)[0, 0] * 0.0)):7.4f} ms")

    def down_conv(x):
        k = jnp.array([1, 4, 6, 4, 1], jnp.float32) / 16.0
        xp = jnp.pad(x, 2, mode="reflect")[None, None]
        h = jax.lax.conv_general_dilated(xp, k.reshape(1, 1, 1, 5), (1, 2), "VALID")
        return jax.lax.conv_general_dilated(h, k.reshape(1, 1, 5, 1), (2, 1), "VALID")[0, 0]

    print(f"pyr_down via conv:       {dev_time(mk(lambda i, acc: down_conv(img + acc)[0, 0] * 0.0)):7.4f} ms")


if __name__ == "__main__":
    main()
