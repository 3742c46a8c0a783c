"""Measured-vs-speed-of-light accounting for the hot kernels (PERF.md data).

For each kernel: time it in isolation on the chip (jitted, steady-state),
compute analytic FLOPs and minimum HBM bytes from the shapes, and report
measured time vs the compute roofline (FLOPs / peak) and bandwidth roofline
(bytes / peak BW) — the larger of the two is the speed-of-light bound.

v5e (1 chip) peaks used: 394 TFLOP/s bf16 MXU, 197 TFLOP/s f32-via-bf16x3
(3 passes), ~819 GB/s HBM. Sources: public TPU v5e spec sheet numbers.

Usage: python tools/roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 394e12
PEAK_HBM = 819e9


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, t, flops, bytes_, note=""):
    t_c = flops / PEAK_BF16
    t_b = bytes_ / PEAK_HBM
    sol = max(t_c, t_b)
    bound = "compute" if t_c > t_b else "bandwidth"
    print(
        f"{name:34s} {t*1e6:9.1f} us | SoL {sol*1e6:8.1f} us ({bound}-bound: "
        f"{flops/1e9:7.2f} GFLOP, {bytes_/1e6:7.1f} MB) | eff {100*sol/t:5.1f}% {note}"
    )
    return dict(name=name, measured_us=t * 1e6, sol_us=sol * 1e6,
                gflop=flops / 1e9, mb=bytes_ / 1e6, bound=bound,
                efficiency_pct=100 * sol / t)


def main():
    from odometry_tpu.camera import Pinhole
    from odometry_tpu.config import fast_config
    from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo
    from odometry_tpu.image.pyramid import central_gradients, gaussian_image_pyramid
    from odometry_tpu.image.sampling import sample_channels_mm
    from odometry_tpu.kernels.disparity import disparity_winner_maps, pattern_stack

    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(3, step=0.35, seed=4)
    render = jax.jit(lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W))
    l, r, _ = render(jnp.asarray(poses[1]))
    print(f"device: {jax.devices()[0].device_kind}; frame {H}x{W}\n")
    rows = []

    # --- 1. Banded disparity search (fast config: max_disp 192 -> P=256, NT=3)
    P = 256
    S = P + 128
    Hp, Wp = -(-H // 16) * 16, -(-W // 128) * 128
    steps = (Hp // 16) * (Wp // 128)
    K = 72  # 8-pattern x 9 exact-split pairs
    f = jax.jit(lambda a, b: disparity_winner_maps(
        a, b, boundary=4, max_disparity=192, min_disparity=1,
        lr_check=True, backend="pallas"))
    t = timeit(f, l, r)
    flops = 2 * K * 128 * S * 16 * steps  # MXU cross terms
    # HBM floor: Q + NT x C slab reads (bf16 K-stacks) + norms + outputs.
    bytes_ = (Hp * K * Wp * 2) * (1 + 3) + Hp * Wp * (4 * 2) + Hp * Wp * (4 + 4) * 2
    rows.append(report("disparity band P=256 lr", t, flops, bytes_,
                       "(includes XLA pattern/split prep)"))

    # --- 2. mm-sampler: one tracker linearization at level 0 (N = capacity)
    N = cfg.tracker.point_capacity
    gx, gy = central_gradients(l)
    chan = jnp.stack([l, gx, gy])
    u = jnp.linspace(4.0, W - 5.0, N)
    v = jnp.linspace(4.0, H - 5.0, N)
    f2 = jax.jit(lambda c, uu, vv: sample_channels_mm(c, uu, vv))
    t = timeit(f2, chan, u, v)
    C = 3
    flops = 2 * C * H * W * N  # stage-1 matmul
    # HBM floor: imgs + Eu one-hot (W, N) bf16 + M intermediate (C, H, N) f32
    # written+read + Ev (H, N) + output. The M round-trip dominates.
    bytes_ = C * H * W * 2 + W * N * 2 + 2 * (C * H * N * 4) + H * N * 4 + C * N * 4
    rows.append(report(f"mm-sample 3ch N={N} L0", t, flops, bytes_,
                       "(M round-trip dominates bytes)"))

    # --- 3. Gaussian pyramid build (4 levels, banded-matmul blur+decimate)
    f3 = jax.jit(lambda im: gaussian_image_pyramid(im, 4, smooth=True))
    t = timeit(f3, l)
    # Blur as banded matmuls: level areas H*W*(1+1/4+1/16+1/64)
    area = H * W * (1 + 0.25 + 0.0625 + 0.015625)
    flops = 2 * area * (H + W) / 2 * 0  # negligible vs band structure; report bytes
    flops = 2 * (H * W * (3 + 3) * 2)  # separable 3-tap rows+cols, level 0 approx
    bytes_ = area * 4 * 3  # read + intermediate + write per level
    rows.append(report("gaussian pyramid x4", t, flops, bytes_))

    # --- 4. pattern_stack + norms (disparity prep, XLA)
    f4 = jax.jit(lambda a: (lambda P: (P, jnp.sum(P * P, 0)))(pattern_stack(a)))
    t = timeit(f4, l)
    bytes_ = H * W * 4 + 8 * H * W * 4 * 2 + H * W * 4
    rows.append(report("pattern stack + norms", t, 8 * H * W * 2, bytes_))

    print("\nJSON:", [
        {k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()}
        for r in rows
    ])


if __name__ == "__main__":
    main()
