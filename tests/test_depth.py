"""End-to-end depth frontend tests on synthetic rectified stereo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import CameraConfig, DepthConfig
from odometry_tpu.data.synthetic import make_scene, render_stereo
from odometry_tpu.depth.estimator import compute_depth, refine_depth

H, W = 96, 160
CAM_CFG = CameraConfig(fx=240.0, fy=240.0, cx=W / 2.0, cy=H / 2.0, height=H, width=W)
CAM = Pinhole.create(240.0, 240.0, W / 2.0, H / 2.0)
# Small-image block grid + relaxed survivor minimum.
CFG = DepthConfig(block_rows=8, block_cols=16, min_valid_points=30)


@pytest.fixture(scope="module")
def stereo():
    scene = make_scene(7, depth=10.0)
    left, right, z = render_stereo(scene, CAM, CAM_CFG.baseline, jnp.eye(4), H, W)
    return np.asarray(left), np.asarray(right), np.asarray(z)


def test_compute_depth_ok_and_accurate(stereo):
    left, right, z = stereo
    res = compute_depth(jnp.asarray(left), jnp.asarray(right), CAM_CFG, CFG)
    assert bool(res.ok)
    n = int(res.num_valid)
    assert n >= 30
    valid = np.asarray(res.valid)
    inv = np.asarray(res.inv_depth)
    gt_inv = 1.0 / z
    err_disp = np.abs(inv - gt_inv)[valid] * CAM_CFG.fx * CAM_CFG.baseline
    # Disparity-equivalent error within ~1 px for the majority.
    assert np.median(err_disp) < 1.0
    assert (err_disp < 2.0).mean() > 0.9
    # Depths are inside the configured range.
    depths = 1.0 / inv[valid]
    assert depths.min() >= CFG.min_depth and depths.max() <= CFG.max_depth


def test_compute_depth_invalid_pixels_zeroed(stereo):
    left, right, _ = stereo
    res = compute_depth(jnp.asarray(left), jnp.asarray(right), CAM_CFG, CFG)
    inv = np.asarray(res.inv_depth)
    valid = np.asarray(res.valid)
    assert np.all(inv[~valid] == 0.0)


def test_compute_depth_fails_on_textureless():
    flat = jnp.full((H, W), 128.0)
    res = compute_depth(flat, flat, CAM_CFG, CFG)
    assert not bool(res.ok)
    assert int(res.num_valid) == 0


def test_compute_depth_jits(stereo):
    left, right, _ = stereo
    f = jax.jit(lambda a, b: compute_depth(a, b, CAM_CFG, CFG))
    res = f(jnp.asarray(left), jnp.asarray(right))
    assert bool(res.ok)
    assert int(res.iters) <= CFG.max_iters


def test_refine_improves_noisy_init(stereo):
    # Refinement is only well-posed on high-gradient pixels (the linearized
    # step is r/J; weak gradients make it explode) — exactly why the reference
    # refines only gradient-selected points. Use the real selection mask.
    from odometry_tpu.image import gaussian_blur3
    from odometry_tpu.kernels.select import select_points

    left, right, z = stereo
    rng = np.random.default_rng(0)
    gt_inv = (1.0 / z).astype(np.float32)
    mask = np.asarray(
        select_points(gaussian_blur3(jnp.asarray(left)), boundary=CFG.boundary,
                      block_rows=CFG.block_rows, block_cols=CFG.block_cols,
                      grad_th=CFG.grad_th, max_points_per_block=CFG.max_points_per_block)
    )
    assert mask.sum() > 30
    # Realistic init error: the integer SSD search delivers d within ~0.5 px.
    # (Larger noise exceeds the attraction basin of the single-center-pixel
    # residual the reference minimizes — accidental intensity matches are
    # dense — and the floor-quantized warp bounds accuracy at ~0.5 px anyway.)
    noise = rng.uniform(-0.5, 0.5, (H, W)).astype(np.float32) / (
        CAM_CFG.fx * CAM_CFG.baseline
    )
    init = gt_inv + noise * mask
    refined, resid, iters, cost = refine_depth(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(init), jnp.asarray(mask),
        CAM_CFG, CFG,
    )
    assert int(iters) > 0
    tx_fx = CAM_CFG.fx * CAM_CFG.baseline
    err_px = np.abs(np.asarray(refined) - gt_inv)[mask] * tx_fx
    # Error stays bounded by the quantization floor...
    assert np.median(err_px) < 1.2
    # ...and the photometric objective itself improved.
    from odometry_tpu.depth.estimator import _eval_system
    _, _, _, err0 = _eval_system(
        jnp.asarray(init), jnp.asarray(left), jnp.asarray(right), jnp.asarray(mask),
        tx_fx, CFG.huber_delta,
    )
    assert float(cost) < float(err0)


def test_refine_out_of_bounds_guarded():
    # Huge inverse depth warps far out of the image: refinement must not NaN
    # (guarded deviation from the reference's delta = 0/0).
    left = jnp.asarray(np.random.default_rng(1).random((H, W)).astype(np.float32) * 255)
    right = left
    mask = np.zeros((H, W), bool)
    mask[10, 10] = True
    init = jnp.full((H, W), 5.0)  # warps ~600 px away
    refined, resid, iters, cost = refine_depth(
        left, right, init, jnp.asarray(mask), CAM_CFG, CFG
    )
    assert np.all(np.isfinite(np.asarray(refined)))
    assert float(np.asarray(resid)[10, 10]) == -1000.0


def test_outlier_gates_cut_error_tail(stereo):
    """Round-5 outlier gates (refine_unmatched=False, refine_max_shift,
    block_consistency_tol): the >1px disparity-error fraction of the valid
    set must drop vs the reference-parity config, without collapsing the
    survivor count. These gates were the multi-seed divergence fix
    (tools/diag_depth_filters.py measured 17% -> 2% at KITTI size)."""
    left, right, z = stereo
    base = compute_depth(jnp.asarray(left), jnp.asarray(right), CAM_CFG, CFG)
    import dataclasses

    gated_cfg = dataclasses.replace(
        CFG, refine_unmatched=False, refine_max_shift=1.5,
        block_consistency_tol=4.0)
    gated = compute_depth(jnp.asarray(left), jnp.asarray(right), CAM_CFG, gated_cfg)

    def frac_bad(res):
        valid = np.asarray(res.valid)
        inv = np.asarray(res.inv_depth)
        err = np.abs(inv - 1.0 / z)[valid] * CAM_CFG.fx * CAM_CFG.baseline
        return (err > 1.0).mean(), valid.sum()

    fb_base, n_base = frac_bad(base)
    fb_gated, n_gated = frac_bad(gated)
    assert fb_gated <= fb_base
    assert fb_gated < 0.05
    assert n_gated >= 0.4 * n_base


def test_refine_max_shift_culls_drifters(stereo):
    """A tight refine_max_shift strictly shrinks the valid set to lanes whose
    refined disparity stayed near the integer search winner."""
    import dataclasses

    left, right, _ = stereo
    loose = compute_depth(jnp.asarray(left), jnp.asarray(right), CAM_CFG,
                          dataclasses.replace(CFG, refine_unmatched=False))
    tight = compute_depth(
        jnp.asarray(left), jnp.asarray(right), CAM_CFG,
        dataclasses.replace(CFG, refine_unmatched=False, refine_max_shift=0.5))
    v_loose = np.asarray(loose.valid)
    v_tight = np.asarray(tight.valid)
    assert v_tight.sum() <= v_loose.sum()
    # Tight survivors are a subset of loose survivors.
    assert not (v_tight & ~v_loose).any()


def test_block_median_map_masked():
    from odometry_tpu.kernels.select import block_median_map

    H2, W2 = 24, 40
    vals = np.zeros((H2, W2), np.float32)
    mask = np.zeros((H2, W2), bool)
    # One block region with values {3, 5, 9} -> median 5.
    vals[5, 5], vals[6, 6], vals[7, 7] = 3.0, 5.0, 9.0
    mask[5, 5] = mask[6, 6] = mask[7, 7] = True
    out = np.asarray(
        block_median_map(jnp.asarray(vals), jnp.asarray(mask),
                         boundary=2, block_rows=2, block_cols=2))
    assert out[5, 5] == 5.0
    # Uncovered/empty blocks are +inf.
    assert np.isinf(out[20, 30])


def test_second_best_ratio_gate_available(stereo):
    """ratio_test on: the valid set is a subset of the ratio-off valid set."""
    import dataclasses

    left, right, _ = stereo
    off = compute_depth(jnp.asarray(left), jnp.asarray(right), CAM_CFG,
                        dataclasses.replace(CFG, refine_unmatched=False))
    on = compute_depth(
        jnp.asarray(left), jnp.asarray(right), CAM_CFG,
        dataclasses.replace(CFG, refine_unmatched=False, ratio_test=0.8))
    v_off, v_on = np.asarray(off.valid), np.asarray(on.valid)
    assert v_on.sum() <= v_off.sum()
    assert v_on.sum() > 0
