"""Pallas disparity kernel parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from odometry_tpu.camera import Pinhole
from odometry_tpu.data.synthetic import make_scene, render_stereo
from odometry_tpu.image import gaussian_blur3
from odometry_tpu.kernels.select import select_points
from odometry_tpu.kernels.disparity import disparity_search

# Small frame: interpret-mode Pallas is slow.
H, W = 48, 96
CAM = Pinhole.create(140.0, 140.0, W / 2.0, H / 2.0)


@pytest.fixture(scope="module")
def stereo():
    scene = make_scene(5, depth=10.0)
    left, right, _ = render_stereo(scene, CAM, 0.537, jnp.eye(4), H, W)
    ls, rs = gaussian_blur3(left), gaussian_blur3(right)
    sel = select_points(ls, boundary=4, block_rows=4, block_cols=8,
                        grad_th=8.0, max_points_per_block=80)
    return ls, rs, sel


@pytest.fixture(scope="module")
def stereo_wide():
    """Wide pair so a max_disparity >= 129 band exercises NT=3 slab tiling
    (P=256): the production KITTI band (max_disp=192) runs NT=3, where the
    cross-step reverse combine (shift/first-minimum logic) is nontrivial."""
    Ww = 320
    cam = Pinhole.create(140.0, 140.0, Ww / 2.0, H / 2.0)
    scene = make_scene(5, depth=10.0)
    left, right, _ = render_stereo(scene, cam, 0.537, jnp.eye(4), H, Ww)
    ls, rs = gaussian_blur3(left), gaussian_blur3(right)
    sel = select_points(ls, boundary=4, block_rows=4, block_cols=8,
                        grad_th=8.0, max_points_per_block=80)
    return ls, rs, sel


@pytest.mark.parametrize("lr_check", [False, True])
def test_pallas_band_nt3_matches_xla(stereo_wide, lr_check):
    ls, rs, sel = stereo_wide
    kw = dict(fx=140.0, baseline=0.537, boundary=4, ssd_th=900.0,
              lr_check=lr_check, max_disparity=160)
    rx = disparity_search(ls, rs, sel, backend="xla", **kw)
    rp = disparity_search(ls, rs, sel, backend="pallas", **kw)
    mx, mp = np.asarray(rx.matched), np.asarray(rp.matched)
    assert np.array_equal(mx, mp)
    assert np.array_equal(np.asarray(rx.disparity), np.asarray(rp.disparity))
    both = mx
    # The bf16 split's absolute SSD error band scales with image magnitude
    # (|I| ~ 370 here; measured max deviation 0.625) — winners/disparities
    # above are the exact contract, SSD values get the documented band.
    assert np.allclose(np.asarray(rx.best_ssd)[both],
                       np.asarray(rp.best_ssd)[both], rtol=1e-5, atol=1.0)


def test_pallas_band_rmatch_contract_masked_columns(stereo_wide):
    """Cross-backend rmatch contract: candidate columns with no in-band valid
    pair must report rmatch == 0 on BOTH backends (the Pallas combine guards
    fully-masked partials; see disparity_pallas._band_pass)."""
    from odometry_tpu.kernels.disparity import disparity_winner_maps

    ls, rs, _ = stereo_wide
    kw = dict(boundary=4, max_disparity=160, lr_check=True)
    _, _, rm_x, _ = disparity_winner_maps(ls, rs, backend="xla", **kw)
    _, _, rm_p, _ = disparity_winner_maps(ls, rs, backend="pallas", **kw)
    rm_x, rm_p = np.asarray(rm_x), np.asarray(rm_p)
    # Columns left of `boundary` can never be candidates -> masked everywhere.
    assert (rm_x[:, :4] == 0).all()
    assert (rm_p[:, :4] == 0).all()


@pytest.mark.parametrize("lr_check", [False, True])
@pytest.mark.parametrize("max_disp", [None, 24])
def test_pallas_matches_xla(stereo, lr_check, max_disp):
    ls, rs, sel = stereo
    kw = dict(fx=float(CAM.fx), baseline=0.537, boundary=4, ssd_th=900.0,
              lr_check=lr_check, max_disparity=max_disp)
    rx = disparity_search(ls, rs, sel, backend="xla", **kw)
    rp = disparity_search(ls, rs, sel, backend="pallas", **kw)
    mx, mp = np.asarray(rx.matched), np.asarray(rp.matched)
    assert np.array_equal(mx, mp)
    assert np.array_equal(np.asarray(rx.disparity), np.asarray(rp.disparity))
    both = mx
    assert np.allclose(np.asarray(rx.best_ssd)[both],
                       np.asarray(rp.best_ssd)[both], rtol=1e-5, atol=0.5)
