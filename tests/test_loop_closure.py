"""Loop closure: proposal -> photometric verification -> pose-graph correction.

Layer 1 exercises the full mechanism deterministically: keyframes rendered at
TRUE poses, store poses corrupted by compounding odometry drift, and the
closure must (a) propose the revisited keyframe, (b) photometrically recover
the true relative pose from the drifted warm start, (c) shrink the
end-of-chain drift through the pose graph.

Layer 2 smoke-tests the `run_slam(loop_closure=True)` integration on an
out-and-back trajectory.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import CameraConfig, PipelineConfig, TrackerConfig, DepthConfig, KeyframeConfig
from odometry_tpu.data.synthetic import make_driving_scene, render_stereo
from odometry_tpu.geometry import se3_exp, se3_inverse
from odometry_tpu.image.pyramid import gaussian_blur3
from odometry_tpu.kernels.points import extract_points
from odometry_tpu.kernels.select import select_points
from odometry_tpu.mapping.keyframe import create_store, insert_keyframe
from odometry_tpu.mapping.loop_closure import (
    LoopClosureConfig,
    close_loop,
    propose_loop,
    verify_loop,
)

H, W = 144, 320
FX = 400.0
BASELINE = 386.1448 / 718.856
CAP = 2048


def _out_and_back_poses(n_half: int, step: float):
    """Forward along +z then back to the start; slight x wobble for variety."""
    poses = []
    for k in range(2 * n_half + 1):
        z = step * (k if k <= n_half else 2 * n_half - k)
        x = 0.05 * np.sin(0.9 * k)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (x, 0.0, z)
        poses.append(T)
    return poses


@pytest.fixture(scope="module")
def loop_world():
    cam = Pinhole.create(FX, FX, W / 2.0, H / 2.0)
    scene = make_driving_scene(3)
    poses = _out_and_back_poses(6, 0.25)
    rendered = [
        render_stereo(scene, cam, BASELINE, jnp.asarray(T), H, W) for T in poses
    ]
    return cam, poses, rendered


def _drifted_chain(poses, eps_twist):
    """Compound a per-step twist error into the pose chain (odometry drift)."""
    D = se3_exp(jnp.asarray(eps_twist, jnp.float32))
    est = [jnp.asarray(poses[0])]
    for k in range(1, len(poses)):
        rel = se3_inverse(jnp.asarray(poses[k - 1])) @ jnp.asarray(poses[k])
        est.append(est[-1] @ rel @ D)
    return est


def _build_store(cam, est_poses, rendered):
    store = create_store(len(rendered), CAP, H, W)
    for k, (l, _r, z) in enumerate(rendered):
        ls = gaussian_blur3(l)
        sel = select_points(ls, boundary=4, block_rows=8, block_cols=16,
                            grad_th=8.0, max_points_per_block=80)
        inv = 1.0 / jnp.asarray(z)
        pts = extract_points(inv, sel, CAP, order="row")
        inten = l[pts.ys.astype(jnp.int32), pts.xs.astype(jnp.int32)]
        store = insert_keyframe(store, pts, inten, est_poses[k], k, image=l)
    return store


def test_loop_closure_shrinks_drift(loop_world):
    cam, poses, rendered = loop_world
    # ~0.4% rotation + 8 mm translation error per keyframe step.
    est = _drifted_chain(poses, [0.004, -0.008, 0.003, 0.002, -0.001, 0.004])
    store = _build_store(cam, est, rendered)
    n = len(poses)
    drift_before = float(jnp.linalg.norm(est[-1][:3, 3] - jnp.asarray(poses[-1])[:3, 3]))
    assert drift_before > 0.05, "fixture must have meaningful drift"

    lc = LoopClosureConfig(radius=1.0, min_separation=4, min_inliers=150)
    prop = propose_loop(store, lc)
    assert prop is not None
    ci, ni = prop
    assert ni == n - 1 and ci == 0  # end of the loop closes against the start

    tcfg = TrackerConfig(interp="bilinear", robust="huber")
    ver = verify_loop(store, ci, ni, cam, tcfg, lc)
    assert bool(ver.ok), (float(ver.cost), int(ver.inliers))
    T_true = se3_inverse(jnp.asarray(poses[ni])) @ jnp.asarray(poses[ci])
    assert float(jnp.abs(ver.T_rel - T_true).max()) < 5e-3

    store2 = close_loop(store, ci, ni, ver.T_rel, lc)
    drift_after = float(
        jnp.linalg.norm(store2.pose[ni][:3, 3] - jnp.asarray(poses[ni])[:3, 3])
    )
    assert drift_after < 0.35 * drift_before, (drift_before, drift_after)


def test_verification_rejects_wrong_place(loop_world):
    """A proposal whose pose prior is a lie (the keyframe is really ~1.5 m
    away) must be rejected: the photometric solve honestly recovers the TRUE
    relative pose, and the correction-consistency gate sees a correction far
    beyond any plausible drift."""
    cam, poses, rendered = loop_world
    est = [jnp.asarray(T) for T in poses]
    store = _build_store(cam, est, rendered)
    lc = LoopClosureConfig(radius=1.0, min_separation=2, min_inliers=150,
                           max_correction_t=0.5)
    # Claim the far end of the forward leg sits at the start: ~1.5 m apart.
    tcfg = TrackerConfig(interp="bilinear", robust="huber")
    store_bad = dataclasses.replace(
        store, pose=store.pose.at[6].set(store.pose[0])
    )
    ver = verify_loop(store_bad, 6, len(poses) - 1, cam, tcfg, lc)
    assert not bool(ver.ok), (float(ver.cost), int(ver.inliers))


def test_run_slam_with_loop_closure(loop_world):
    from odometry_tpu.pipeline.runner import run_sequence  # noqa: F401 (import check)
    from odometry_tpu.pipeline.slam import run_slam

    cam, poses, rendered = loop_world
    frames = [(l, r) for l, r, _ in rendered]
    cfg = PipelineConfig(
        camera=CameraConfig(fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
                            baseline=BASELINE, height=H, width=W),
        tracker=TrackerConfig(interp="bilinear", depth_decimation="even",
                              num_levels=3, max_iterations=(10, 20, 30),
                              point_capacity=CAP),
        depth=DepthConfig(interp="bilinear", block_rows=8, block_cols=16,
                          min_valid_points=30),
        keyframe=KeyframeConfig(motion_threshold=0.15, reset_on_promote=True),
    )
    res = run_slam(
        frames, cfg, map_capacity=16, window=4, ba_every=100,  # BA off
        loop_closure=True,
        lc_cfg=LoopClosureConfig(radius=0.8, min_separation=3, min_inliers=100),
    )
    assert res.failed_at is None
    assert res.loop_closures >= 1
    err_end = np.linalg.norm(res.poses[-1][:3, 3] - poses[-1][:3, 3])
    assert err_end < 0.2, err_end


def test_long_loop_with_meters_of_drift_closes(loop_world):
    """Round-5 drift-proof gates: a genuine loop whose accumulated drift
    exceeds 1 m must still be proposed (drift-scaled radius + appearance
    NCC), verified (drift-scaled correction gate) and corrected — the fixed
    r4 gates rejected this by construction (VERDICT r4 item 6)."""
    cam = Pinhole.create(FX, FX, W / 2.0, H / 2.0)
    # Deeper corridor (~10-26 m): a realistic drift-to-flow ratio, so the
    # coarse-to-fine verification solve can absorb meters of drift.
    scene = make_driving_scene(3, side_x=20.0, wall_z=26.0)
    poses = _out_and_back_poses(20, 0.5)  # 20 m of travel, ends at the start
    rendered = [
        render_stereo(scene, cam, BASELINE, jnp.asarray(T), H, W) for T in poses
    ]
    # 3 cm lateral + slight yaw error per step: > 1 m of endpoint drift.
    est = _drifted_chain(poses, [0.03, 0.0, -0.004, 0.0, 0.0008, 0.0])
    drift_before = float(
        jnp.linalg.norm(est[-1][:3, 3] - jnp.asarray(poses[-1])[:3, 3])
    )
    assert drift_before > 1.0, drift_before

    store = create_store(len(rendered), CAP, H, W)
    path = 0.0
    prev = np.asarray(est[0])[:3, 3]
    for k, (l, _r, z) in enumerate(rendered):
        ls = gaussian_blur3(l)
        sel = select_points(ls, boundary=4, block_rows=8, block_cols=16,
                            grad_th=8.0, max_points_per_block=80)
        inv = 1.0 / jnp.asarray(z)
        pts = extract_points(inv, sel, CAP, order="row")
        inten = l[pts.ys.astype(jnp.int32), pts.xs.astype(jnp.int32)]
        cur = np.asarray(est[k])[:3, 3]
        path += float(np.linalg.norm(cur - prev))
        prev = cur
        store = insert_keyframe(store, pts, inten, est[k], k, image=l, path=path)

    lc = LoopClosureConfig(radius=1.0, min_separation=4, min_inliers=150,
                           drift_per_meter=0.08, max_iters=60)
    # The r4-style fixed gates reject this loop by construction.
    lc_fixed = dataclasses.replace(lc, drift_per_meter=0.0)
    prop_fixed = propose_loop(store, lc_fixed)
    tcfg = TrackerConfig(interp="bilinear", robust="huber")
    if prop_fixed is not None:
        ver_fixed = verify_loop(store, prop_fixed[0], prop_fixed[1], cam, tcfg,
                                lc_fixed)
        assert not bool(ver_fixed.ok)

    prop = propose_loop(store, lc)
    assert prop is not None, "drift-scaled proposal must fire"
    ci, ni = prop
    assert ni == len(poses) - 1 and ci <= 2, (ci, ni)
    ver = verify_loop(store, ci, ni, cam, tcfg, lc)
    assert bool(ver.ok), (float(ver.cost), int(ver.inliers))
    T_true = se3_inverse(jnp.asarray(poses[ni])) @ jnp.asarray(poses[ci])
    assert float(jnp.abs(ver.T_rel - T_true).max()) < 2e-2

    store2 = close_loop(store, ci, ni, ver.T_rel, lc)
    drift_after = float(
        jnp.linalg.norm(store2.pose[ni][:3, 3] - jnp.asarray(poses[ni])[:3, 3])
    )
    assert drift_after < 0.25 * drift_before, (drift_before, drift_after)


def test_proposal_rejects_appearance_mismatch(loop_world):
    """Two keyframes at the same *estimated* position but showing different
    places must not be proposed when the appearance gate is on."""
    cam, poses, rendered = loop_world
    est = [jnp.asarray(T) for T in poses]
    store = _build_store(cam, est, rendered)
    # Lie: put keyframe 6 (far end, different view) at the newest's position.
    store_bad = dataclasses.replace(
        store, pose=store.pose.at[6].set(store.pose[len(poses) - 1])
    )
    lc = LoopClosureConfig(radius=0.5, min_separation=2, appearance_ncc=0.6)
    prop = propose_loop(store_bad, lc)
    if prop is not None:
        # If anything is proposed it must not be the lying slot 6.
        assert prop[0] != 6
