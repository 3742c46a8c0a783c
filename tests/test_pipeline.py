"""End-to-end pipeline tests on a synthetic stereo sequence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import (
    CameraConfig,
    DepthConfig,
    KeyframeConfig,
    PipelineConfig,
    TrackerConfig,
)
from odometry_tpu.data.synthetic import (
    make_scene,
    drive_trajectory,
    stereo_sequence,
)
from odometry_tpu.eval.metrics import mean_translation_error, ate_rmse, rpe
from odometry_tpu.pipeline.odometry import init, step
from odometry_tpu.pipeline.runner import run_sequence

H, W = 96, 160
CFG = PipelineConfig(
    camera=CameraConfig(fx=240.0, fy=240.0, cx=W / 2.0, cy=H / 2.0, height=H, width=W),
    # 3 levels: at 96x160 the semi-dense depth decimates to too few points for
    # a stable 6-DOF solve at a 4th level (KITTI-size frames use 4). Improved
    # modes (bilinear warps + aligned decimation): the reference's stacked
    # floor/misalignment quirks are exercised by kernel-level golden tests;
    # end-to-end accuracy assertions need the well-posed configuration.
    tracker=TrackerConfig(interp="bilinear", num_levels=3, max_iterations=(10, 20, 30),
                          depth_decimation="even"),
    depth=DepthConfig(block_rows=8, block_cols=16, min_valid_points=30,
                      interp="bilinear"),
    # Small image + small motions: lower the promotion threshold so the test
    # sequence actually creates keyframes.
    keyframe=KeyframeConfig(motion_threshold=0.2),
)
CAM = Pinhole.create(240.0, 240.0, W / 2.0, H / 2.0)


@pytest.fixture(scope="module")
def sequence():
    scene = make_scene(11, depth=12.0)
    poses = drive_trajectory(12, step=0.25, seed=2)
    frames = list(
        stereo_sequence(scene, CAM, CFG.camera.baseline, poses, H, W)
    )
    return scene, poses, frames


def test_init_and_single_step(sequence):
    _, poses, frames = sequence
    state, ok = init(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), CFG)
    assert bool(ok)
    assert int(state.kf_count) == 1
    state2, out = step(state, jnp.asarray(frames[1][0]), jnp.asarray(frames[1][1]), CFG)
    assert bool(out.track_ok) and bool(out.depth_ok)
    # Recovered relative motion ~ GT (frame 1 vs 0).
    gt_rel = np.linalg.inv(poses[1]) @ poses[0]  # kf-cam -> cur-cam
    t_err = np.linalg.norm(np.asarray(out.pose_to_kf)[:3, 3] - gt_rel[:3, 3])
    assert t_err < 0.05
    assert int(state2.frame_id) == 1


def test_run_sequence_trajectory(sequence):
    _, poses, frames = sequence
    res = run_sequence(frames, CFG)
    assert res.failed_at is None
    assert res.num_frames == len(frames)
    # Unaligned mean translation error (the reference's eval_pose metric).
    mte = mean_translation_error(poses[: res.num_frames], res.poses)
    total_dist = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1).sum()
    assert mte < 0.05 * max(total_dist, 1.0), (mte, total_dist)
    # Standard aligned ATE is small too.
    assert ate_rmse(poses[: res.num_frames], res.poses) < 0.1
    # Keyframes were promoted along the way (motion th 0.2, step 0.25/3.3).
    assert len(res.keyframe_ids) >= 2


def test_step_jit_cache_stable(sequence):
    # One compiled step object serves every frame (shapes static).
    _, _, frames = sequence
    jit_step = jax.jit(lambda s, l, r: step(s, l, r, CFG))
    state, ok = jax.jit(lambda l, r: init(l, r, CFG, None))(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1])
    )
    for (l, r) in frames[1:4]:
        state, out = jit_step(state, jnp.asarray(l), jnp.asarray(r))
    assert jit_step._cache_size() == 1


def test_keyframe_promotion_updates_state(sequence):
    _, _, frames = sequence
    # Force promotion every frame with a tiny threshold.
    cfg = PipelineConfig(
        camera=CFG.camera, tracker=CFG.tracker, depth=CFG.depth,
        keyframe=KeyframeConfig(motion_threshold=1e-6),
    )
    state, _ = init(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
    kf_img_before = np.asarray(state.kf_pyr[0])
    state, out = step(state, jnp.asarray(frames[3][0]), jnp.asarray(frames[3][1]), cfg)
    assert bool(out.promoted)
    assert int(state.kf_count) == 2
    # Keyframe image actually replaced.
    assert not np.allclose(np.asarray(state.kf_pyr[0]), kf_img_before)
    # Keyframe pose is the current pose.
    assert np.allclose(np.asarray(state.kf_pose), np.asarray(out.cur_pose))


def test_depth_failure_keeps_keyframe(sequence):
    _, _, frames = sequence
    state, _ = init(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), CFG)
    kf_img_before = np.asarray(state.kf_pyr[0])
    flat = jnp.full((H, W), 99.0)
    state, out = step(state, flat, flat, CFG)
    assert not bool(out.depth_ok)
    assert not bool(out.promoted)
    assert np.allclose(np.asarray(state.kf_pyr[0]), kf_img_before)


@pytest.mark.slow
def test_lazy_depth_matches_eager_trajectory(sequence):
    import dataclasses

    _, poses, frames = sequence
    res_eager = run_sequence(frames, CFG)
    lazy_cfg = dataclasses.replace(CFG, depth_every_frame=False)
    res_lazy = run_sequence(frames, lazy_cfg)
    # Identical trajectories: skipped-depth frames never feed the tracker.
    assert np.allclose(res_eager.poses, res_lazy.poses, atol=1e-5)
    assert res_eager.keyframe_ids == res_lazy.keyframe_ids


def test_tracking_lost_recovery(sequence):
    """Corrupt a mid-sequence frame: the relocalize policy must flag it, hold
    the pose, keep running, and recover the trajectory afterwards (VERDICT
    round-1 item 4; SURVEY §5 tracking-lost -> re-initialization policy)."""
    import dataclasses

    _, poses, frames = sequence
    cfg = dataclasses.replace(
        CFG,
        keyframe=KeyframeConfig(
            motion_threshold=0.2, reset_on_promote=True, relocalize=True,
            lost_cost_threshold=500.0, lost_motion_threshold=4.0,
        ),
    )
    bad = list(frames)
    black = (np.zeros((H, W), np.float32), np.zeros((H, W), np.float32))
    bad[6] = black

    # Baseline (no recovery policy): the black frame's depth failure stops
    # the run at frame 6.
    res_plain = run_sequence(bad, CFG)
    assert res_plain.failed_at == 6
    assert res_plain.num_frames == 7

    # With the policy: full sequence runs, the glitch is flagged, the pose is
    # held through it, and tracking re-converges to GT afterwards.
    res = run_sequence(bad, cfg)
    assert res.num_frames == len(frames)
    assert 6 in res.lost_ids
    assert np.allclose(res.poses[6], res.poses[5], atol=1e-6)
    # Post-glitch, tracking re-acquires against the pre-glitch keyframe; the
    # re-acquisition is a wide-baseline solve so a small constant offset
    # (~0.15 m here) persists, but errors stay bounded (no divergence) on a
    # 2.75 m path whose worst drift without recovery would be unbounded.
    post = [i for i in range(7, len(frames)) if i not in res.lost_ids]
    assert len(post) >= 3
    errs = [np.linalg.norm(res.poses[i][:3, 3] - poses[i][:3, 3]) for i in post]
    assert max(errs) < 0.3, errs
    assert errs[-1] < 1.8 * errs[0] + 0.05, errs


def test_relocalize_patience_defers_reseed(sequence):
    """With relocalize_patience=2, a single-frame glitch holds the pose but
    does NOT re-seed the keyframe: the next frame re-tracks against the OLD
    keyframe, so no held-pose error is baked into the keyframe chain."""
    import dataclasses

    _, poses, frames = sequence
    kf = KeyframeConfig(
        motion_threshold=10.0,  # no motion promotions: isolate the policy
        reset_on_promote=True, relocalize=True,
        lost_cost_threshold=500.0, lost_motion_threshold=4.0,
        relocalize_patience=2,
    )
    cfg = dataclasses.replace(CFG, keyframe=kf)
    scene, _, _ = sequence
    bad = list(frames[:8])
    # The dangerous glitch: a teleported frame (valid imagery, healthy stereo
    # depth, wildly wrong motion). A blacked-out frame cannot re-seed (its
    # depth fails the survivor guard), so only this shape of glitch separates
    # the patience policies.
    from odometry_tpu.data.synthetic import render_stereo

    tele = np.asarray(poses[4]).copy()
    tele[:3, 3] += np.asarray([4.0, 0.0, -2.0], np.float32)
    l_t, r_t, _ = render_stereo(scene, CAM, CFG.camera.baseline,
                                jnp.asarray(tele), H, W)
    bad[4] = (np.asarray(l_t), np.asarray(r_t))

    res = run_sequence(bad, cfg)
    assert res.num_frames == 8
    assert 4 in res.lost_ids
    # Patience 2 + a 1-frame glitch: no keyframe was ever created beyond
    # frame 0 (threshold 10 blocks motion promotions, patience blocks the
    # lost re-seed), and post-glitch tracking still re-converges.
    assert res.keyframe_ids == [0]
    err7 = np.linalg.norm(res.poses[7][:3, 3] - poses[7][:3, 3])
    # Re-acquisition against the untouched keyframe: bounded small offset
    # (the held frame contributed no geometry).
    assert err7 < 0.2, err7
    # Same glitch with patience=1 re-seeds at the held pose, baking roughly
    # one frame of motion (~0.25 m here) into the keyframe chain — patience
    # must end up measurably closer to GT.
    cfg1 = dataclasses.replace(
        cfg, keyframe=dataclasses.replace(kf, relocalize_patience=1))
    res1 = run_sequence(bad, cfg1)
    assert 4 in res1.keyframe_ids
    err7_p1 = np.linalg.norm(res1.poses[7][:3, 3] - poses[7][:3, 3])
    assert err7 < err7_p1 - 0.05, (err7, err7_p1)


def test_runner_checkpoint_resume_vis_and_stages(sequence, tmp_path):
    """Operability wiring (VERDICT round-1 item 6): stage timing report,
    checkpoint/resume mid-sequence, keyframe vis collection."""
    _, poses, frames = sequence
    ckpt = str(tmp_path / "ck.npz")

    res_a = run_sequence(frames, CFG, collect_vis=True)
    assert len(res_a.vis) == len(res_a.keyframe_ids)
    img0, inv0, val0 = res_a.vis[0]
    assert img0.shape == (H, W) and inv0.shape == (H, W) and val0.shape == (H, W)
    assert res_a.stage_report["step"]["count"] == len(frames) - 1
    assert res_a.stage_report["init"]["count"] == 1

    # "Crash" after 9 frames with periodic checkpoints, then resume the full
    # sequence: the final trajectory must equal the uninterrupted run.
    run_sequence(frames[:9], CFG, checkpoint_path=ckpt, checkpoint_every=4)
    assert (tmp_path / "ck.npz").exists()
    res_b = run_sequence(frames, CFG, checkpoint_path=ckpt, resume=True)
    assert res_b.num_frames == res_a.num_frames
    assert np.allclose(res_b.poses, res_a.poses, atol=1e-6)
    assert res_b.keyframe_ids == res_a.keyframe_ids
    assert "resume" in res_b.stage_report


def test_rpe_metric_sane(sequence):
    _, poses, frames = sequence
    res = run_sequence(frames, CFG)
    t_rpe, r_rpe = rpe(poses[: res.num_frames], res.poses, delta=1)
    # Frame-to-keyframe tracking concentrates drift at keyframe switches, so
    # per-frame RPE is looser than ATE; bound it at ~40% of the 0.25 m step.
    assert t_rpe < 0.1
    assert r_rpe < 0.02


def test_production_presets_warm_start_is_reference():
    """Round-3 regression guard: the constant-velocity warm start diverges on
    weakly-conditioned (planar) scenes — a two-term recurrence on past
    estimates amplifies noise along the plane-homography null directions until
    tracking is lost (measured mte 0.06 -> 4.6 on the 49-frame bench scene;
    BENCH_r02 failure). The production presets must warm-start the reference
    way; see TrackerConfig.warm_start for the full analysis and
    test_constant_velocity_diverges_on_planar_scene for the closed loop."""
    from odometry_tpu.config import accurate_config, fast_config

    assert fast_config().tracker.warm_start == "reference"
    assert accurate_config().tracker.warm_start == "reference"


@pytest.mark.slow
def test_constant_velocity_diverges_on_planar_scene():
    """Closed-loop accuracy gate on a scaled-down replica of bench.py's
    single-plane scene: the fast preset must track it (planar scenes are
    common — roads, walls), and the constant-velocity warm start must still
    be known-unstable there (if this stops failing, the CV hazard note in
    TrackerConfig and the preset choice deserve a revisit)."""
    import dataclasses

    from odometry_tpu.config import fast_config
    from odometry_tpu.data.synthetic import render_stereo

    Hs, Ws = 144, 320
    cam_cfg = CameraConfig(fx=180.0, fy=180.0, cx=Ws / 2.0, cy=Hs / 2.0,
                           baseline=0.537, height=Hs, width=Ws)
    cam = Pinhole.create(180.0, 180.0, Ws / 2.0, Hs / 2.0)
    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(30, step=0.35, seed=4)
    render = jax.jit(lambda T: render_stereo(scene, cam, 0.537, T, Hs, Ws))
    frames = [tuple(map(np.asarray, render(jnp.asarray(T))[:2])) for T in poses]

    base = dataclasses.replace(fast_config(), camera=cam_cfg)
    res = run_sequence(frames, base)
    mte = mean_translation_error(poses[: res.num_frames], res.poses)
    assert mte < 0.6, f"fast preset lost the planar scene: mte={mte}"
    assert not res.lost_ids

    cv = dataclasses.replace(
        base, tracker=dataclasses.replace(base.tracker,
                                          warm_start="constant_velocity"))
    res_cv = run_sequence(frames, cv)
    mte_cv = mean_translation_error(poses[: res_cv.num_frames], res_cv.poses)
    assert mte_cv > 2 * mte, (
        f"constant-velocity warm start no longer diverges here "
        f"(mte_cv={mte_cv} vs {mte}); revisit the preset choice")


def test_debug_checks_localize_nan_frame(sequence):
    """Sanitizer mode (SURVEY §5 A2): a NaN injected into an input frame
    raises a localized checkify error at that frame; the production path
    silently absorbs it (isfinite guards). utils/debug.py."""
    _, _, frames = sequence
    bad = list(frames[:5])
    l2 = np.asarray(bad[2][0]).copy()
    l2[10, 10] = np.nan
    bad[2] = (l2, bad[2][1])

    with pytest.raises(Exception) as ei:
        run_sequence(bad, CFG, debug_checks=True)
    assert "non-finite LEFT input frame" in str(ei.value)

    # Production path: absorbed (no exception), tracking flags handle it.
    res = run_sequence(bad, CFG, debug_checks=False)
    assert res.num_frames >= 3
