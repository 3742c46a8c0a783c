"""Full SLAM loop: odometry + keyframe map + windowed BA, host-orchestrated.

Composes the jitted odometry step with the mapping backend the reference only
sketched: every promoted keyframe is inserted into the ring-buffer
KeyframeStore, and every `ba_every` keyframes the newest `window` of them is
refined by windowed photometric bundle adjustment (motion-only by default —
depths come from calibrated stereo and anchor the gauge). The live tracking
state is re-anchored to the refined keyframe pose, so BA corrections
propagate into the ongoing trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.camera.pinhole import Pinhole
from odometry_tpu.config import PipelineConfig
from odometry_tpu.mapping.ba import BAConfig, BAProblem, ba_solve
from odometry_tpu.mapping.keyframe import (
    KeyframeStore,
    create_store,
    insert_keyframe,
    window_slots,
    update_poses,
)
from odometry_tpu.pipeline.odometry import init, step


@dataclasses.dataclass
class SlamResult:
    poses: np.ndarray  # (N, 4, 4)
    keyframe_ids: list
    store: KeyframeStore
    num_frames: int
    failed_at: Optional[int]
    ba_runs: int
    fps: float
    loop_closures: int = 0


def run_slam(
    frames: Iterable,
    cfg: PipelineConfig,
    *,
    map_capacity: int = 32,
    window: int = 5,
    ba_every: int = 1,
    ba_cfg: BAConfig | None = None,
    init_pose: np.ndarray | None = None,
    loop_closure: bool = False,
    lc_cfg: "LoopClosureConfig | None" = None,
) -> SlamResult:
    """Run odometry with map maintenance, in-loop window BA, and (when
    `loop_closure`) proximity-proposed, photometrically-verified loop
    closures corrected through the pose graph (mapping/loop_closure.py)."""
    import time

    from odometry_tpu.mapping.loop_closure import (
        LoopClosureConfig,
        close_loop,
        propose_loop,
        verify_loop,
    )

    it = iter(frames)
    left0, right0 = next(it)
    pose0 = jnp.asarray(init_pose) if init_pose is not None else None
    jit_init = jax.jit(lambda l, r: init(l, r, cfg, pose0))
    jit_step = jax.jit(lambda s, l, r: step(s, l, r, cfg))

    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    bacfg = ba_cfg or BAConfig(window=window, iters=4, fix_depths=True)

    state, ok0 = jit_init(jnp.asarray(left0), jnp.asarray(right0))
    if not bool(ok0):
        raise RuntimeError("Init 0-th frame failed! (depth frontend)")

    cap_pts = cfg.tracker.point_capacity
    store = create_store(map_capacity, cap_pts, cfg.camera.height, cfg.camera.width)
    kf0 = state.kf_track[0]
    store = insert_keyframe(store, kf0.pts, kf0.intensity, state.kf_pose, 0,
                            image=state.kf_pyr[0])

    jit_insert = jax.jit(insert_keyframe)
    jit_ba = jax.jit(lambda p: ba_solve(p, cam, bacfg))
    lc = lc_cfg or LoopClosureConfig()
    jit_verify = jax.jit(
        lambda s, ci, ni: verify_loop(s, ci, ni, cam, cfg.tracker, lc)
    )

    poses = [np.asarray(state.cur_pose)]
    keyframe_ids = [0]
    failed_at = None
    ba_runs = 0
    loop_closures = 0
    kf_since_ba = 0
    t0 = time.perf_counter()
    for frame_id, (left, right) in enumerate(it, start=1):
        state, out = jit_step(state, jnp.asarray(left), jnp.asarray(right))
        poses.append(np.asarray(out.cur_pose))
        if not bool(out.depth_ok) and failed_at is None:
            failed_at = frame_id
            break
        if bool(out.promoted):
            keyframe_ids.append(frame_id)
            kf = state.kf_track[0]
            store = jit_insert(store, kf.pts, kf.intensity, state.kf_pose, frame_id,
                               state.kf_pyr[0])
            kf_since_ba += 1
            n_occ = int(jnp.minimum(store.count, map_capacity))
            if kf_since_ba >= ba_every and n_occ >= window:
                slots = window_slots(store, window)
                problem = BAProblem(
                    images=store.image[slots],
                    xs=store.xs[slots],
                    ys=store.ys[slots],
                    inv_depth=store.inv_depth[slots],
                    intensity=store.intensity[slots],
                    point_valid=store.point_valid[slots],
                    pose=store.pose[slots],
                    kf_valid=store.occupied[slots],
                )
                res = jit_ba(problem)
                store = update_poses(store, slots, res.pose)
                # Re-anchor the live state to the refined newest keyframe.
                refined_kf_pose = res.pose[-1]
                state = dataclasses.replace(state, kf_pose=refined_kf_pose)
                ba_runs += 1
                kf_since_ba = 0
            if loop_closure:
                prop = propose_loop(store, lc)
                if prop is not None:
                    ci, ni = prop
                    ver = jit_verify(store, ci, ni)
                    if bool(ver.ok):
                        store = close_loop(store, ci, ni, ver.T_rel, lc)
                        newest_pose = store.pose[ni]
                        state = dataclasses.replace(state, kf_pose=newest_pose)
                        poses[-1] = np.asarray(newest_pose)
                        loop_closures += 1
    total = time.perf_counter() - t0
    n = len(poses)
    return SlamResult(
        poses=np.stack(poses),
        keyframe_ids=keyframe_ids,
        store=store,
        num_frames=n,
        failed_at=failed_at,
        ba_runs=ba_runs,
        fps=(n - 1) / total if n > 1 else 0.0,
        loop_closures=loop_closures,
    )
