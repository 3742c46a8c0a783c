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


import functools


@functools.cache
def _compiled_slam(cfg: PipelineConfig, bacfg: BAConfig, lc):
    """Cached jitted mapping-backend entry points (keyed by the frozen
    configs, like runner._compiled): re-running a sequence — or another
    sequence with the same configuration — reuses the compiled executables
    instead of re-tracing (a fresh jax.jit(lambda ...) per run_slam call was
    measured to recompile everything every run)."""
    from odometry_tpu.mapping.loop_closure import verify_loop

    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    jit_insert = jax.jit(insert_keyframe)

    def _ba_entry(store: KeyframeStore):
        # Window selection + problem assembly INSIDE the jit: one dispatch
        # per BA run instead of ~10 eager indexing ops (each a round trip
        # on remote links).
        slots = window_slots(store, bacfg.window)
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
        res = ba_solve(problem, cam, bacfg)
        new_store = update_poses(store, slots, res.pose)
        return new_store, res.pose[-1]

    jit_ba = jax.jit(_ba_entry)
    jit_verify = jax.jit(
        lambda s, ci, ni: verify_loop(s, ci, ni, cam, cfg.tracker, lc)
    )
    return jit_insert, jit_ba, jit_verify


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

    from odometry_tpu.mapping.loop_closure import LoopClosureConfig, close_loop, propose_loop
    from odometry_tpu.pipeline.runner import _compiled

    it = iter(frames)
    left0, right0 = next(it)
    jit_init, jit_step = _compiled(cfg, init_pose is not None)

    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    bacfg = (ba_cfg or BAConfig(iters=4, fix_depths=True))._replace(window=window)
    lc = lc_cfg or LoopClosureConfig()
    jit_insert, jit_ba, jit_verify = _compiled_slam(cfg, bacfg, lc)

    if init_pose is not None:
        state, ok0 = jit_init(jnp.asarray(left0), jnp.asarray(right0),
                              jnp.asarray(init_pose))
    else:
        state, ok0 = jit_init(jnp.asarray(left0), jnp.asarray(right0))
    if not bool(ok0):
        raise RuntimeError("Init 0-th frame failed! (depth frontend)")

    cap_pts = cfg.tracker.point_capacity
    store = create_store(map_capacity, cap_pts, cfg.camera.height, cfg.camera.width)
    kf0 = state.kf_track[0]
    store = insert_keyframe(store, kf0.pts, kf0.intensity, state.kf_pose, 0,
                            image=state.kf_pyr[0])

    # Host-side mirror of the store's proposal metadata (slot-aligned): the
    # loop proposal then costs ZERO device reads per keyframe. Poses go stale
    # after BA / pose-graph corrections; _refresh_view re-syncs them with the
    # single store.pose fetch those events need anyway.
    th, tw = store.thumb.shape[1:]
    view = dict(
        occupied=np.zeros(map_capacity, bool),
        frame_id=np.full(map_capacity, -1, np.int64),
        pos=np.zeros((map_capacity, 3), np.float32),
        path=np.zeros(map_capacity, np.float32),
        thumb=np.zeros((map_capacity, th, tw), np.float32),
    )
    inserts = 0

    def _view_insert(pose_np, fid, path, thumb_dev):
        nonlocal inserts
        slot = inserts % map_capacity
        view["occupied"][slot] = True
        view["frame_id"][slot] = fid
        view["pos"][slot] = pose_np[:3, 3]
        view["path"][slot] = path
        if view["thumb"].size:
            view["thumb"][slot] = np.asarray(thumb_dev)
        inserts += 1

    _view_insert(np.asarray(state.kf_pose), 0, 0.0, store.thumb[0])

    def _refresh_view_and_propagate(poses, frame_refs, store):
        """After a map correction (BA / loop closure): re-sync the host pose
        mirror and rewrite ALL emitted poses — each frame was recorded
        relative to its reference keyframe, so re-compose it from that
        keyframe's corrected pose. Frames whose keyframe was evicted from
        the ring keep their last value. One store.pose fetch total."""
        pose_np = np.asarray(store.pose)
        view["pos"] = pose_np[:, :3, 3].copy()
        occ, fid = view["occupied"], view["frame_id"]
        pose_of = {int(f): pose_np[s] for s, f in enumerate(fid) if occ[s]}
        for i, (kf_fid, rel) in enumerate(frame_refs):
            p = pose_of.get(kf_fid)
            if p is not None:
                poses[i] = p @ rel
        return pose_np

    poses = [np.asarray(state.cur_pose)]
    keyframe_ids = [0]
    # Per-frame (reference-keyframe frame_id, pose relative to it): the
    # ledger _propagate_corrections uses to push BA / loop-closure pose
    # corrections into the whole emitted trajectory, not just the live state.
    frame_refs = [(0, np.eye(4, dtype=np.float32))]
    path_len = 0.0
    failed_at = None
    ba_runs = 0
    loop_closures = 0
    kf_since_ba = 0
    t0 = time.perf_counter()
    for frame_id, (left, right) in enumerate(it, start=1):
        state, out = jit_step(state, jnp.asarray(left), jnp.asarray(right))
        summ = np.asarray(out.summary)  # one packed transfer (see StepOutput)
        cur_np = summ[:16].reshape(4, 4)
        kf_np = summ[16:32].reshape(4, 4)
        promoted = summ[32] > 0.5
        path_len += float(np.linalg.norm(cur_np[:3, 3] - poses[-1][:3, 3]))
        poses.append(cur_np)
        frame_refs.append(
            (frame_id if promoted else keyframe_ids[-1],
             np.linalg.inv(kf_np) @ cur_np)
        )
        if not summ[34] > 0.5 and failed_at is None:  # depth_ok
            failed_at = frame_id
            break
        if promoted:
            keyframe_ids.append(frame_id)
            kf = state.kf_track[0]
            new_slot = inserts % map_capacity
            store = jit_insert(store, kf.pts, kf.intensity, state.kf_pose, frame_id,
                               state.kf_pyr[0], path_len)
            _view_insert(kf_np, frame_id, path_len, store.thumb[new_slot])
            kf_since_ba += 1
            n_occ = min(inserts, map_capacity)
            if kf_since_ba >= ba_every and n_occ >= window:
                # One jitted dispatch: window select + BA solve + write-back.
                # Re-anchor the live state to the refined newest keyframe —
                # cur_pose too: at a promotion frame cur_pose == kf_pose, and
                # leaving the stale value would make the next frame's rel
                # motion absorb the whole correction jump (velocity spike).
                store, refined_kf_pose = jit_ba(store)
                state = dataclasses.replace(
                    state, kf_pose=refined_kf_pose, cur_pose=refined_kf_pose
                )
                _refresh_view_and_propagate(poses, frame_refs, store)
                ba_runs += 1
                kf_since_ba = 0
            if loop_closure:
                prop = propose_loop(store, lc, view=view)
                if prop is not None:
                    ci, ni = prop
                    ver = jit_verify(store, ci, ni)
                    if bool(ver.ok):
                        store = close_loop(store, ci, ni, ver.T_rel, lc)
                        pose_np = _refresh_view_and_propagate(
                            poses, frame_refs, store
                        )
                        newest_pose = jnp.asarray(pose_np[ni])
                        state = dataclasses.replace(
                            state, kf_pose=newest_pose, cur_pose=newest_pose
                        )
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
