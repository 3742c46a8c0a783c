"""Host-side sequence runner: IO + the jitted per-frame step.

Equivalent role to the reference's ``main()`` loop
(``run_odometry_kitti_offline.cpp:198-282``): feed frames, collect the
trajectory, stop on depth failure, export results. All compute lives in the
jitted :func:`odometry_tpu.pipeline.odometry.step`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.config import PipelineConfig
from odometry_tpu.pipeline.odometry import init, step, OdometryState, StepOutput


@dataclasses.dataclass
class RunResult:
    poses: np.ndarray  # (N, 4, 4) absolute predicted poses
    keyframe_ids: list  # frame indices promoted to keyframe (0 included)
    num_frames: int
    failed_at: Optional[int]  # frame index where depth failed, or None
    fps: float
    per_frame_ms: list


def run_sequence(
    frames: Iterable,
    cfg: PipelineConfig,
    init_pose: np.ndarray | None = None,
    stop_on_depth_failure: bool = True,
    progress: Callable[[int, StepOutput], None] | None = None,
) -> RunResult:
    """Run odometry over an iterable of (left, right) float32 image pairs.

    The first pair initializes the system (frame 0 pose = `init_pose` or
    identity, like the reference seeding with gt_poses[0], ``:96-98``).
    """
    it: Iterator = iter(frames)
    left0, right0 = next(it)
    pose0 = jnp.asarray(init_pose) if init_pose is not None else None

    jit_init = jax.jit(lambda l, r: init(l, r, cfg, pose0))
    jit_step = jax.jit(lambda s, l, r: step(s, l, r, cfg))

    state, ok0 = jit_init(jnp.asarray(left0), jnp.asarray(right0))
    if not bool(ok0):
        raise RuntimeError("Init 0-th frame failed! (depth frontend)")

    poses = [np.asarray(state.cur_pose)]
    keyframe_ids = [0]
    times = []
    failed_at = None
    frame_id = 0
    t_start = time.perf_counter()
    for frame_id, (left, right) in enumerate(it, start=1):
        t0 = time.perf_counter()
        state, out = jit_step(state, jnp.asarray(left), jnp.asarray(right))
        out_pose = np.asarray(out.cur_pose)  # blocks
        times.append((time.perf_counter() - t0) * 1e3)
        poses.append(out_pose)
        if bool(out.promoted):
            keyframe_ids.append(frame_id)
        if progress is not None:
            progress(frame_id, out)
        if not bool(out.depth_ok):
            failed_at = frame_id
            if stop_on_depth_failure:
                break
    total = time.perf_counter() - t_start
    n = len(poses)
    return RunResult(
        poses=np.stack(poses),
        keyframe_ids=keyframe_ids,
        num_frames=n,
        failed_at=failed_at,
        fps=(n - 1) / total if n > 1 else 0.0,
        per_frame_ms=times,
    )
