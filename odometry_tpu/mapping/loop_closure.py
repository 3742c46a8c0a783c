"""Loop closure: proximity proposal -> photometric verification -> pose graph.

Completes the L5 backend the reference only sketched (``GlobalMap``,
``include/global_map.h:36-48`` keeps ``ModifyKeyFrame``/``ModifyPoseGraph``
hooks "for future global optimization" but nothing ever calls them, and the
class is absent from the build). The design here:

1. **Proposal** (host, numpy over the small keyframe ring): when a keyframe
   is inserted, earlier keyframes whose estimated position lies within
   `radius` meters — excluding the `min_separation` most recent ones, whose
   proximity is trivial — are loop candidates; the nearest wins.
2. **Verification** (jitted): a direct photometric LM solve of the candidate
   keyframe's point lanes against the new keyframe's level-0 image — the
   SAME solver the tracker uses (tracking/tracker.py ``_solve_level_points``)
   warm-started from the currently-estimated relative pose. Accepted only if
   it converges with enough valid reprojections and a final cost below
   `max_cost`; a wrong proposal (different place, same coordinates) fails the
   photometric check.
3. **Correction** (jitted): the verified relative pose becomes an extra edge
   in an SE(3) pose graph over the keyframe ring (odometry edges = current
   chain), solved by damped Gauss-Newton (mapping/pose_graph.py); refined
   poses are written back to the store and the live tracking state is
   re-anchored.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.camera.pinhole import Pinhole
from odometry_tpu.config import TrackerConfig
from odometry_tpu.geometry import se3_inverse
from odometry_tpu.kernels.points import PointSet
from odometry_tpu.mapping.keyframe import KeyframeStore
from odometry_tpu.mapping.pose_graph import PoseGraph, optimize_pose_graph
from odometry_tpu.tracking.tracker import KeyframeLevel, _solve_level_points


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    radius: float = 3.0  # proposal: max distance between keyframe positions (m)
    min_separation: int = 4  # proposal: skip this many most-recent keyframes
    max_iters: int = 40  # verification LM budget per pyramid level
    max_cost: float = 120.0  # verification: max final mean robust cost
    min_inliers: int = 200  # verification: min valid reprojected points
    # Consistency gate: the verified pose may differ from the proposal prior
    # only by a bounded correction (the accumulated drift). A photometric
    # solve that lands far from the prior means the proposal itself was wrong
    # (perceptual aliasing / bad association), not that the odometry drifted.
    max_correction_t: float = 1.0  # meters
    max_correction_r: float = 0.3  # radians (angle of the rotation correction)
    edge_weight: float = 1.0  # pose-graph information weight of a loop edge
    graph_iters: int = 10


class LoopVerification(NamedTuple):
    T_rel: jax.Array  # (4, 4) candidate-kf cam -> new-kf cam
    ok: jax.Array  # bool
    cost: jax.Array  # final photometric cost
    inliers: jax.Array  # int32 valid reprojections at the solution


def propose_loop(
    store: KeyframeStore, lc: LoopClosureConfig
) -> tuple[int, int] | None:
    """Nearest sufficiently-old keyframe within radius of the newest one.

    Returns (candidate_slot, newest_slot) or None. Host-side: the ring is
    small (tens of slots) and proposal runs once per keyframe insertion.
    """
    occ = np.asarray(store.occupied)
    fid = np.asarray(store.frame_id)
    pos = np.asarray(store.pose)[:, :3, 3]
    if occ.sum() < lc.min_separation + 2:
        return None
    order = np.argsort(fid)  # empty slots (fid=-1) sort first
    order = order[occ[order]]
    newest = order[-1]
    old = order[: -1 - lc.min_separation]
    if len(old) == 0:
        return None
    d = np.linalg.norm(pos[old] - pos[newest], axis=1)
    best = int(np.argmin(d))
    if d[best] > lc.radius:
        return None
    return int(old[best]), int(newest)


def verify_loop(
    store: KeyframeStore,
    cand_slot: jax.Array,
    new_slot: jax.Array,
    cam: Pinhole,
    tcfg: TrackerConfig,
    lc: LoopClosureConfig,
) -> LoopVerification:
    """Coarse-to-fine photometric solve: candidate keyframe points vs new
    keyframe image.

    Warm start is the relative pose implied by the current estimates,
    T_init = inv(T_new) @ T_cand (both cam-to-world) — i.e. the solve only
    needs to absorb the accumulated drift, which near a genuine loop closure
    is exactly the quantity being measured. Drift of tens of pixels at level
    0 is normal, so the solve runs coarse-to-fine like the tracker: both
    stored level-0 images are re-pyramided on the fly and the candidate's
    point lanes are rescaled per level (their 3D backprojection is
    level-invariant; only the pixel embedding changes).
    """
    from odometry_tpu.camera.pinhole import intrinsic_pyramid
    from odometry_tpu.image.pyramid import gaussian_image_pyramid
    from odometry_tpu.image.sampling import sample_bilinear

    pts = PointSet(
        xs=store.xs[cand_slot],
        ys=store.ys[cand_slot],
        inv_depth=store.inv_depth[cand_slot],
        valid=store.point_valid[cand_slot],
        num=jnp.sum(store.point_valid[cand_slot]).astype(jnp.int32),
    )
    T_init = se3_inverse(store.pose[new_slot]) @ store.pose[cand_slot]
    solve_cfg = dataclasses.replace(tcfg, step_tol=0.0)
    L = tcfg.num_levels
    cams = intrinsic_pyramid(cam, L)
    pyr_new = gaussian_image_pyramid(store.image[new_slot], L, smooth=True)
    pyr_cand = gaussian_image_pyramid(store.image[cand_slot], L, smooth=True)
    T = T_init
    failed = jnp.asarray(False)
    stats = None
    for l in range(L - 1, -1, -1):
        cam_l = cams[l]
        scale = cam_l.fx / cam.fx
        xs_l = cam_l.cx + (pts.xs - cam.cx) * scale
        ys_l = cam_l.cy + (pts.ys - cam.cy) * (cam_l.fy / cam.fy)
        pts_l = PointSet(xs_l, ys_l, pts.inv_depth, pts.valid, pts.num)
        inten_l = sample_bilinear(pyr_cand[l], xs_l, ys_l)
        T, failed_l, stats = _solve_level_points(
            KeyframeLevel(pts_l, inten_l), pyr_new[l], cam_l, T,
            lc.max_iters, solve_cfg,
        )
        failed = failed | failed_l

    # Inliers at the solution: valid points that reproject in-image with
    # positive depth (same predicate the residual kernel masks by).
    d = pts.inv_depth
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    Z0 = 1.0 / safe_d
    X = Z0 * (pts.xs - cam.cx) / cam.fx
    Y = Z0 * (pts.ys - cam.cy) / cam.fy
    P = jnp.stack([X, Y, Z0, jnp.ones_like(X)])
    Q = T @ P
    H, W = store.image.shape[1:]
    u = cam.fx * Q[0] / jnp.where(Q[2] == 0, 1.0, Q[2]) + cam.cx
    v = cam.fy * Q[1] / jnp.where(Q[2] == 0, 1.0, Q[2]) + cam.cy
    inl = (
        pts.valid
        & (Q[2] > 0)
        & (u >= 0)
        & (v >= 0)
        & (u < jnp.float32(W))
        & (v < jnp.float32(H))
    )
    inliers = jnp.sum(inl).astype(jnp.int32)
    # Correction-consistency gate (see LoopClosureConfig): the solved pose
    # must stay within the drift budget of the prior.
    C = T @ se3_inverse(T_init)
    dt = jnp.linalg.norm(C[:3, 3])
    cos_r = jnp.clip(0.5 * (jnp.trace(C[:3, :3]) - 1.0), -1.0, 1.0)
    dr = jnp.arccos(cos_r)
    ok = (
        (~failed)
        & (stats.err_final <= lc.max_cost)
        & (inliers >= lc.min_inliers)
        & (dt <= lc.max_correction_t)
        & (dr <= lc.max_correction_r)
    )
    return LoopVerification(T, ok, stats.err_final, inliers)


def close_loop(
    store: KeyframeStore,
    cand_slot: int,
    new_slot: int,
    T_rel: jax.Array,
    lc: LoopClosureConfig,
) -> KeyframeStore:
    """Pose-graph solve over the keyframe ring with one loop edge added.

    Nodes are the occupied slots in chronological order; odometry edges carry
    the CURRENT chain (so only the loop edge's inconsistency — the drift —
    is redistributed along it); the loop edge measurement between candidate
    node i and newest node j is Z = T_i^-1 T_j = inv(T_rel).
    """
    occ = np.asarray(store.occupied)
    fid = np.asarray(store.frame_id)
    order = np.argsort(fid)
    order = order[occ[order]]  # chronological occupied slots
    idx_of = {int(s): k for k, s in enumerate(order)}
    poses = store.pose[jnp.asarray(order)]

    n = len(order)
    ei = list(range(n - 1))
    ej = list(range(1, n))
    Z = [se3_inverse(poses[k]) @ poses[k + 1] for k in range(n - 1)]
    w = [1.0] * (n - 1)
    ei.append(idx_of[cand_slot])
    ej.append(idx_of[new_slot])
    Z.append(se3_inverse(T_rel))
    w.append(lc.edge_weight)

    graph = PoseGraph(
        poses=poses,
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_T=jnp.stack(Z),
        edge_weight=jnp.asarray(w, jnp.float32),
    )
    res = optimize_pose_graph(graph, iters=lc.graph_iters)
    return dataclasses.replace(
        store, pose=store.pose.at[jnp.asarray(order)].set(res.poses)
    )
