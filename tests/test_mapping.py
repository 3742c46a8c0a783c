"""Keyframe store, pose graph, and checkpoint tests."""

import numpy as np
import jax
import jax.numpy as jnp

from odometry_tpu.geometry import se3_exp, se3_inverse, se3_log
from odometry_tpu.kernels.points import PointSet
from odometry_tpu.mapping.keyframe import (
    create_store,
    insert_keyframe,
    maybe_insert_keyframe,
    window_slots,
    update_poses,
)
from odometry_tpu.mapping.pose_graph import (
    PoseGraph,
    odometry_edges,
    optimize_pose_graph,
    pose_graph_cost,
)
from odometry_tpu.utils.checkpoint import save_pytree, load_pytree


def _pts(seed, cap=16):
    rng = np.random.default_rng(seed)
    n = rng.integers(5, cap)
    valid = np.arange(cap) < n
    return PointSet(
        xs=jnp.asarray(rng.uniform(0, 100, cap).astype(np.float32)),
        ys=jnp.asarray(rng.uniform(0, 50, cap).astype(np.float32)),
        inv_depth=jnp.asarray(rng.uniform(0.05, 0.2, cap).astype(np.float32)),
        valid=jnp.asarray(valid),
        num=jnp.asarray(n, jnp.int32),
    )


def test_store_insert_and_ring_eviction():
    store = create_store(capacity_kf=3, capacity_pts=16)
    for k in range(5):
        pts = _pts(k)
        pose = se3_exp(jnp.asarray([k * 0.1, 0, 0, 0, 0, 0], jnp.float32))
        store = insert_keyframe(store, pts, pts.inv_depth * 0, pose, k)
    assert int(store.count) == 5
    assert bool(store.occupied.all())
    # Ring of 3: frames 2, 3, 4 survive.
    assert sorted(np.asarray(store.frame_id).tolist()) == [2, 3, 4]


def test_store_conditional_insert():
    store = create_store(capacity_kf=3, capacity_pts=16)
    pts = _pts(0)
    s1 = maybe_insert_keyframe(store, jnp.asarray(False), pts, pts.inv_depth, jnp.eye(4), 0)
    assert int(s1.count) == 0
    s2 = maybe_insert_keyframe(store, jnp.asarray(True), pts, pts.inv_depth, jnp.eye(4), 0)
    assert int(s2.count) == 1


def test_window_slots_order():
    store = create_store(capacity_kf=4, capacity_pts=16)
    for k in range(6):
        store = insert_keyframe(store, _pts(k), jnp.zeros(16), jnp.eye(4), k)
    slots = np.asarray(window_slots(store, 3))
    ids = np.asarray(store.frame_id)[slots]
    assert ids.tolist() == [3, 4, 5]  # oldest-first window of the newest 3


def test_update_poses():
    store = create_store(capacity_kf=4, capacity_pts=16)
    for k in range(4):
        store = insert_keyframe(store, _pts(k), jnp.zeros(16), jnp.eye(4), k)
    slots = window_slots(store, 2)
    new_poses = jnp.stack([se3_exp(jnp.asarray([0.5, 0, 0, 0, 0, 0]))] * 2)
    store2 = update_poses(store, slots, new_poses)
    assert np.allclose(np.asarray(store2.pose)[np.asarray(slots)][:, 0, 3], 0.5)


def test_pose_graph_loop_closure_distributes_drift():
    # A drifting straight-line trajectory + one loop-closure edge back to the
    # start must pull the chain toward consistency.
    N = 8
    rng = np.random.default_rng(0)
    gt = [np.eye(4, dtype=np.float32)]
    for k in range(N - 1):
        gt.append(gt[-1] @ np.asarray(se3_exp(jnp.asarray([1.0, 0, 0, 0, 0, 0], jnp.float32))))
    gt = np.stack(gt)
    # Odometry measurements corrupted by a consistent bias -> drift.
    noisy = [gt[0]]
    for k in range(N - 1):
        noise = se3_exp(jnp.asarray([0.05, 0.02, 0, 0, 0.004, 0], jnp.float32))
        meas = jnp.asarray(np.linalg.inv(gt[k]) @ gt[k + 1]) @ noise
        noisy.append(np.asarray(jnp.asarray(noisy[-1]) @ meas))
    noisy = np.stack(noisy)
    drift0 = np.linalg.norm(noisy[-1][:3, 3] - gt[-1][:3, 3])
    assert drift0 > 0.1

    i, j, Z, w = odometry_edges(jnp.asarray(noisy))
    # Replace odometry measurements with the (noisy) ones but add a perfect
    # loop edge 0 -> N-1.
    i = jnp.concatenate([i, jnp.asarray([0], jnp.int32)])
    j = jnp.concatenate([j, jnp.asarray([N - 1], jnp.int32)])
    loop_T = jnp.asarray(np.linalg.inv(gt[0]) @ gt[-1])[None]
    Z = jnp.concatenate([Z, loop_T])
    w = jnp.concatenate([w, jnp.asarray([20.0])])  # strong loop confidence

    graph = PoseGraph(jnp.asarray(noisy), i, j, Z, w)
    c0 = float(pose_graph_cost(graph))
    res = optimize_pose_graph(graph, iters=15)
    cN = float(res.cost_final)
    assert cN < c0
    drift1 = np.linalg.norm(np.asarray(res.poses)[-1][:3, 3] - gt[-1][:3, 3])
    assert drift1 < 0.3 * drift0, (drift0, drift1)


def test_pose_graph_jits():
    N = 5
    poses = jnp.stack([np.asarray(se3_exp(jnp.asarray([k * 1.0, 0, 0, 0, 0, 0], jnp.float32))) for k in range(N)])
    i, j, Z, w = odometry_edges(poses)
    graph = PoseGraph(poses, i, j, Z, w)
    res = jax.jit(lambda g: optimize_pose_graph(g, iters=3))(graph)
    # Consistent graph: nothing to fix.
    assert float(res.cost_final) < 1e-8


def test_checkpoint_roundtrip(tmp_path):
    store = create_store(capacity_kf=3, capacity_pts=16)
    store = insert_keyframe(store, _pts(1), jnp.ones(16), jnp.eye(4), 7)
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, store)
    restored = load_pytree(path, store)
    assert int(restored.count) == 1
    assert np.allclose(np.asarray(restored.intensity), np.asarray(store.intensity))
    leaves0 = jax.tree_util.tree_leaves(store)
    leaves1 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(leaves0, leaves1):
        assert np.array_equal(np.asarray(a), np.asarray(b))
