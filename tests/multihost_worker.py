"""Worker process for the two-process multihost smoke test.

Run as: python tests/multihost_worker.py <process_id> <port>

Each process owns ONE virtual CPU device and contributes one sequence to a
2-device global ``seq`` mesh; `initialize_multihost` wires the coordinator
(`odometry_tpu/distributed/scaling.py:44`) and `stack_local_frames` takes
the `make_array_from_process_local_data` multi-process path (`:92-93`).
The parent test asserts both processes print MULTIHOST_OK with a healthy
psum'd global status — proving the DCN-style path executes beyond a single
process, which the reference (single-thread C++,
``run_odometry_kitti_offline.cpp:3``) never had.
"""

import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from odometry_tpu.camera import Pinhole  # noqa: E402
from odometry_tpu.config import (  # noqa: E402
    CameraConfig, DepthConfig, KeyframeConfig, PipelineConfig, TrackerConfig,
)
from odometry_tpu.data.synthetic import make_scene, render_stereo  # noqa: E402
from odometry_tpu.distributed.scaling import (  # noqa: E402
    initialize_multihost, stack_local_frames,
)
from odometry_tpu.distributed.sweep import batched_init, batched_step  # noqa: E402

assert initialize_multihost(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
assert len(jax.local_devices()) == 1

H, W = 64, 96
cfg = PipelineConfig(
    camera=CameraConfig(fx=120.0, fy=120.0, cx=W / 2.0, cy=H / 2.0,
                        height=H, width=W),
    tracker=TrackerConfig(num_levels=2, max_iterations=(6, 6),
                          interp="bilinear", depth_decimation="even"),
    depth=DepthConfig(block_rows=4, block_cols=8, min_valid_points=1,
                      max_iters=6, interp="bilinear"),
    keyframe=KeyframeConfig(),
)
cam = Pinhole.create(120.0, 120.0, W / 2.0, H / 2.0)

mesh = Mesh(np.array(jax.devices()), ("seq",))
scene = make_scene(pid, depth=14.0)  # each process renders a DIFFERENT scene
left, right, _ = render_stereo(scene, cam, cfg.camera.baseline, jnp.eye(4), H, W)
left_b, right_b = stack_local_frames([(left, right)], mesh)
assert left_b.shape == (2, H, W)  # global batch assembled from local shards

states = batched_init(left_b, right_b, cfg, mesh)
new_states, outs, global_ok = batched_step(states, left_b, right_b, cfg, mesh)

# Same frame again => motion ~ 0 on this process's addressable shard.
local_t = np.asarray(
    [s.data for s in outs.pose_to_kf.addressable_shards][0])[:, :3, 3]
assert np.abs(local_t).max() < 0.1, local_t
print(f"MULTIHOST_OK pid={pid} global_ok={bool(global_ok)}", flush=True)
