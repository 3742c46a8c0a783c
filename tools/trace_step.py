"""Capture a device trace of the jitted odometry step and print the top HLO
ops by self-time (parsed from the xplane via xprof/tensorboard-plugin-profile).

Usage: python tools/trace_step.py [--depth]   (--depth traces compute_depth)
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import fast_config
from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo
from odometry_tpu.pipeline.odometry import init, step


def main():
    trace_depth = "--depth" in sys.argv
    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(8, step=0.35, seed=4)
    render = jax.jit(lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W))
    frames = [render(jnp.asarray(T))[:2] for T in poses]
    frames = [(jax.device_put(l), jax.device_put(r)) for l, r in frames]

    jit_init = jax.jit(lambda l, r: init(l, r, cfg))
    jit_step = jax.jit(lambda s, l, r: step(s, l, r, cfg))
    state, ok = jit_init(*frames[0])
    l1, r1 = frames[1]

    if trace_depth:
        from odometry_tpu.depth.estimator import compute_depth

        fn = jax.jit(lambda l, r: compute_depth(l, r, cfg.camera, cfg.depth))
        out = fn(l1, r1)
        jax.block_until_ready(out)

        def run():
            for _ in range(10):
                o = fn(l1, r1)
            jax.block_until_ready(o)
    else:
        s2, out = jit_step(state, l1, r1)
        jax.block_until_ready(out.cur_pose)

        def run():
            s = state
            for (l, r) in frames[1:] * 3:
                s, o = jit_step(s, l, r)
            jax.block_until_ready(o.cur_pose)

    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        run()

    # Parse the xplane -> op profile
    xplanes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert xplanes, "no xplane captured"
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    import gzip, csv, io

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -float(r.get("total_self_time_in_us", 0) or 0))
    total = sum(float(r.get("total_self_time_in_us", 0) or 0) for r in rows)
    print(f"total device self time: {total/1e3:.3f} ms  ({'depth' if trace_depth else 'step'} x{10 if trace_depth else 21})")
    print(f"{'self_ms':>9} {'pct':>6} {'#':>5}  op")
    for r in rows[:35]:
        t = float(r["total_self_time_in_us"]) / 1e3
        n = r.get("occurrences", "?")
        print(f"{t:9.3f} {100*t*1e3/total:6.1f} {n:>5}  {r['operation']}")


if __name__ == "__main__":
    main()
