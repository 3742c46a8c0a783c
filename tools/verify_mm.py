"""End-to-end verification of the matmul-sampler fast path on the real TPU.

Drives the public pipeline API (init/step via runner.run_sequence) with the
fast_config (mm sampling, spread extraction, matmul pyramids) at KITTI size,
checking per-claim invariants:
  1. trajectory accuracy vs exact synthetic GT (mte),
  2. pyramid parity: matmul pyr_down == cv2-semantics golden (f32 exact-ish),
  3. mm sampling edge probes: out-of-bounds warps masked, exact at f32,
  4. depth frontend health on keyframe promotion (survivor counts),
  5. parity config unchanged (floor/gather path still tracks).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from odometry_tpu.camera import Pinhole
from odometry_tpu.config import fast_config, kitti_config
from odometry_tpu.data.synthetic import make_scene, drive_trajectory, render_stereo
from odometry_tpu.eval.metrics import mean_translation_error
from odometry_tpu.pipeline.runner import run_sequence


def main():
    print("devices:", jax.devices())
    cfg = fast_config()
    H, W = cfg.camera.height, cfg.camera.width
    cam = Pinhole.create(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    scene = make_scene(3, depth=14.0)
    poses = drive_trajectory(25, step=0.35, seed=9)
    render = jax.jit(lambda T: render_stereo(scene, cam, cfg.camera.baseline, T, H, W))
    frames = [tuple(map(jax.device_put, render(jnp.asarray(T))[:2])) for T in poses]

    res = run_sequence(frames, cfg)
    mte = mean_translation_error(poses[: res.num_frames], res.poses)
    print(f"[fast/mm] frames={res.num_frames} keyframes={len(res.keyframe_ids)} "
          f"failed_at={res.failed_at} mte={mte:.4f} fps={res.fps:.1f}")
    assert res.failed_at is None
    assert mte < 0.10, mte
    assert len(res.keyframe_ids) >= 2  # depth frontend exercised on promotion

    # Parity config still healthy (floor sampling + gather path).
    cfgp = kitti_config()
    resp = run_sequence(frames[:10], cfgp)
    mtep = mean_translation_error(poses[:resp.num_frames], resp.poses)
    print(f"[parity]  frames={resp.num_frames} mte={mtep:.4f}")
    assert mtep < 0.15, mtep

    # mm sampler invariants ON TPU: f32 exact vs gather, OOB clip behaviour.
    from odometry_tpu.image.sampling import sample_bilinear, sample_channels_mm

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (64, 200), jnp.float32) * 255.0
    u = jnp.array([0.0, 199.0, 250.0, -3.0, 57.3], jnp.float32)
    v = jnp.array([0.0, 63.0, 70.0, -1.0, 31.9], jnp.float32)
    a = np.asarray(jax.jit(lambda: sample_bilinear(img, u, v))())
    b = np.asarray(jax.jit(
        lambda: sample_channels_mm(img[None], u, v, dtype=jnp.float32))())[0]
    print("mm vs gather (incl. OOB clips):", np.max(np.abs(a - b)))
    assert np.max(np.abs(a - b)) < 1e-3

    # Pyramid parity on TPU (matmul vs shifted-add golden at f32).
    from odometry_tpu.image.pyramid import pyr_down, _sep_conv, GAUSS5

    big = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    golden = np.asarray(jax.jit(lambda x: _sep_conv(x, GAUSS5))(big))[0:2 * (H // 2):2,
                                                                     0:2 * (W // 2):2]
    got = np.asarray(jax.jit(pyr_down)(big))
    print("pyr_down matmul vs golden:", np.max(np.abs(golden - got)))
    assert np.max(np.abs(golden - got)) < 1e-2

    print("VERIFY OK")


if __name__ == "__main__":
    main()
