"""Dataset loaders against synthetic on-disk fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from odometry_tpu.data import kitti, tum
from odometry_tpu.data.middlebury import load_pair
from odometry_tpu.eval.export import save_kitti_poses, load_kitti_poses


def _mk_kitti(tmp_path, n=4, h=24, w=32):
    rng = np.random.default_rng(0)
    base = tmp_path / "dataset" / "sequences" / "00"
    (base / "image_0").mkdir(parents=True)
    (base / "image_1").mkdir(parents=True)
    (tmp_path / "poses").mkdir()
    imgs = []
    for i in range(n):
        a = (rng.random((h, w)) * 255).astype(np.uint8)
        b = (rng.random((h, w)) * 255).astype(np.uint8)
        Image.fromarray(a, "L").save(base / "image_0" / f"{i:06d}.png")
        Image.fromarray(b, "L").save(base / "image_1" / f"{i:06d}.png")
        imgs.append((a, b))
    poses = []
    with open(tmp_path / "poses" / "00.txt", "w") as f:
        for i in range(n):
            P = np.hstack([np.eye(3), [[i * 0.5], [0], [0]]]).astype(np.float32)
            poses.append(P)
            f.write(" ".join(str(v) for v in P.reshape(-1)) + "\n")
    with open(base / "calib.txt", "w") as f:
        f.write("P0: 700.0 0 16.0 0 0 700.0 12.0 0 0 0 1 0\n")
        f.write("P1: 700.0 0 16.0 -350.0 0 700.0 12.0 0 0 0 1 0\n")
    return imgs, np.stack(poses)


@pytest.mark.parametrize("use_native", [False, True])
def test_kitti_loader(tmp_path, use_native):
    imgs, poses = _mk_kitti(tmp_path)
    root = str(tmp_path)
    assert kitti.num_frames(root, "00") == 4
    frames = list(kitti.stereo_frames(root, "00", use_native=use_native))
    assert len(frames) == 4
    for (l, r), (a, b) in zip(frames, imgs):
        assert l.dtype == np.float32
        assert np.array_equal(l, a.astype(np.float32))
        assert np.array_equal(r, b.astype(np.float32))
    gt = kitti.load_poses(root, "00")
    assert gt.shape == (4, 3, 4)
    assert np.isclose(gt[2, 0, 3], 1.0)
    cam = kitti.load_calib(root, "00")
    assert cam.fx == 700.0
    assert np.isclose(cam.baseline, 0.5)
    assert cam.height == 24 and cam.width == 32


def test_kitti_pose_export_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, :3, 3] = rng.random((5, 3))
    path = str(tmp_path / "poses.txt")
    save_kitti_poses(path, poses)
    back = load_kitti_poses(path)
    assert np.allclose(back, poses[:, :3, :], atol=1e-5)


def test_tum_loader(tmp_path):
    rng = np.random.default_rng(2)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    lines = []
    for i in range(3):
        g = (rng.random((20, 24)) * 255).astype(np.uint8)
        d = (rng.random((20, 24)) * 5000 * 2).astype(np.uint16)
        Image.fromarray(g, "L").save(tmp_path / "rgb" / f"{i}.png")
        Image.fromarray(d, "I;16").save(tmp_path / "depth" / f"{i}.png")
        lines.append(f"{i}.0 rgb/{i}.png {i}.0 depth/{i}.png")
    (tmp_path / "associated.txt").write_text("\n".join(lines))
    (tmp_path / "groundtruth.txt").write_text(
        "# header\n0.0 0 0 0 0 0 0 1\n1.0 1 0 0 0 0 0 1\n"
    )
    frames = list(tum.rgbd_frames(str(tmp_path)))
    assert len(frames) == 3
    gray, inv = frames[0]
    assert gray.shape == (20, 24)
    # inverse depth: 1/(raw/5000), zeros stay zero
    assert inv.dtype == np.float32
    ts, gt = tum.load_groundtruth(str(tmp_path))
    assert gt.shape == (2, 4, 4)
    assert np.allclose(gt[1][:3, 3], [1, 0, 0])


def test_tum_associate_algorithm():
    # Classic associate.py: greedy nearest-timestamp matching, one use each,
    # bounded difference.
    ts_a = np.asarray([0.00, 1.00, 2.00, 3.00])
    ts_b = np.asarray([0.015, 0.018, 1.30, 2.005, 3.019])
    pairs = tum.associate(ts_a, ts_b, max_difference=0.02)
    # 0 -> 0.015 (closer than 0.018); 1 has no partner within 0.02 (1.30 is
    # 0.3 away); 2 -> 2.005; 3 -> 3.019.
    assert pairs == [(0, 0), (2, 3), (3, 4)]


def test_tum_builds_associations_without_file(tmp_path):
    rng = np.random.default_rng(4)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, dep_lines = ["# rgb"], ["# depth"]
    # rgb at t=i, depth jittered by +-8 ms; depth 1.5 has no rgb partner.
    for i in range(3):
        g = (rng.random((10, 12)) * 255).astype(np.uint8)
        d = (rng.random((10, 12)) * 5000).astype(np.uint16)
        Image.fromarray(g, "L").save(tmp_path / "rgb" / f"{i}.png")
        Image.fromarray(d, "I;16").save(tmp_path / "depth" / f"{i}.png")
        rgb_lines.append(f"{i}.000 rgb/{i}.png")
        dep_lines.append(f"{i}.008 depth/{i}.png")
    (tmp_path / "depth" / "x.png").write_bytes(
        (tmp_path / "depth" / "0.png").read_bytes()
    )
    dep_lines.append("1.500 depth/x.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    (tmp_path / "depth.txt").write_text("\n".join(dep_lines))
    assoc = tum.read_associations_full(str(tmp_path))
    assert len(assoc) == 3
    assert [a.gray_ts for a in assoc] == [0.0, 1.0, 2.0]
    assert all(abs(a.depth_ts - a.gray_ts - 0.008) < 1e-9 for a in assoc)


def test_tum_reference_12_column_format(tmp_path):
    # The reference's associated.txt carries GT inline
    # (test_optimizer.cpp:117-150): ts tx ty tz qx qy qz qw rgb_ts rgb d_ts d.
    rng = np.random.default_rng(5)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    lines = []
    for i in range(2):
        g = (rng.random((10, 12)) * 255).astype(np.uint8)
        d = (rng.random((10, 12)) * 5000).astype(np.uint16)
        Image.fromarray(g, "L").save(tmp_path / "rgb" / f"{i}.png")
        Image.fromarray(d, "I;16").save(tmp_path / "depth" / f"{i}.png")
        lines.append(
            f"{i}.0 {i * 0.5} 0 0 0 0 0 1 {i}.001 rgb/{i}.png {i}.002 depth/{i}.png"
        )
    (tmp_path / "associated.txt").write_text("\n".join(lines))
    assoc = tum.read_associations_full(str(tmp_path))
    assert len(assoc) == 2
    assert assoc[1].gt_pose is not None
    assert np.allclose(assoc[1].gt_pose[:3, 3], [0.5, 0, 0])
    assert assoc[1].gray_path.endswith("rgb/1.png")


def test_tum_associate_groundtruth():
    frame_ts = np.asarray([0.0, 1.0, 2.0])
    gt_ts = np.asarray([0.01, 1.5, 2.01])
    gt = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    gt[:, 0, 3] = [10.0, 20.0, 30.0]
    poses, matched = tum.associate_groundtruth(frame_ts, gt_ts, gt, max_difference=0.02)
    assert matched.tolist() == [True, False, True]
    assert poses[0, 0, 3] == 10.0
    assert poses[2, 0, 3] == 30.0
    assert np.allclose(poses[1], np.eye(4))


def test_middlebury_loader(tmp_path):
    rng = np.random.default_rng(3)
    a = (rng.random((16, 20)) * 255).astype(np.uint8)
    Image.fromarray(a, "L").save(tmp_path / "view1.png")
    Image.fromarray(a, "L").save(tmp_path / "view5.png")
    Image.fromarray((a // 4).astype(np.uint8), "L").save(tmp_path / "disp1.png")
    l, r, d = load_pair(str(tmp_path), disp_scale=2.0)
    assert l.shape == (16, 20)
    assert np.allclose(d, (a // 4) / 2.0)


def test_natural_scene_and_nuisance():
    """Third sweep family fixtures: ridged natural texture renders with
    calibrated local contrast; the photometric nuisance model is deterministic
    in (seed, frame, eye) and applies gain/bias/vignette/noise."""
    import numpy as np
    from odometry_tpu.camera import Pinhole
    from odometry_tpu.data.synthetic import (
        PhotometricNuisance, apply_nuisance, make_natural_scene, render_stereo,
    )

    import jax.numpy as jnp

    cam = Pinhole.create(120.0, 120.0, 48.0, 32.0)
    sc = make_natural_scene(3, depth=14.0)
    left, right, z = render_stereo(sc, cam, 0.54, jnp.eye(4), 64, 96)
    assert left.shape == (64, 96) and z.shape == (64, 96)
    assert 20.0 < float(jnp.std(left)) < 90.0  # usable gradient contrast

    nu = PhotometricNuisance(seed=5)
    a = apply_nuisance(np.asarray(left), 7, nu, eye=0)
    b = apply_nuisance(np.asarray(left), 7, nu, eye=0)
    c = apply_nuisance(np.asarray(left), 8, nu, eye=0)
    d = apply_nuisance(np.asarray(left), 7, nu, eye=1)
    assert np.array_equal(a, b)          # deterministic
    assert not np.array_equal(a, c)      # drift + noise vary per frame
    assert not np.array_equal(a, d)      # eyes differ (gain mismatch + noise)
    assert a.dtype == np.float32
    # Vignette darkens corners relative to centre on a flat-ish field.
    flat = np.full((64, 96), 128.0, np.float32)
    nv = PhotometricNuisance(seed=5, noise_sigma=0.0, gain_amp=0.0, bias_amp=0.0)
    out = apply_nuisance(flat, 0, nv, eye=0)
    assert out[0, 0] < out[32, 48]
