"""TUM RGB-D sequence loader (sensor-depth tracking path).

Plays the role of the fixture loader in the reference's tracker test
(``test_optimizer.cpp:116-157``): reads an ``associated.txt`` of
(gray timestamp, gray path, depth timestamp, depth path[, pose]) tuples and
yields grayscale + metric-depth frames plus GT poses from
``groundtruth.txt``.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np

DEPTH_SCALE = 5000.0  # TUM convention: uint16 / 5000 = meters


def load_gray(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


def load_depth(path: str) -> np.ndarray:
    """uint16 depth PNG -> float32 meters (0 where invalid)."""
    from PIL import Image

    raw = np.asarray(Image.open(path), dtype=np.float32)
    return raw / DEPTH_SCALE


def read_associations(seq_dir: str, fname: str = "associated.txt") -> List[Tuple[str, str]]:
    """Return [(gray_path, depth_path), ...] from an association file."""
    out = []
    with open(os.path.join(seq_dir, fname)) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            out.append((os.path.join(seq_dir, parts[1]), os.path.join(seq_dir, parts[3])))
    return out


def rgbd_frames(
    seq_dir: str, count: int | None = None
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (gray float32, inverse_depth float32 with 0=invalid) frames."""
    pairs = read_associations(seq_dir)
    if count is not None:
        pairs = pairs[:count]
    for gray_path, depth_path in pairs:
        gray = load_gray(gray_path)
        depth = load_depth(depth_path)
        inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0).astype(np.float32)
        yield gray, inv


def load_groundtruth(seq_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """groundtruth.txt -> (timestamps (N,), poses (N, 4, 4)) from tx..qw rows."""
    ts, poses = [], []
    with open(os.path.join(seq_dir, "groundtruth.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) != 8:
                continue
            t, tx, ty, tz, qx, qy, qz, qw = vals
            R = _quat_to_mat(qx, qy, qz, qw)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = [tx, ty, tz]
            ts.append(t)
            poses.append(T)
    return np.asarray(ts), np.stack(poses)


def _quat_to_mat(qx, qy, qz, qw):
    q = np.asarray([qw, qx, qy, qz], np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
