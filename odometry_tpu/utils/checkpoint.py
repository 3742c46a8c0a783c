"""Checkpoint/resume for odometry state and trajectories.

The reference has no in-flight persistence (terminal pose txt + PNG dumps
only, ``run_odometry_kitti_offline.cpp:374-473``). Here any pytree — the
OdometryState, a KeyframeStore, pose arrays — round-trips through one .npz
file (flattened key paths + array leaves), so a crashed or preempted run
resumes mid-sequence.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree: Any) -> None:
    """Save any array pytree to one .npz (atomic rename)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {}
    for i, (keypath, leaf) in enumerate(leaves):
        payload[f"{i:05d}|{_path_key(keypath)}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree, using `like` for structure."""
    with np.load(path) as data:
        keys = sorted(data.files, key=lambda k: int(k.split("|")[0]))
        arrays = [data[k] for k in keys]
    treedef = jax.tree_util.tree_structure(like)
    expected = treedef.num_leaves
    if expected != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves but template expects {expected}"
        )
    like_leaves = jax.tree_util.tree_leaves(like)
    out = []
    for arr, tmpl in zip(arrays, like_leaves):
        if hasattr(tmpl, "shape") and tuple(tmpl.shape) != tuple(arr.shape):
            raise ValueError(f"shape mismatch: checkpoint {arr.shape} vs template {tmpl.shape}")
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)
