"""Keyframe store: fixed-capacity ring buffer of keyframes as one pytree.

Completes what the reference only sketches: its ``KeyFrame`` (C7,
``include/keyframe.h``) holds images + depth + pose behind shared_ptrs, and
``GlobalMap`` (C8, ``include/global_map.h``) — a keyframe vector with a
cursor — does not even compile and is absent from the build
(``CMakeLists.txt:47-51``). Here the store is a struct-of-arrays pytree with
static shapes, so map maintenance lives inside jit and the whole window is
sharding-friendly (leading keyframe axis).

Each slot keeps the sparse level-0 representation that the backend needs
(points + inverse depth + intensities + pose), not full pyramids: windowed
photometric BA (mapping/ba.py) operates on exactly this data.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from odometry_tpu.kernels.points import PointSet


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KeyframeStore:
    """Ring buffer of K keyframes; arrays lead with the slot axis."""

    xs: jax.Array  # (K, cap) point pixel x
    ys: jax.Array  # (K, cap)
    inv_depth: jax.Array  # (K, cap)
    intensity: jax.Array  # (K, cap) keyframe image at the point
    point_valid: jax.Array  # (K, cap) bool
    image: jax.Array  # (K, H, W) level-0 keyframe image (BA sampling target)
    pose: jax.Array  # (K, 4, 4) cam-to-world
    frame_id: jax.Array  # (K,) int32 source frame index
    occupied: jax.Array  # (K,) bool slot in use
    head: jax.Array  # scalar int32: next slot to write (ring cursor)
    count: jax.Array  # scalar int32: total keyframes ever inserted
    # Appearance thumbnail (K, H//THUMB_FACTOR, W//THUMB_FACTOR): 16x16
    # mean-pooled, per-thumb standardized — the loop-closure proposal's
    # place-recognition descriptor (NCC match; mapping/loop_closure.py).
    thumb: jax.Array
    # Cumulative trajectory path length (m) at insertion: scales the loop
    # proposal radius / correction gates with accumulated drift potential.
    path: jax.Array  # (K,) float32


THUMB_FACTOR = 16


def thumbnail(image: jax.Array) -> jax.Array:
    """16x16 mean-pool + per-thumb standardization (zero mean, unit norm).

    A gain/bias-invariant appearance descriptor: NCC between two thumbnails
    is just their dot product. Trailing pixels that do not fill a whole pool
    cell are dropped (matches the selection grid's trailing-pixel quirk).
    """
    H, W = image.shape
    th, tw = H // THUMB_FACTOR, W // THUMB_FACTOR
    t = image[: th * THUMB_FACTOR, : tw * THUMB_FACTOR]
    t = t.reshape(th, THUMB_FACTOR, tw, THUMB_FACTOR).mean(axis=(1, 3))
    t = t - jnp.mean(t)
    return t / jnp.maximum(jnp.linalg.norm(t), 1e-6)


def create_store(
    capacity_kf: int, capacity_pts: int, height: int = 0, width: int = 0
) -> KeyframeStore:
    """Allocate an empty store. height/width size the per-slot image planes
    (pass 0x0 when the user of the store never samples images, e.g. pure
    pose-graph maintenance)."""
    K, P = capacity_kf, capacity_pts
    return KeyframeStore(
        xs=jnp.zeros((K, P), jnp.float32),
        ys=jnp.zeros((K, P), jnp.float32),
        inv_depth=jnp.zeros((K, P), jnp.float32),
        intensity=jnp.zeros((K, P), jnp.float32),
        point_valid=jnp.zeros((K, P), bool),
        image=jnp.zeros((K, height, width), jnp.float32),
        pose=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
        frame_id=jnp.full((K,), -1, jnp.int32),
        occupied=jnp.zeros((K,), bool),
        head=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
        thumb=jnp.zeros((K, height // THUMB_FACTOR, width // THUMB_FACTOR),
                        jnp.float32),
        path=jnp.zeros((K,), jnp.float32),
    )


def insert_keyframe(
    store: KeyframeStore,
    pts: PointSet,
    intensity: jax.Array,
    pose: jax.Array,
    frame_id: jax.Array,
    image: jax.Array | None = None,
    path: jax.Array | float = 0.0,
) -> KeyframeStore:
    """Write a keyframe at the ring head (oldest slot is evicted when full).

    Equivalent of ``GlobalMap::InsertKeyFrame`` (global_map.cpp:55-82) but
    jit-safe and bounded. `pts` capacity must equal the store's point
    capacity. `image` must match the store's (H, W) when given; stores
    created with 0x0 planes skip it (and keep empty thumbnails). `path` is
    the cumulative trajectory length (m) at this keyframe.
    """
    slot = store.head
    K = store.pose.shape[0]
    return KeyframeStore(
        xs=store.xs.at[slot].set(pts.xs),
        ys=store.ys.at[slot].set(pts.ys),
        inv_depth=store.inv_depth.at[slot].set(pts.inv_depth),
        intensity=store.intensity.at[slot].set(intensity),
        point_valid=store.point_valid.at[slot].set(pts.valid),
        image=(store.image if image is None else store.image.at[slot].set(image)),
        pose=store.pose.at[slot].set(pose),
        frame_id=store.frame_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
        occupied=store.occupied.at[slot].set(True),
        head=(slot + 1) % K,
        count=store.count + 1,
        thumb=(store.thumb if image is None or store.thumb.size == 0
               else store.thumb.at[slot].set(thumbnail(image))),
        path=store.path.at[slot].set(jnp.asarray(path, jnp.float32)),
    )


def maybe_insert_keyframe(
    store: KeyframeStore,
    do_insert: jax.Array,
    pts: PointSet,
    intensity: jax.Array,
    pose: jax.Array,
    frame_id: jax.Array,
    image: jax.Array | None = None,
    path: jax.Array | float = 0.0,
) -> KeyframeStore:
    """Conditionally insert (jit-safe select between updated and old store)."""
    inserted = insert_keyframe(store, pts, intensity, pose, frame_id, image, path)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_insert, a, b), inserted, store
    )


def window_slots(store: KeyframeStore, window: int) -> jax.Array:
    """Slot indices of the most recent `window` keyframes, newest last.

    Entries for not-yet-occupied slots repeat the oldest valid slot (callers
    mask with `occupied`).
    """
    K = store.pose.shape[0]
    newest = (store.head - 1) % K
    offs = jnp.arange(window - 1, -1, -1, dtype=jnp.int32)
    slots = (newest - offs) % K
    # Clamp: if fewer than `window` inserted, repeat the earliest one.
    n = jnp.minimum(store.count, K)
    earliest = (store.head - n) % K
    have = offs < n
    return jnp.where(have, slots, earliest)


def update_poses(store: KeyframeStore, slots: jax.Array, new_poses: jax.Array) -> KeyframeStore:
    """Write back BA-refined poses for the given slots (ModifyKeyFrame role)."""
    return dataclasses.replace(store, pose=store.pose.at[slots].set(new_poses))
