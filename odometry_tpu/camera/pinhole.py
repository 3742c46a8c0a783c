"""Pinhole camera model with per-level intrinsic pyramids, intrinsics-as-data.

Replaces the reference's ``CameraPyramid`` (``include/camera.h``,
``src/camera.cpp:49-66``) and fixes its hard-coded-constant debt
(``image_processing_global.h:33-51``, ``lm_optimizer.cpp:223-233``): here the
intrinsics always flow through as a pytree, so the same jitted kernels serve
any camera.

Level scaling follows the reference exactly (``camera.cpp:61-65`` and
``image_processing_global.h:22-28``):
    fx_l = fx / 2^l,  fy_l = fy / 2^l,  c_l = (c_{l-1} + 0.5) / 2 + 0.5...

Note the reference is internally inconsistent: ``camera.cpp:63-64`` applies the
(c+0.5)/2+0.5 recursion while the kernels' ``GetCxLevel`` uses the same
recursion but ``cx/2`` for fx. We reproduce GetCxLevel (what the shipped KITTI
path actually runs).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pinhole:
    """Intrinsics for a single pyramid level. All fields are scalar arrays."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def create(fx, fy, cx, cy) -> "Pinhole":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return Pinhole(f32(fx), f32(fy), f32(cx), f32(cy))


def level_intrinsics(cam: Pinhole, level: int) -> Pinhole:
    """Intrinsics at pyramid level `level` (static int).

    Reproduces ``GetCxLevel`` (``image_processing_global.h:22-28``) for the
    principal point and fx/2^l for focal lengths (``ReprojectToCameraFrame``,
    ``image_processing_global.h:35-36``).
    """
    cx, cy = cam.cx, cam.cy
    for _ in range(level):
        cx = (cx + 0.5) / 2.0 + 0.5
        cy = (cy + 0.5) / 2.0 + 0.5
    scale = jnp.float32(2.0**level)
    return Pinhole(cam.fx / scale, cam.fy / scale, cx, cy)


def intrinsic_pyramid(cam: Pinhole, num_levels: int) -> Tuple[Pinhole, ...]:
    return tuple(level_intrinsics(cam, l) for l in range(num_levels))


def backproject(cam: Pinhole, x: jax.Array, y: jax.Array, z: jax.Array):
    """Pixel coords + depth -> camera-frame 3D points.

    Vectorized ``ReprojectToCameraFrame`` (``image_processing_global.h:31-39``).
    x, y, z broadcast together; returns (X, Y, Z) with Z = z.
    """
    X = z * (x - cam.cx) / cam.fx
    Y = z * (y - cam.cy) / cam.fy
    return X, Y, z


def project(cam: Pinhole, X: jax.Array, Y: jax.Array, Z: jax.Array):
    """Camera-frame 3D -> pixel coords (u, v). Caller handles Z<=0 masking."""
    safe_z = jnp.where(Z == 0, 1.0, Z)
    u = cam.fx * X / safe_z + cam.cx
    v = cam.fy * Y / safe_z + cam.cy
    return u, v


def warp_points(cam: Pinhole, T: jax.Array, X, Y, Z, height: int, width: int):
    """Rigidly transform camera-frame points and project into the same camera.

    Vectorized ``WarpPixel`` (``image_processing_global.h:42-59``): returns
    (u, v, Zw, valid) where valid combines the z>0 check and the
    floor-in-bounds check of the reference.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Xw = R[..., 0, 0] * X + R[..., 0, 1] * Y + R[..., 0, 2] * Z + t[..., 0]
    Yw = R[..., 1, 0] * X + R[..., 1, 1] * Y + R[..., 1, 2] * Z + t[..., 1]
    Zw = R[..., 2, 0] * X + R[..., 2, 1] * Y + R[..., 2, 2] * Z + t[..., 2]
    u, v = project(cam, Xw, Yw, Zw)
    uf = jnp.floor(u)
    vf = jnp.floor(v)
    valid = (
        (Zw > 0.0)
        & (uf >= 0.0)
        & (vf >= 0.0)
        & (uf < jnp.float32(width))
        & (vf < jnp.float32(height))
    )
    return u, v, Zw, valid
