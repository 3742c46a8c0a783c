"""Pallas TPU kernels for the epipolar SSD search: fused cost volume + argmin.

The XLA path (kernels/disparity.py) materializes per-row-chunk cost volumes
to HBM (H*W*W floats stream out and back for the argmin) and is
bandwidth-bound. These kernels keep each row's cost matrix in VMEM: one
(8, W)^T @ (8, W) MXU contraction per row, masked, reduced to the per-pixel
best SSD + first-minimum index without ever leaving the chip.

Two variants:

* :func:`disparity_cost_argmin_pallas` — full-search cost matrix (Wp, Wp) per
  row, grid over row blocks (ROWS_PER_STEP rows per grid step; one grid step
  per row was measured 6x slower from grid overhead + repeated HBM loads).
* (banded fast path lives in the same kernel via masking; a finite
  max_disparity only changes the mask, not the compute shape.)

First-minimum tie-breaking matches the reference scan (strict `<` update,
``depth_estimate.cpp:385``): the index reduction takes the smallest candidate
column achieving the minimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odometry_tpu.utils.platform import pallas_interpret

_BIG = 1e10  # python literal: jnp constants would be captured tracers in the kernel
ROWS_PER_STEP = 4

# The kernel materializes (Wp, Wp) f32 intermediates (ssd / cross / index) in
# VMEM; at Wp=1280 (KITTI 1241) each is ~6.5 MB, near the ~16 MB ceiling.
# Wider inputs would fail to compile, so callers must fall back to the XLA
# backend above this bound (kernels/disparity.py does via pallas_width_ok).
MAX_SUPPORTED_WIDTH = 1280


def pallas_width_ok(width: int) -> bool:
    """True when the fused kernel's per-row cost matrix fits VMEM."""
    return -(-width // 128) * 128 <= MAX_SUPPORTED_WIDTH


def _kernel(pl_ref, pr_ref, ln_ref, rn_ref, best_ref, match_ref, rmatch_ref,
            *, R, Wp, boundary, max_disparity, min_disparity):
    xs = jax.lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0)  # left pixel x
    xr = jax.lax.broadcasted_iota(jnp.int32, (Wp, Wp), 1)  # right candidate
    ok = (xr >= boundary) & (xr < xs)
    if max_disparity is not None:
        ok = ok & (xs - xr <= max_disparity)
    if min_disparity is not None:
        ok = ok & (xs - xr >= min_disparity)

    for r in range(R):
        PLr = pl_ref[r]  # (8, Wp)
        PRr = pr_ref[r]
        cross = jax.lax.dot_general(
            PLr, PRr, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (Wp, Wp): ssd(x, xr) cross term for every pair
        ssd = ln_ref[r, 0][:, None] + rn_ref[r, 0][None, :] - 2.0 * cross
        ssd = jnp.where(ok, ssd, jnp.float32(_BIG))

        best = jnp.min(ssd, axis=1)  # (Wp,)
        # First minimum: smallest candidate index attaining the min.
        idx = jnp.where(ssd == best[:, None], xr, jnp.int32(2**30))
        match = jnp.min(idx, axis=1).astype(jnp.int32)
        best_ref[r, 0, :] = best
        match_ref[r, 0, :] = match

        # Reverse (right -> left) winners for the left-right check: smallest
        # x attaining the per-column minimum (matches argmin tie-breaking).
        rbest = jnp.min(ssd, axis=0)  # (Wp,)
        ridx = jnp.where(ssd == rbest[None, :], xs, jnp.int32(2**30))
        rmatch_ref[r, 0, :] = jnp.min(ridx, axis=0).astype(jnp.int32)


def disparity_cost_argmin_pallas(
    PL: jax.Array,  # (8, H, W) left pattern stack
    PR: jax.Array,
    ln: jax.Array,  # (H, W) pattern squared norms
    rn: jax.Array,
    *,
    boundary: int,
    max_disparity: int | None,
    min_disparity: int | None,
):
    """Return (best, match, rmatch), each (H, W) — XLA-path contract."""
    _, H, W = PL.shape
    if not pallas_width_ok(W):
        raise ValueError(
            f"width {W} > {MAX_SUPPORTED_WIDTH}: per-row (Wp, Wp) VMEM cost "
            "matrices would not fit; use the XLA disparity backend"
        )
    Wp = -(-W // 128) * 128
    pad_w = Wp - W
    R = ROWS_PER_STEP
    Hp = -(-H // R) * R
    pad_h = Hp - H
    # Lay out (H, 8, Wp); pad candidates with +inf-ish norms so they never win.
    PLp = jnp.pad(PL, ((0, 0), (0, pad_h), (0, pad_w))).transpose(1, 0, 2)
    PRp = jnp.pad(PR, ((0, 0), (0, pad_h), (0, pad_w))).transpose(1, 0, 2)
    # Singleton middle axis keeps every BlockSpec's trailing dims equal to the
    # array dims (Mosaic tiling requirement for 1-row blocks).
    lnp = jnp.pad(ln, ((0, pad_h), (0, pad_w)))[:, None, :]
    rnp = jnp.pad(rn, ((0, pad_h), (0, pad_w)), constant_values=1e10)[:, None, :]

    grid = (Hp // R,)
    kernel = functools.partial(
        _kernel, R=R, Wp=Wp, boundary=boundary,
        max_disparity=max_disparity, min_disparity=min_disparity,
    )
    best, match, rmatch = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, 8, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 1, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.int32),
        ],
        interpret=pallas_interpret(),
    )(PLp, PRp, lnp, rnp)
    return best[:H, 0, :W], match[:H, 0, :W], rmatch[:H, 0, :W]
