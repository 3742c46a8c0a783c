"""Pallas TPU kernel for the epipolar SSD search: fused cost volume + argmin.

The XLA path (kernels/disparity.py) materializes per-row-chunk cost volumes
to HBM (H*W*W floats stream out and back for the argmin) and is
bandwidth-bound. This kernel keeps each (x-tile, candidate) cost block in
VMEM: one (TX, 8) @ (8, Wp) MXU contraction per grid step, masked, reduced to
the per-pixel best SSD + first-minimum index without ever leaving the chip.

Grid: (rows, x-tiles). Inputs are the pattern stacks laid out (H, 8, Wp) plus
per-pixel pattern norms (H, Wp); Wp is the lane-padded width.

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


def _kernel(pl_ref, pr_ref, ln_ref, rn_ref, best_ref, match_ref,
            rbest_ref, rmatch_ref, *, TX, Wp,
            boundary, max_disparity, min_disparity):
    tx = pl.program_id(1)
    # (8, TX) left patterns for this x-tile; (8, Wp) right patterns for the row.
    x0 = pl.multiple_of(tx * TX, TX)
    PLx = pl_ref[0, :, pl.ds(x0, TX)]  # (8, TX)
    PR = pr_ref[0, :, :]  # (8, Wp)
    ln = ln_ref[0, 0, pl.ds(x0, TX)]  # (TX,)
    rn = rn_ref[0, 0, :]  # (Wp,)

    cross = jax.lax.dot_general(
        PLx, PR, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TX, Wp)
    ssd = ln[:, None] + rn[None, :] - 2.0 * cross

    xs = x0 + jax.lax.broadcasted_iota(jnp.int32, (TX, Wp), 0)
    xr = jax.lax.broadcasted_iota(jnp.int32, (TX, Wp), 1)
    ok = (xr >= boundary) & (xr < xs)
    if max_disparity is not None:
        ok = ok & (xs - xr <= max_disparity)
    if min_disparity is not None:
        ok = ok & (xs - xr >= min_disparity)
    ssd = jnp.where(ok, ssd, jnp.float32(_BIG))

    best = jnp.min(ssd, axis=1)  # (TX,)
    # First minimum: smallest candidate index attaining the min.
    idx = jnp.where(ssd == best[:, None], xr, jnp.int32(2**30))
    match = jnp.min(idx, axis=1).astype(jnp.int32)
    best_ref[0, 0, :] = best
    match_ref[0, 0, :] = match

    # Reverse (right -> left) winners, accumulated across x-tiles for the
    # left-right consistency check. Ascending tile order + strict < keeps the
    # first (smallest-x) minimum, matching argmin tie-breaking.
    tile_rbest = jnp.min(ssd, axis=0)  # (Wp,)
    ridx = jnp.where(ssd == tile_rbest[None, :], xs, jnp.int32(2**30))
    tile_rmatch = jnp.min(ridx, axis=0).astype(jnp.int32)

    @pl.when(tx == 0)
    def _():
        rbest_ref[0, 0, :] = jnp.full((Wp,), _BIG, jnp.float32)
        rmatch_ref[0, 0, :] = jnp.zeros((Wp,), jnp.int32)

    prev_best = rbest_ref[0, 0, :]
    upd = tile_rbest < prev_best
    rbest_ref[0, 0, :] = jnp.where(upd, tile_rbest, prev_best)
    rmatch_ref[0, 0, :] = jnp.where(upd, tile_rmatch, rmatch_ref[0, 0, :])


def disparity_cost_argmin_pallas(
    PL: jax.Array,  # (8, H, W) left pattern stack
    PR: jax.Array,
    ln: jax.Array,  # (H, W) pattern squared norms
    rn: jax.Array,
    *,
    boundary: int,
    max_disparity: int | None,
    min_disparity: int | None,
    tile_x: int = 256,
):
    """Return (best, match, rmatch), each (H, W) — XLA-path contract."""
    _, H, W = PL.shape
    Wp = -(-W // 128) * 128
    TX = min(tile_x, Wp)
    pad_w = Wp - W
    # Lay out (H, 8, Wp); pad candidates with +inf-ish norms so they never win.
    PLp = jnp.pad(PL, ((0, 0), (0, 0), (0, pad_w))).transpose(1, 0, 2)
    PRp = jnp.pad(PR, ((0, 0), (0, 0), (0, pad_w))).transpose(1, 0, 2)
    # Singleton middle axis keeps every BlockSpec's trailing dims equal to the
    # array dims (Mosaic tiling requirement for 1-row blocks).
    lnp = jnp.pad(ln, ((0, 0), (0, pad_w)))[:, None, :]
    rnp = jnp.pad(rn, ((0, 0), (0, pad_w)), constant_values=1e10)[:, None, :]

    grid = (H, Wp // TX)
    kernel = functools.partial(
        _kernel, TX=TX, Wp=Wp, boundary=boundary,
        max_disparity=max_disparity, min_disparity=min_disparity,
    )
    best, match, rbest, rmatch = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, Wp), lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Wp), lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wp), lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wp), lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TX), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TX), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wp), lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wp), lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((H, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, Wp), jnp.int32),
        ],
        interpret=pallas_interpret(),
    )(PLp, PRp, lnp, rnp)
    return best[:, 0, :W], match[:, 0, :W], rmatch[:, 0, :W]
