"""Blockwise adaptive gradient-threshold point selection.

Vectorizes the reference's selection pass (``depth_estimate.cpp:300-342``):
the image interior is tiled into a block_rows x block_cols grid; per block the
median gradient magnitude (via ``nth_element``) plus ``grad_th`` forms an
adaptive threshold, and at most ``max_points_per_block`` pixels above it are
kept **in row-major scan order** (the reference breaks out of its scan loop at
80). Scan-order capping becomes a per-block cumulative sum over the flattened
block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from odometry_tpu.image.pyramid import central_gradients


def select_points(
    img: jax.Array,
    *,
    boundary: int = 4,
    block_rows: int = 16,
    block_cols: int = 32,
    grad_th: float = 8.0,
    max_points_per_block: int = 80,
    min_points_per_block: int = 0,
) -> jax.Array:
    """Return a (H, W) bool mask of selected high-gradient pixels.

    `img` should already be 3x3-Gaussian-blurred (the reference blurs before
    selecting, ``depth_estimate.cpp:256``).

    `min_points_per_block` (beyond-reference, default 0 = exact reference
    semantics): on weak-texture blocks the reference's absolute `median +
    grad_th` offset can select nothing at all — a featureless-road frame
    collapses the whole frontend (measured: a low-frequency procedural scene
    selects 412 of 466k pixels and odometry diverges from the resulting
    clustered point set). With k > 0 every block additionally contributes its
    top-k pixels by gradient magnitude (requiring gradient > 1.0 so truly
    flat blocks stay empty) — the DSO pixel-selector's multi-threshold
    fallback, vectorized as a per-block rank threshold.
    """
    H, W = img.shape
    bh = (H - 2 * boundary) // block_rows
    bw = (W - 2 * boundary) // block_cols
    if bh < 1 or bw < 1:
        raise ValueError("image too small for the requested block grid")

    gx, gy = central_gradients(img)
    grad = jnp.sqrt(gx * gx + gy * gy)

    # The covered region starts at the boundary; trailing pixels that do not
    # fill a whole block are never selected (reference quirk: 16*23 x 32*38
    # covers [4,372)x[4,1220) of KITTI frames).
    region = jax.lax.dynamic_slice(
        grad, (boundary, boundary), (block_rows * bh, block_cols * bw)
    )
    blocks = region.reshape(block_rows, bh, block_cols, bw)
    blocks = blocks.transpose(0, 2, 1, 3).reshape(block_rows * block_cols, bh * bw)

    # nth_element(begin, begin + size/2, end) -> the (size//2)-th smallest
    # (depth_estimate.cpp:328-329).
    sorted_blocks = jnp.sort(blocks, axis=1)
    median = sorted_blocks[:, (bh * bw) // 2]
    th = median + jnp.float32(grad_th)

    above = blocks > th[:, None]
    if min_points_per_block > 0:
        k = min(min_points_per_block, bh * bw)
        kth = sorted_blocks[:, -k]  # k-th largest gradient per block
        fallback = (blocks >= kth[:, None]) & (blocks > 1.0)
        # `>= kth` admits every tie of the k-th largest: a near-uniform block
        # (equal gradients > 1) would otherwise contribute up to the whole
        # scan-order cap instead of k. Bound the fallback itself to its first
        # k hits in scan order.
        fallback = fallback & (
            jnp.cumsum(fallback.astype(jnp.int32), axis=1) <= k
        )
        above = above | fallback
    # Scan-order cap: keep only the first max_points_per_block hits per block.
    order = jnp.cumsum(above.astype(jnp.int32), axis=1)
    keep = above & (order <= max_points_per_block)

    keep_img = (
        keep.reshape(block_rows, block_cols, bh, bw)
        .transpose(0, 2, 1, 3)
        .reshape(block_rows * bh, block_cols * bw)
    )
    mask = jnp.zeros((H, W), dtype=bool)
    mask = jax.lax.dynamic_update_slice(mask, keep_img, (boundary, boundary))
    return mask


def block_median_map(
    values: jax.Array,
    mask: jax.Array,
    *,
    boundary: int = 4,
    block_rows: int = 16,
    block_cols: int = 32,
) -> jax.Array:
    """Masked per-block median of `values`, broadcast back to an (H, W) map.

    Uses the same selection-grid tiling as :func:`select_points`. Blocks with
    no masked pixel (and the uncovered boundary/trailing region) are +inf —
    callers treat non-finite as "no local evidence" and skip their check.
    Backs the depth frontend's local disparity-consistency filter
    (DepthConfig.block_consistency_tol): semi-dense stereo disparity is
    locally smooth at the ~23x39 px block scale, so a match far from its
    block's median matched disparity is an accidental (aliased) match even
    when its SSD, ratio and LR checks all passed.
    """
    H, W = values.shape
    bh = (H - 2 * boundary) // block_rows
    bw = (W - 2 * boundary) // block_cols
    if bh < 1 or bw < 1:
        raise ValueError("image too small for the requested block grid")
    sl = lambda a: jax.lax.dynamic_slice(
        a, (boundary, boundary), (block_rows * bh, block_cols * bw)
    )
    n = bh * bw
    blk = lambda a: (
        sl(a).reshape(block_rows, bh, block_cols, bw)
        .transpose(0, 2, 1, 3)
        .reshape(block_rows * block_cols, n)
    )
    v = blk(values)
    m = blk(mask)
    big = jnp.float32(jnp.inf)
    sv = jnp.sort(jnp.where(m, v, big), axis=1)
    count = jnp.sum(m, axis=1)
    med_idx = jnp.clip((count - 1) // 2, 0, n - 1)
    med = jnp.take_along_axis(sv, med_idx[:, None], axis=1)[:, 0]
    med = jnp.where(count > 0, med, big)

    med_img = jnp.broadcast_to(
        med.reshape(block_rows, block_cols)[:, None, :, None],
        (block_rows, bh, block_cols, bw),
    ).reshape(block_rows * bh, block_cols * bw)
    out = jnp.full((H, W), big, jnp.float32)
    return jax.lax.dynamic_update_slice(out, med_img, (boundary, boundary))
