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


# The banded kernel materializes several (R=16, 128, S=P+128) f32 planes in
# VMEM (cross / ssd / index / reverse index): ~8 KB * S each. P=256 (the
# production KITTI band, max_disparity 192) measures ~12.6 MB total and
# compiles; P=512 was observed to exceed the 16 MB scoped-vmem budget on
# v5e (20.1 MB for a huge band). Callers must route wider bands to the
# full-search kernel or the XLA path.
MAX_BAND_P = 256


def band_fits_vmem(max_disparity: int) -> bool:
    """True when the banded kernel's per-step slab planes fit scoped VMEM."""
    return -(-max_disparity // 128) * 128 <= MAX_BAND_P


def _kernel(pl_ref, pr_ref, ln_ref, rn_ref, best_ref, match_ref, rmatch_ref,
            second_ref, *, R, Wp, boundary, max_disparity, min_disparity,
            with_second=False, second_excl=2):
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
        if with_second:
            near = jnp.abs(xr - match[:, None]) <= second_excl
            second_ref[r, 0, :] = jnp.min(
                jnp.where(near, jnp.float32(_BIG), ssd), axis=1
            )
        else:
            second_ref[r, 0, :] = jnp.full((Wp,), jnp.float32(_BIG))

        # Reverse (right -> left) winners for the left-right check: smallest
        # x attaining the per-column minimum (matches argmin tie-breaking).
        rbest = jnp.min(ssd, axis=0)  # (Wp,)
        ridx = jnp.where(ssd == rbest[None, :], xs, jnp.int32(2**30))
        rmatch_ref[r, 0, :] = jnp.min(ridx, axis=0).astype(jnp.int32)


def _band_kernel(*refs, R, NT, P, with_rev, with_second=False, second_excl=2):
    """Banded SSD + first-minimum winners for one (R rows, 128 query px) step.

    One fused pass produces BOTH directions of the left-right check:
    forward (per left pixel x: best SSD + first-minimum candidate j over the
    slab) and, when `with_rev`, per-slab-column reverse partial minima over
    the step's 128 queries (combined across overlapping steps by the caller —
    each candidate column is covered by up to NT query tiles).

    Query patterns: (R, K, 128) bf16 split-stacks (see :func:`_split3`).
    Candidate slab: NT=P/128+1 tiles concatenated to (R, K, S), S = P + 128,
    covering xr in [128t - P, 128t + 128); disparity d = i - j + P. The band
    constraint (min_d <= d <= max_d) depends only on (i, j), so it arrives as
    a precomputed additive {0, BIG} mask input instead of per-step
    iota+compare chains (measured: the masking passes, not the MXU work,
    dominate this kernel). The boundary/image-edge constraints are baked into
    the BIG-padded norm inputs by the caller.
    """
    pl_ref = refs[0]
    cand_refs = refs[1 : 1 + NT]
    ln_ref = refs[1 + NT]
    cn_refs = refs[2 + NT : 2 + 2 * NT]
    bm_ref = refs[2 + 2 * NT]
    out_refs = refs[3 + 2 * NT :]
    best_ref, match_ref = out_refs[0], out_refs[1]
    q = pl_ref[...]  # (R, K, 128)
    cand = jnp.concatenate([c[...] for c in cand_refs], axis=2)
    cn = jnp.concatenate([c[...] for c in cn_refs], axis=2)
    qn = ln_ref[...]  # (R, 1, 128)
    S = cand.shape[2]
    # One bf16 MXU pass with f32 accumulation. The K axis carries the 8-point
    # pattern x 9 exact-split product pairs (_split3), so every partial
    # product is exact and the result is f32-accurate — vs HIGHEST's 6-pass
    # decomposition of an already latency-bound K=8 matmul (~4x slower).
    cross = jax.lax.dot_general(
        q, cand, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (R, 128, S)
    # qn BIG-pads make padded queries lose every reverse min; cn BIG-pads
    # (pad region + boundary columns) make those candidates lose forward
    # mins; bm adds BIG outside the disparity band.
    # Same FP association as the XLA path (qn + cn - 2*cross) so accepted
    # winners agree bit-for-bit; the mask add comes last (BIG dwarfs any real
    # SSD, so masked lanes can never win a min).
    ssd = (qn.transpose(0, 2, 1) + cn - 2.0 * cross) + bm_ref[...][None]
    best = jnp.min(ssd, axis=2)  # (R, 128)
    j = jax.lax.broadcasted_iota(jnp.int32, (R, 128, S), 2)
    idx = jnp.where(ssd == best[:, :, None], j, jnp.int32(2**30))
    match = jnp.min(idx, axis=2).astype(jnp.int32)
    match_ref[...] = match
    best_ref[...] = best
    if with_second:
        # Runner-up outside +-second_excl of the winner (uniqueness test).
        sec_ref = out_refs[2 + 2 * int(with_rev)]
        near = jnp.abs(j - match[:, :, None]) <= second_excl
        sec_ref[...] = jnp.min(jnp.where(near, jnp.float32(_BIG), ssd), axis=2)
    if with_rev:
        rbest_ref, ridx_ref = out_refs[2], out_refs[3]
        rbest = jnp.min(ssd, axis=1)  # (R, S): per-candidate best over queries
        i = jax.lax.broadcasted_iota(jnp.int32, (R, 128, S), 1)
        ridx = jnp.where(ssd == rbest[:, None, :], i, jnp.int32(2**30))
        ridx = jnp.min(ridx, axis=1).astype(jnp.int32)
        rbest_ref[...] = rbest.reshape(R, NT, 128)
        ridx_ref[...] = ridx.reshape(R, NT, 128)


def _split3(x: jax.Array):
    """Split f32 into three EXACTLY-bf16-representable parts, x ~ hi+mid+lo.

    hi = bf16(x) is exact BY CONSTRUCTION (it is a bf16 value), so the split
    holds for any magnitude; then r1 = x - hi is exact in f32 (Sterbenz-style
    cancellation: hi and x agree in their leading bits), mid = bf16(r1),
    lo = bf16(r1 - mid). Products of any two parts are exact in the MXU's
    f32 accumulation; the only loss is the bf16 rounding of lo's own residual
    (relative ~2^-24, i.e. f32-class accuracy from a single bf16 pass).

    An earlier version used hi = round(x), whose exactness silently required
    |x| <= 256 — synthetic frames reach |x| ~ 470 after rendering, which
    corrupted SSDs by hundreds (the round-2 on-chip parity failure).
    """
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _split_stacks(Q: jax.Array, C: jax.Array):
    """(8,H,W) f32 pattern stacks -> (72,H,W) bf16 K-stacks whose single-pass
    contraction equals sum over the 3x3 exact-split product pairs."""
    qh, qm, ql = _split3(Q)
    ch, cm, cl = _split3(C)
    q72 = jnp.concatenate([qh, qm, ql, qh, qm, ql, qh, qm, ql], axis=0)
    c72 = jnp.concatenate([ch, ch, ch, cm, cm, cm, cl, cl, cl], axis=0)
    return q72, c72


def _band_pass(Q, C, qn, cn, *, P, boundary, min_disparity, max_disparity,
               with_rev, with_second=False, second_excl=2, R=16):
    """Single fused pass of the banded search. Q/C: (K, H, W) bf16 split
    K-stacks (from :func:`_split_stacks`) of the left/right images; qn/cn the
    f32 squared pattern norms. Returns (best, match[, rmatch]) as (H, W):
    best/match the forward (per-left-pixel) winner, rmatch the per-right-pixel
    reverse winner over the same in-band pair set (None unless `with_rev`)."""
    import numpy as np

    K, H, W = Q.shape
    Wp = -(-W // 128) * 128
    Hp = -(-H // R) * R
    NT = P // 128 + 1
    S = P + 128
    # Candidate (right) image padded so every slab is NT aligned 128-tiles:
    # slab for query tile t covers xr in [128t - P, 128t + 128) = padded
    # tiles t..t+NT-1.
    cpad = (P, Wp - W)
    Qp = jnp.pad(Q, ((0, 0), (0, Hp - H), (0, Wp - W))).transpose(1, 0, 2)
    Cp = jnp.pad(C, ((0, 0), (0, Hp - H), cpad)).transpose(1, 0, 2)
    # BIG-padded norms double as masks: padded queries lose reverse minima,
    # out-of-image and sub-boundary candidates lose forward minima
    # (xr >= boundary is the reference scan's lower bound,
    # depth_estimate.cpp:382).
    qnp = jnp.pad(qn, ((0, Hp - H), (0, Wp - W)), constant_values=_BIG)[:, None, :]
    xr_col = jnp.arange(W)[None, :]
    cn = jnp.where(xr_col < boundary, jnp.float32(_BIG), cn)
    cnp = jnp.pad(cn, ((0, Hp - H), cpad), constant_values=_BIG)[:, None, :]
    # Static band mask over (query lane i, slab column j): d = i - j + P.
    ii = np.arange(128)[:, None]
    jj = np.arange(S)[None, :]
    d = ii - jj + P
    bm = jnp.asarray(
        np.where((d >= min_disparity) & (d <= max_disparity), 0.0, _BIG),
        jnp.float32,
    )

    grid = (Hp // R, Wp // 128)
    kernel = functools.partial(_band_kernel, R=R, NT=NT, P=P, with_rev=with_rev,
                               with_second=with_second, second_excl=second_excl)
    cmaps = [lambda r, t, k=k: (r, 0, t + k) for k in range(NT)]
    out_specs = [
        pl.BlockSpec((R, 128), lambda r, t: (r, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 128), lambda r, t: (r, t), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
    ]
    if with_rev:
        out_specs += [
            pl.BlockSpec((R, NT, 128), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, NT, 128), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Hp, NT, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, NT, Wp), jnp.int32),
        ]
    if with_second:
        out_specs.append(
            pl.BlockSpec((R, 128), lambda r, t: (r, t), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Hp, Wp), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, K, 128), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((R, K, 128), m, memory_space=pltpu.VMEM) for m in cmaps],
            pl.BlockSpec((R, 1, 128), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((R, 1, 128), m, memory_space=pltpu.VMEM) for m in cmaps],
            pl.BlockSpec((128, S), lambda r, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=pallas_interpret(),
    )(Qp, *([Cp] * NT), qnp, *([cnp] * NT), bm)
    best, match_j = outs[0], outs[1]
    second = outs[-1][:H, :W] if with_second else None
    # Forward winner: slab column j at query column x maps to
    # xr = 128*(x//128) - P + j.
    xcol = jnp.arange(Wp)[None, :]
    match = (xcol // 128) * 128 - P + match_j
    if not with_rev:
        return best[:H, :W], match[:H, :W], None, second

    # Reverse combine. Step (r, t)'s partial k covers candidate tile
    # (t - (NT-1) + k), stored at [row, k, 128t + jj]; so for candidate
    # column xr the covering entries sit at [row, k, xr + 128*(NT-1-k)],
    # with query pixels xs = 128*(xr//128 + NT-1-k) + i. Combine smallest-xs
    # first (larger k), replacing only on strict improvement, to keep the
    # reference's first-minimum tie rule.
    rb_parts, ri_parts = outs[2], outs[3]
    rbest = jnp.full((Hp, Wp), jnp.float32(_BIG * 4))
    rmatch = jnp.zeros((Hp, Wp), jnp.int32)
    pad_cols = 128 * (NT - 1)
    rb_pad = jnp.pad(rb_parts, ((0, 0), (0, 0), (0, pad_cols)),
                     constant_values=_BIG * 4)
    ri_pad = jnp.pad(ri_parts, ((0, 0), (0, 0), (0, pad_cols)))
    for k in range(NT - 1, -1, -1):
        shift = 128 * (NT - 1 - k)
        bk = jax.lax.dynamic_slice_in_dim(rb_pad[:, k], shift, Wp, axis=1)
        ik = jax.lax.dynamic_slice_in_dim(ri_pad[:, k], shift, Wp, axis=1)
        xs_k = (xcol // 128) * 128 + shift + ik
        # Keep rmatch=0 for candidate columns with no unmasked pair, matching
        # the XLA backend's contract (its fully-masked columns argmin to 0):
        # masked partials sit near k*_BIG (k>=1) plus a real-valued qn-2*cross
        # term bounded by ~4e6 at image range ~500, while genuine SSDs are
        # <= 8*(2*max|I|)^2 ~ 8e6 << _BIG/2 — so _BIG/2 cleanly separates.
        # Such columns can never be reached via a matched forward winner, but
        # the cross-backend rmatch values must agree for future consumers.
        take = (bk < rbest) & (bk < jnp.float32(_BIG * 0.5))
        rbest = jnp.where(take, bk, rbest)
        rmatch = jnp.where(take, xs_k, rmatch)
    return best[:H, :W], match[:H, :W], rmatch[:H, :W], second


def disparity_band_pallas(
    PL: jax.Array,  # (8, H, W) left pattern stack
    PR: jax.Array,
    ln: jax.Array,
    rn: jax.Array,
    *,
    boundary: int,
    max_disparity: int,
    min_disparity: int | None,
    lr: bool,
    second_best: bool = False,
    second_excl: int = 2,
):
    """Banded search: only candidates within [min_disparity, max_disparity]
    are scored, as (128 query, P+128 candidate) MXU tiles along the band —
    ~5x less compute and VMEM-independent of the image width (no
    MAX_SUPPORTED_WIDTH limit). Returns (best, match, rmatch, second);
    rmatch is zeros when lr=False (one full reverse pass is only paid when
    the left-right check asked for it); second is the runner-up SSD outside
    +-second_excl of the winner (1e10 fill when second_best=False)."""
    min_d = 1 if min_disparity is None else max(1, min_disparity)
    P = -(-max_disparity // 128) * 128
    qf, cf = _split_stacks(PL, PR)
    best, match, rmatch, second = _band_pass(
        qf, cf, ln, rn, P=P, boundary=boundary,
        max_disparity=max_disparity, min_disparity=min_d, with_rev=lr,
        with_second=second_best, second_excl=second_excl,
    )
    if rmatch is None:
        rmatch = jnp.zeros_like(match)
    if second is None:
        second = jnp.full_like(best, _BIG)
    return best, match, rmatch, second


def disparity_cost_argmin_pallas(
    PL: jax.Array,  # (8, H, W) left pattern stack
    PR: jax.Array,
    ln: jax.Array,  # (H, W) pattern squared norms
    rn: jax.Array,
    *,
    boundary: int,
    max_disparity: int | None,
    min_disparity: int | None,
    second_best: bool = False,
    second_excl: int = 2,
):
    """Return (best, match, rmatch, second), each (H, W) — XLA-path contract."""
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
        with_second=second_best, second_excl=second_excl,
    )
    best, match, rmatch, second = pl.pallas_call(
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
            pl.BlockSpec((R, 1, Wp), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Hp, 1, Wp), jnp.float32),
        ],
        interpret=pallas_interpret(),
    )(PLp, PRp, lnp, rnp)
    return best[:H, 0, :W], match[:H, 0, :W], rmatch[:H, 0, :W], second[:H, 0, :W]
