"""Pallas TPU kernels for the epipolar SSD search: fused cost volume + argmin.

The XLA path (kernels/disparity.py) materializes per-row-chunk cost volumes
to HBM (H*W*W floats stream out and back for the argmin) and is
bandwidth-bound. These kernels keep the cost slab in VMEM and reduce it to
per-pixel winners without ever leaving the chip.

Two variants:

* :func:`disparity_band_pallas` — the PRODUCTION banded kernel (v2): scores
  only the [min_disparity, max_disparity] band as (128-query, S=P+128) MXU
  tiles. Squared-norm terms ride the contraction as extra K rows (K=78) so
  the masked SSD is one fused multiply-add, and forward/reverse winners come
  from single integer min-reductions over index-packed keys (low SSD
  mantissa bits replaced by the candidate index — see _JBITS/_IBITS).
  Measured 2.2x over the v1 mask/argmin-pass design; the in-graph custom
  call runs ~0.6 ms per KITTI depth run (PERF.md).
* :func:`disparity_cost_argmin_pallas` — full-search cost matrix (Wp, Wp)
  per row for unbounded searches, grid over row blocks (ROWS_PER_STEP rows
  per step; one grid step per row was measured 6x slower from grid overhead
  + repeated HBM loads).

First-minimum tie-breaking matches the reference scan (strict `<` update,
``depth_estimate.cpp:385``): the index reduction takes the smallest candidate
column achieving the minimum — in the banded kernel this falls out of the
packed key's low bits comparing ascending.
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


# Low-bit index packing (the v2 kernel's core trick): positive IEEE-754
# floats are order-isomorphic to their int32 bit patterns, so clearing the
# low JBITS mantissa bits of the SSD and OR-ing in the candidate index makes
# ONE integer min-reduction return (quantized-best SSD, first-minimum index)
# simultaneously — the reference's strict-< scan tie rule
# (depth_estimate.cpp:385) falls out of the low bits comparing ascending.
# Quantization: 2^JBITS ulps, relative 2^(JBITS-24) ~ 6e-5 at JBITS=9 —
# far inside the bf16-split's documented ~0.25-0.6 absolute SSD band.
_JBITS = 9   # slab column j in the forward key (S <= 512)
_IBITS = 7   # query lane i in the reverse key (128 queries per step)


def _band_kernel(*refs, R, NT, with_rev, with_second=False, second_excl=2):
    """Banded SSD + packed first-minimum winners, one (R, 128-query) step.

    v2 design (measured v1: ~7-11% of its bandwidth bound, dominated by VPU
    mask/equality/argmin passes — PERF.md):

    * The 6 squared-norm terms ride the MXU as extra K rows (K = 78:
      72 split-product rows + 3 rows of -0.5*split3(qn) against ones + 3
      ones-rows against -0.5*split3(cn)), so the full masked SSD is ONE
      fused multiply-add from the contraction: ssd = -2*cross_ext + bm.
      BIG-valued norm pads double as query/candidate validity masks.
    * Forward and reverse winners come from ONE integer min each over
      index-packed keys (see _JBITS/_IBITS above) instead of
      min + equality + select + min chains.
    * Per-candidate-tile loop writes a key scratch slab; reductions run on
      the full (R, 128, S) slab once.

    Outputs: best (R, 128) f32 (quantized), match (R, 128) int32 local slab
    column, rkey (R, NT, 128) int32 packed reverse partials (combined across
    overlapping steps by the caller), sec (R, 128) f32 when with_second.
    """
    q_ref = refs[0]
    cand_refs = refs[1 : 1 + NT]
    bm_ref = refs[1 + NT]
    out_refs = refs[2 + NT : -1]
    key_scratch = refs[-1]
    best_ref, match_ref = out_refs[0], out_refs[1]
    q = q_ref[...]  # (R, K, 128) bf16
    jmask = jnp.int32(2**_JBITS - 1)
    imask = jnp.int32(2**_IBITS - 1)
    for t in range(NT):
        # One bf16 MXU pass with f32 accumulation. The K axis carries the
        # 8-point pattern x 9 exact-split product pairs plus the norm rows
        # (_split_stacks), so every partial product is exact and the result
        # is f32-accurate from a single pass.
        cross = jax.lax.dot_general(
            q, cand_refs[t][...],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, 128, 128): ssd * -0.5 for this candidate tile
        ssd = cross * (-2.0) + bm_ref[:, t * 128 : (t + 1) * 128][None]
        kq = jax.lax.bitcast_convert_type(ssd, jnp.int32)
        jloc = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
        key_scratch[:, :, t * 128 : (t + 1) * 128] = (
            (kq & ~jmask) | (jloc + t * 128)
        )
    key = key_scratch[...]  # (R, 128, S)
    fmin = jnp.min(key, axis=2)  # (R, 128): (quantized ssd, first j)
    match = fmin & jmask
    match_ref[...] = match
    best_ref[...] = jax.lax.bitcast_convert_type(fmin & ~jmask, jnp.float32)
    if with_second:
        # Runner-up outside +-second_excl of the winner (uniqueness test).
        sec_ref = out_refs[2 + int(with_rev)]
        jall = key & jmask
        near = jnp.abs(jall - match[:, :, None]) <= second_excl
        sec = jnp.min(jnp.where(near, jnp.int32(2**30), key), axis=2)
        sec_ref[...] = jax.lax.bitcast_convert_type(sec & ~jmask, jnp.float32)
    if with_rev:
        rkey_ref = out_refs[2]
        i = jax.lax.broadcasted_iota(jnp.int32, (R, 128, key.shape[2]), 1)
        rkey = (key & ~jmask) | i  # (quantized ssd, query lane i)
        rmin = jnp.min(rkey, axis=1)  # (R, S)
        # (NT, R, 128) layout: NT leads so the BLOCK's trailing dims stay
        # tile-aligned — a (R, NT, 128) block (NT=3 in the sublane position)
        # was mis-read by consumers fused into the custom call's output
        # under jit (lane-127 entries came back wrong; eager was fine).
        rkey_ref[...] = rmin.reshape(R, NT, 128).transpose(1, 0, 2)


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

    The optimization barriers are LOAD-BEARING: XLA:TPU's fusion machinery
    cancels the f32 -> bf16 -> f32 round-trip when `hi` only feeds the
    subtraction, which silently degrades the split to a single bf16 value
    (hi = x, mid = lo = 0). Harmless-looking at image magnitudes (~0.6
    absolute on a ~500-range image), it corrupted the v2 kernel's norm rows
    (|qn| ~ 1e6) by thousands — found by the KITTI-size dense parity probe,
    invisible to interpret-mode CPU tests (CPU XLA keeps the casts).
    """
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r1 = x - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
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


def _split_stacks78(Q, C, qn, cn):
    """(8,Hq,Wq)/(8,Hc,Wc) f32 pattern stacks + (H,W) squared norms ->
    (78,·,·) bf16 K-stacks whose single contraction yields ssd * -0.5:

        cross_ext = cross + (-0.5 qn) * 1 + 1 * (-0.5 cn)
        =>  -2 * cross_ext = qn + cn - 2 cross = SSD.

    Rows 72-74 carry -0.5*split3(qn) against ones; rows 75-77 carry ones
    against -0.5*split3(cn). Each norm part is bf16-exact by construction
    (split3 then exact *-0.5 exponent shift), so the norm terms keep the
    same f32-class accuracy as the product rows — and BIG-valued norm pads
    ride along as validity masks.
    """
    q72, c72 = _split_stacks(Q, C)
    qnh, qnm, qnl = _split3(-0.5 * qn)
    cnh, cnm, cnl = _split3(-0.5 * cn)
    ones_q = jnp.ones((3,) + Q.shape[1:], jnp.bfloat16)
    ones_c = jnp.ones((3,) + C.shape[1:], jnp.bfloat16)
    q78 = jnp.concatenate([q72, jnp.stack([qnh, qnm, qnl]), ones_q], axis=0)
    c78 = jnp.concatenate([c72, ones_c, jnp.stack([cnh, cnm, cnl])], axis=0)
    return q78, c78


def _band_pass(PL, PR, qn, cn, *, P, boundary, min_disparity, max_disparity,
               with_rev, with_second=False, second_excl=2, R=16):
    """Single fused pass of the banded search. PL/PR: (8, H, W) f32 pattern
    stacks of the left/right images; qn/cn the f32 squared pattern norms.
    Returns (best, match[, rmatch], second) as (H, W): best/match the forward
    (per-left-pixel) winner, rmatch the per-right-pixel reverse winner over
    the same in-band pair set (None unless `with_rev`)."""
    import numpy as np

    _, H, W = PL.shape
    Wp = -(-W // 128) * 128
    Hp = -(-H // R) * R
    NT = P // 128 + 1
    S = P + 128
    # Candidate (right) image padded so every slab is NT aligned 128-tiles:
    # slab for query tile t covers xr in [128t - P, 128t + 128) = padded
    # tiles t..t+NT-1.
    cpad = (P, Wp - W)
    # BIG-valued norms double as masks (they ride the contraction's norm
    # rows, _split_stacks78): padded queries lose reverse minima,
    # out-of-image and sub-boundary candidates lose forward minima
    # (xr >= boundary is the reference scan's lower bound,
    # depth_estimate.cpp:382).
    qnp = jnp.pad(qn, ((0, Hp - H), (0, Wp - W)), constant_values=_BIG)
    xr_col = jnp.arange(W)[None, :]
    cn = jnp.where(xr_col < boundary, jnp.float32(_BIG), cn)
    cnp = jnp.pad(cn, ((0, Hp - H), cpad), constant_values=_BIG)
    PLp = jnp.pad(PL, ((0, 0), (0, Hp - H), (0, Wp - W)))
    PRp = jnp.pad(PR, ((0, 0), (0, Hp - H), cpad))
    q78, c78 = _split_stacks78(PLp, PRp, qnp, cnp)
    Qp = q78.transpose(1, 0, 2)  # (Hp, 78, Wp)
    Cp = c78.transpose(1, 0, 2)  # (Hp, 78, Wp + P)
    K = Qp.shape[1]
    # Static band mask over (query lane i, slab column j): d = i - j + P.
    ii = np.arange(128)[:, None]
    jj = np.arange(S)[None, :]
    d = ii - jj + P
    bm = jnp.asarray(
        np.where((d >= min_disparity) & (d <= max_disparity), 0.0, _BIG),
        jnp.float32,
    )

    grid = (Hp // R, Wp // 128)
    kernel = functools.partial(_band_kernel, R=R, NT=NT, with_rev=with_rev,
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
        out_specs.append(
            pl.BlockSpec((NT, R, 128), lambda r, t: (0, r, t), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((NT, Hp, Wp), jnp.int32))
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
            pl.BlockSpec((128, S), lambda r, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R, 128, S), jnp.int32)],
        interpret=pallas_interpret(),
    )(Qp, *([Cp] * NT), bm)
    best, match_j = outs[0], outs[1]
    second = outs[-1][:H, :W] if with_second else None
    # Forward winner: slab column j at query column x maps to
    # xr = 128*(x//128) - P + j.
    xcol = jnp.arange(Wp)[None, :]
    match = (xcol // 128) * 128 - P + match_j
    if not with_rev:
        return best[:H, :W], match[:H, :W], None, second

    # Reverse combine over the packed partials. Step (r, t)'s partial k
    # covers candidate tile (t - (NT-1) + k), stored at [row, k, 128t + jj];
    # so for candidate column xr the covering entries sit at
    # [row, k, xr + 128*(NT-1-k)], with query pixels
    # xs = 128*(xr//128 + NT-1-k) + i. Combine smallest-xs first (larger k),
    # replacing only on strict improvement OF THE SSD BITS (the packed i
    # bits are stripped for the comparison — parts differ in xs base, so an
    # i-bit comparison would corrupt the first-minimum tie rule).
    imask = 2**_IBITS - 1
    sep_bits = int(np.float32(_BIG * 0.5).view(np.int32))
    int_pad = 2**31 - 2**20  # > any packed key incl. BIG-masked ones
    rk_parts = outs[2]  # (NT, Hp, Wp) packed (quantized ssd | i)
    rbest_q = jnp.full((Hp, Wp), int_pad, jnp.int32)
    rmatch = jnp.zeros((Hp, Wp), jnp.int32)
    pad_cols = 128 * (NT - 1)
    rk_pad = jnp.pad(rk_parts, ((0, 0), (0, 0), (0, pad_cols)),
                     constant_values=int_pad)
    for k in range(NT - 1, -1, -1):
        shift = 128 * (NT - 1 - k)
        bk = jax.lax.dynamic_slice_in_dim(rk_pad[k], shift, Wp, axis=1)
        bq = bk & ~jnp.int32(imask)
        xs_k = (xcol // 128) * 128 + shift + (bk & imask)
        # Keep rmatch=0 for candidate columns with no unmasked pair, matching
        # the XLA backend's contract (its fully-masked columns argmin to 0):
        # masked partials carry >= ~1e10 - 1e7 in their ssd bits while
        # genuine SSDs are <= 8*(2*max|I|)^2 ~ 8e6 << _BIG/2 — so the bit
        # pattern of _BIG/2 cleanly separates (positive-float bit order).
        take = (bq < rbest_q) & (bq < sep_bits)
        rbest_q = jnp.where(take, bq, rbest_q)
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
    best, match, rmatch, second = _band_pass(
        PL, PR, ln, rn, P=P, boundary=boundary,
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
