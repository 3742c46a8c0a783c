"""Image/depth pyramid ops as dense tensor math (replaces OpenCV usage).

Semantics match the reference exactly where it matters for trajectory parity:

* Gaussian 3x3 blur == ``cv::GaussianBlur(img, 3x3, sigma=0)`` which OpenCV
  resolves to the fixed separable kernel [1/4, 1/2, 1/4] with REFLECT_101
  borders (used at ``image_processing_global.cpp:30`` and
  ``depth_estimate.cpp:256-257``).
* ``pyr_down`` == ``cv::pyrDown``: separable [1,4,6,4,1]/16 blur with
  REFLECT_101 borders, then even-index decimation, output floor(n/2) as the
  reference forces via ``cv::Size(cols/2, rows/2)``
  (``image_processing_global.cpp:38,46``).
* The image pyramid's level 1 is built from the UNsmoothed input — a quirk of
  the reference (``image_processing_global.cpp:34-38``) that we reproduce.
* Depth pyramids decimate at odd indices with no averaging, preserving sparse
  validity (``image_processing_global.cpp:85-103``).

All functions are jit-safe with static shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAUSS3 = (0.25, 0.5, 0.25)
GAUSS5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _pyrdown_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) banded matrix: 5-tap Gaussian blur (REFLECT_101 borders)
    fused with even-index 2x decimation — one row per output sample.

    TPU note: expressing blur+decimate as a matmul keeps the work on the MXU;
    the strided-slice formulation forces lane relayouts that cost ~20x more
    than the arithmetic (measured on v5e).
    """
    A = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        c = 2 * o
        for j, t in enumerate(GAUSS5):
            idx = c + j - 2
            if idx < 0:
                idx = -idx  # BORDER_REFLECT_101
            elif idx >= n_in:
                idx = 2 * (n_in - 1) - idx
            A[o, idx] += t
    return A


@functools.lru_cache(maxsize=None)
def _decimate_matrix(n_in: int, n_out: int, offset: int) -> np.ndarray:
    """(n_out, n_in) one-hot selection of rows offset, offset+2, ... (exact)."""
    A = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        A[o, offset + 2 * o] = 1.0
    return A


def _reflect101_pad(img: jax.Array, r: int) -> jax.Array:
    """Pad by r on each side of both axes with OpenCV BORDER_REFLECT_101."""
    return jnp.pad(img, ((r, r), (r, r)), mode="reflect")


def _sep_conv(img: jax.Array, taps) -> jax.Array:
    """Separable 2D convolution with REFLECT_101 borders via shifted sums.

    Small odd tap counts only; XLA fuses the shifts+adds into one kernel.
    """
    r = len(taps) // 2
    h, w = img.shape
    p = _reflect101_pad(img, r)
    # Horizontal pass over rows [r : r+h) of the padded image.
    horiz = jnp.zeros((h + 2 * r, w), dtype=img.dtype)
    for i, t in enumerate(taps):
        horiz = horiz + jnp.float32(t) * jax.lax.dynamic_slice(p, (0, i), (h + 2 * r, w))
    out = jnp.zeros((h, w), dtype=img.dtype)
    for i, t in enumerate(taps):
        out = out + jnp.float32(t) * jax.lax.dynamic_slice(horiz, (i, 0), (h, w))
    return out


def gaussian_blur3(img: jax.Array) -> jax.Array:
    """cv::GaussianBlur(img, Size(3,3), 0) equivalent."""
    return _sep_conv(img, GAUSS3)


def pyr_down(img: jax.Array) -> jax.Array:
    """cv::pyrDown with forced floor(n/2) output size.

    On TPU: computed as Av @ img @ Ah^T with banded blur+decimate matrices
    (see :func:`_pyrdown_matrix`) — the strided-slice formulation forces lane
    relayouts that cost ~20x more than the arithmetic on v5e. HIGHEST
    precision keeps f32 exactness (default matmul precision runs f32 through
    bf16 passes, ~0.7 intensity levels of error).

    Off TPU the O(H^2 W + H W^2) matmuls are a large pessimization vs the
    O(k H W) separable conv + free strided slice, so CPU/GPU use that path
    (identical semantics; FP summation order differs in the last ulp).
    """
    from odometry_tpu.utils.platform import on_tpu

    h, w = img.shape
    oh, ow = h // 2, w // 2
    if not on_tpu():
        blurred = _sep_conv(img, GAUSS5)
        return blurred[: 2 * oh : 2, : 2 * ow : 2]
    Av = jnp.asarray(_pyrdown_matrix(h, oh))
    Ah = jnp.asarray(_pyrdown_matrix(w, ow))
    t = jax.lax.dot_general(
        Av, img, (((1,), (0,)), ((), ())), precision=_HIGHEST
    )
    return jax.lax.dot_general(
        t, Ah, (((1,), (1,)), ((), ())), precision=_HIGHEST
    )


def median_blur3(img: jax.Array) -> jax.Array:
    """3x3 median with REPLICATE borders (cv::medianBlur semantics)."""
    p = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    stack = jnp.stack(
        [p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)], axis=0
    )
    return jnp.median(stack, axis=0)


def gaussian_image_pyramid(
    img: jax.Array, num_levels: int, smooth: bool = True
) -> Tuple[jax.Array, ...]:
    """The reference's ``GaussianImagePyramidNaive``.

    level 0 = blur3(img) (or raw copy), level 1 = pyrDown(RAW img),
    level l>=2 = pyrDown(level l-1).
    """
    levels = [gaussian_blur3(img) if smooth else img]
    if num_levels > 1:
        levels.append(pyr_down(img))
    for _ in range(2, num_levels):
        levels.append(pyr_down(levels[-1]))
    return tuple(levels)


def depth_pyramid(
    dep: jax.Array, num_levels: int, smooth: bool = False, indexing: str = "odd"
) -> Tuple[jax.Array, ...]:
    """The reference's ``MedianDepthPyramidNaive``: decimation, no averaging.

    indexing="odd" reproduces the reference exactly (``out[l](y,x) =
    out[l-1](2y+1, 2x+1)``, image_processing_global.cpp:85-103). NOTE this is
    misaligned with the image pyramid, whose pyrDown samples EVEN indices: at
    level l the depth stored at pixel x belongs to image pixel x*2^l + 2^l - 1,
    a (2^l - 1)-pixel offset that degrades sparse-depth tracking at coarse
    levels. indexing="even" is the corrected aligned mode.
    """
    if indexing not in ("odd", "even"):
        raise ValueError(f"bad indexing mode {indexing!r}")
    from odometry_tpu.utils.platform import on_tpu

    off = 1 if indexing == "odd" else 0
    use_mm = on_tpu()
    levels = [median_blur3(dep) if smooth else dep]
    for _ in range(1, num_levels):
        prev = levels[-1]
        oh, ow = prev.shape[0] // 2, prev.shape[1] // 2
        if not use_mm:
            # Off-TPU a strided slice is free; the one-hot matmuls are not.
            levels.append(prev[off : off + 2 * oh : 2, off : off + 2 * ow : 2])
            continue
        # One-hot selection matmuls (exact); strided slices force lane
        # relayouts ~1 ms each on v5e at KITTI width.
        Sv = jnp.asarray(_decimate_matrix(prev.shape[0], oh, off))
        Sh = jnp.asarray(_decimate_matrix(prev.shape[1], ow, off))
        t = jax.lax.dot_general(
            Sv, prev, (((1,), (0,)), ((), ())), precision=_HIGHEST
        )
        levels.append(
            jax.lax.dot_general(t, Sh, (((1,), (1,)), ((), ())), precision=_HIGHEST)
        )
    return tuple(levels)


def central_gradients(img: jax.Array):
    """Clamped central-difference gradients over the whole image.

    Matches ``ComputePixelGradient`` (``image_processing_global.h:62-69``):
    neighbours are clamped to the image, so border pixels use a one-sided
    half-difference.
    """
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    left = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    down = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
    up = jnp.concatenate([img[:1, :], img[:-1, :]], axis=0)
    gx = 0.5 * (right - left)
    gy = 0.5 * (down - up)
    return gx, gy


def gradient_magnitude(img: jax.Array) -> jax.Array:
    gx, gy = central_gradients(img)
    return jnp.sqrt(gx * gx + gy * gy)
