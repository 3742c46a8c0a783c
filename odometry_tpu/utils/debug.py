"""Debug / sanitizer mode: checkify-instrumented pipeline entry points.

SURVEY §5's sanitizer subsystem (the reference relied on ad-hoc printf +
asserts in C++; the jitted pipeline's isfinite guards silently ABSORB NaNs
so a corrupted input or a numerically-dying kernel is invisible). This
module wraps the per-frame step in :mod:`jax.experimental.checkify` with
float (NaN/Inf) + index OOB + user checks, so a poisoned frame raises a
LOCALIZED error naming the failing check instead of degrading silently.

Usage::

    from odometry_tpu.utils.debug import checked_step
    step_fn = checked_step(cfg)           # jitted, instrumented
    err, (state, out) = step_fn(state, left, right)
    err.throw()                           # raises on NaN/OOB with location

The instrumented step is several times slower than the production step
(checkify materializes error state through every op) — it is a debugging
tool, not a production mode; `run_sequence(debug_checks=True)` threads it
through the standard runner for whole-sequence hunts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from odometry_tpu.config import PipelineConfig

# NaN/Inf + out-of-bounds index + explicit checkify.check calls.
CHECKS = checkify.float_checks | checkify.index_checks | checkify.user_checks


def _step_with_input_checks(state, left, right, cfg: PipelineConfig):
    from odometry_tpu.pipeline.odometry import step

    checkify.check(jnp.all(jnp.isfinite(left)), "non-finite LEFT input frame")
    checkify.check(jnp.all(jnp.isfinite(right)), "non-finite RIGHT input frame")
    new_state, out = step(state, left, right, cfg)
    checkify.check(
        jnp.all(jnp.isfinite(out.cur_pose)), "non-finite pose estimate"
    )
    return new_state, out


@functools.cache
def checked_step(cfg: PipelineConfig):
    """Jitted checkify-instrumented step: returns (err, (state, out))."""
    checked = checkify.checkify(
        lambda s, l, r: _step_with_input_checks(s, l, r, cfg), errors=CHECKS
    )
    return jax.jit(checked)


@functools.cache
def checked_init(cfg: PipelineConfig):
    """Jitted checkify-instrumented init: returns (err, (state, ok))."""
    from odometry_tpu.pipeline.odometry import init

    checked = checkify.checkify(lambda l, r: init(l, r, cfg), errors=CHECKS)
    return jax.jit(checked)


def debug_config(cfg: PipelineConfig) -> PipelineConfig:
    """A configuration variant suited to sanitizer hunts: identical math,
    but every frame pays the depth frontend (lazy-depth skips hide frontend
    NaNs on non-keyframes)."""
    import dataclasses

    return dataclasses.replace(cfg, depth_every_frame=True)
