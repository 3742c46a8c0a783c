"""Robust weighting: none / Huber / t-distribution with fixed-point scale.

Reproduces ``lm_optimizer.cpp:249-261`` (weights) and ``ComputeScaleNaive``
(``lm_optimizer.cpp:338-358``) as masked tensor reductions under
``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_weights(r: jax.Array, delta: float, valid: jax.Array) -> jax.Array:
    """w_i = 1 if |r_i| <= delta else delta/|r_i| (lm_optimizer.cpp:254)."""
    a = jnp.abs(r)
    w = jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))
    return w * valid.astype(r.dtype)


def tdist_scale(
    r: jax.Array,
    valid: jax.Array,
    *,
    dof: float = 200.0,
    sigma_init: float = 5.0,
    tol: float = 1e-3,
    max_iters: int = 50,
) -> jax.Array:
    """Fixed-point scale iteration of the t-distribution M-estimator.

    ``ComputeScaleNaive`` (lm_optimizer.cpp:338-358): iterate
      sigma^2 <- mean_i [ r_i^2 (1+nu) / (nu + r_i^2 / sigma^2) ]
    until |sigma_new - sigma_old| < tol. A do-while in the reference; we add a
    max-iteration bound for jit safety (the reference can spin forever).
    """
    vf = valid.astype(r.dtype)
    n = jnp.maximum(jnp.sum(vf), 1.0)
    r2 = r * r * vf

    def cond(carry):
        sigma, prev, it = carry
        return (jnp.abs(sigma - prev) >= tol) & (it < max_iters)

    def body(carry):
        sigma, _, it = carry
        sigma_sq = sigma * sigma
        s = jnp.sum(r2 * (1.0 + dof) / (dof + r2 / sigma_sq))
        return jnp.sqrt(s / n), sigma, it + 1

    # Seed prev so the loop runs at least once (do-while semantics).
    sigma0 = jnp.asarray(sigma_init, r.dtype)
    sigma, _, _ = jax.lax.while_loop(cond, body, (sigma0, sigma0 + 1e9, 0))
    return sigma


def tdist_weights(
    r: jax.Array,
    valid: jax.Array,
    *,
    dof: float = 200.0,
    sigma_init: float = 5.0,
) -> jax.Array:
    """w_i = (nu+1) / (nu + r_i^2/sigma^2) (lm_optimizer.cpp:257-261)."""
    sigma = tdist_scale(r, valid, dof=dof, sigma_init=sigma_init)
    w = (dof + 1.0) / (dof + r * r / (sigma * sigma))
    return w * valid.astype(r.dtype)


def robust_weights(
    kind: str,
    r: jax.Array,
    valid: jax.Array,
    *,
    huber_delta: float = 28.0,
    tdist_dof: float = 200.0,
    tdist_sigma_init: float = 5.0,
) -> jax.Array:
    if kind == "none":
        return valid.astype(r.dtype)
    if kind == "huber":
        return huber_weights(r, huber_delta, valid)
    if kind == "tdist":
        return tdist_weights(r, valid, dof=tdist_dof, sigma_init=tdist_sigma_init)
    raise ValueError(f"unknown robust estimator {kind!r}")
