"""Unit tests for pure-JAX SE(3)/SO(3) vs closed forms and scipy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odometry_tpu.geometry import (
    hat,
    vee,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_identity,
    se3_adjoint,
    transform_points,
    rotation_angles_xyz,
)


def random_twists(rng, n, scale=1.0):
    return rng.normal(size=(n, 6)).astype(np.float32) * scale


def test_hat_vee_roundtrip(rng):
    w = rng.normal(size=(5, 3)).astype(np.float32)
    W = hat(jnp.asarray(w))
    assert np.allclose(vee(W), w)
    # Skew-symmetry
    assert np.allclose(np.swapaxes(np.asarray(W), -1, -2), -np.asarray(W))


def test_so3_exp_is_rotation(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    R = so3_exp(w)
    RtR = jnp.einsum("nij,nik->njk", R, R)
    assert np.allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_so3_exp_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    w = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    assert np.allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    for scale in (1e-8, 1e-4, 0.5, 2.0, 3.0):
        w = rng.normal(size=(16, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * scale
        w_back = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
        assert np.allclose(w_back, w, atol=1e-4), scale


def test_so3_log_near_pi(rng):
    from scipy.spatial.transform import Rotation

    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = (axes * 3.14159).astype(np.float32)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(so3_log(jnp.asarray(R)))
    # log is defined up to sign of the axis at exactly pi; compare rotations.
    R_back = Rotation.from_rotvec(w_back).as_matrix()
    assert np.allclose(R_back, R, atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, 32, scale=0.8)
    T = se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3_log(T))
    assert np.allclose(xi_back, xi, atol=1e-4)


def test_se3_exp_small_angle_matches_first_order(rng):
    xi = random_twists(rng, 8, scale=1e-5)
    T = np.asarray(se3_exp(jnp.asarray(xi)))
    # First order: T ~ I + [[hat(w), v], [0, 0]]
    expected = np.broadcast_to(np.eye(4), (8, 4, 4)).copy()
    expected[:, :3, 3] += xi[:, :3]
    expected[:, :3, :3] += np.asarray(hat(jnp.asarray(xi[:, 3:])))
    assert np.allclose(T, expected, atol=1e-8)


def test_se3_inverse(rng):
    xi = random_twists(rng, 16)
    T = se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ se3_inverse(T))
    assert np.allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_se3_exp_composition_of_halves(rng):
    # exp(xi) == exp(xi/2) @ exp(xi/2) only along the same screw axis.
    xi = random_twists(rng, 16, scale=0.6)
    full = np.asarray(se3_exp(jnp.asarray(xi)))
    half = np.asarray(se3_exp(jnp.asarray(xi * 0.5)))
    assert np.allclose(half @ half, full, atol=1e-5)


def test_adjoint_property(rng):
    # Adj(T) xi  satisfies  T exp(xi) T^-1 = exp(Adj(T) xi)
    xi = random_twists(rng, 8, scale=0.3)
    T = se3_exp(jnp.asarray(random_twists(rng, 8, scale=0.5)))
    lhs = np.asarray(T @ se3_exp(jnp.asarray(xi)) @ se3_inverse(T))
    adj_xi = jnp.einsum("nij,nj->ni", se3_adjoint(T), jnp.asarray(xi))
    rhs = np.asarray(se3_exp(adj_xi))
    assert np.allclose(lhs, rhs, atol=1e-4)


def test_transform_points(rng):
    xi = random_twists(rng, 1)[0]
    T = se3_exp(jnp.asarray(xi))
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = transform_points(T, pts)
    hom = np.concatenate([np.asarray(pts), np.ones((10, 1), np.float32)], axis=1)
    expected = (np.asarray(T) @ hom.T).T[:, :3]
    assert np.allclose(np.asarray(out), expected, atol=1e-5)


def test_rotation_angles_pure_axes():
    # A rotation purely about X should report angleX = theta, others ~ 0.
    for axis in range(3):
        w = np.zeros(3, np.float32)
        w[axis] = 0.3
        R = so3_exp(jnp.asarray(w))
        angles = np.asarray(rotation_angles_xyz(R))
        assert np.allclose(angles[axis], 0.3, atol=1e-5)
        others = [a for i, a in enumerate(angles) if i != axis]
        assert np.allclose(others, 0.0, atol=1e-5)


def test_rotation_angles_match_sophus_formula(rng):
    # Cross-check against an independent nearest-SO2 projection via SVD,
    # which is exactly what Sophus::makeRotationMatrix does (so3.hpp:127-154).
    w = rng.normal(size=(8, 3)).astype(np.float32) * 0.5
    R = np.asarray(so3_exp(jnp.asarray(w)))
    ours = np.asarray(rotation_angles_xyz(jnp.asarray(R)))

    def nearest_so2_angle(M):
        U, _, Vt = np.linalg.svd(M)
        D = np.diag([1.0, np.linalg.det(U @ Vt)])
        Rf = U @ D @ Vt
        return np.arctan2(Rf[1, 0], Rf[0, 0])

    for i in range(8):
        Ri = R[i]
        ax = nearest_so2_angle(Ri[1:3, 1:3])
        ay = nearest_so2_angle(np.array([[Ri[0, 0], Ri[2, 0]], [Ri[0, 2], Ri[2, 2]]]))
        az = nearest_so2_angle(Ri[0:2, 0:2])
        assert np.allclose(ours[i], [ax, ay, az], atol=1e-5)


def test_jit_and_grad():
    xi = jnp.asarray(np.array([0.1, -0.2, 0.3, 0.02, -0.01, 0.03], np.float32))

    @jax.jit
    def loss(x):
        T = se3_exp(x)
        return jnp.sum(T[:3, 3] ** 2) + jnp.sum((T[:3, :3] - jnp.eye(3)) ** 2)

    g = jax.grad(loss)(xi)
    assert np.all(np.isfinite(np.asarray(g)))
    # Finite-difference check
    eps = 1e-3
    for i in range(6):
        e = np.zeros(6, np.float32)
        e[i] = eps
        fd = (loss(xi + e) - loss(xi - e)) / (2 * eps)
        assert np.allclose(g[i], fd, atol=1e-2)
