import numpy as np
import jax.numpy as jnp
import pytest

from nudge_tpu import mathx as m


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_cross_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(m.cross(a, b), np.cross(a, b), atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, (64,))
    v = rng.normal(size=(64, 3)).astype(np.float32)
    R = np.asarray(m.quat_to_mat(q))
    np.testing.assert_allclose(
        m.quat_rotate(q, v), np.einsum("nij,nj->ni", R, v), atol=1e-5
    )


def test_quat_mul_composes_rotation():
    rng = np.random.default_rng(2)
    q1, q2 = rand_quat(rng, (16,)), rand_quat(rng, (16,))
    v = rng.normal(size=(16, 3)).astype(np.float32)
    lhs = m.quat_rotate(m.quat_mul(q1, q2), v)
    rhs = m.quat_rotate(q1, m.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_quat_rotate_inv_roundtrip():
    rng = np.random.default_rng(3)
    q = rand_quat(rng, (16,))
    v = rng.normal(size=(16, 3)).astype(np.float32)
    np.testing.assert_allclose(
        m.quat_rotate_inv(q, m.quat_rotate(q, v)), v, atol=1e-5
    )


def test_quat_integrate_small_step_matches_axis_angle():
    # ω about z for dt: should approximately equal axis-angle rotation
    q0 = m.quat_identity()
    omega = jnp.array([0.0, 0.0, 2.0])
    dt = 1e-3
    q = q0
    for _ in range(100):
        q = m.quat_integrate(q, omega, dt)
    expected = m.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.2)
    np.testing.assert_allclose(q, expected, atol=1e-3)


def test_quat_from_axis_angle_rotates():
    q = m.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 2)
    v = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(m.quat_rotate(q, v), [0.0, 1.0, 0.0], atol=1e-6)


def test_orthonormal_basis():
    rng = np.random.default_rng(4)
    n = np.asarray(m.normalize(rng.normal(size=(128, 3)).astype(np.float32)))
    t1, t2 = m.orthonormal_basis(n)
    np.testing.assert_allclose(m.dot(t1, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(t2, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(t1, t2), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.norm(t1), 1.0, atol=1e-5)
    np.testing.assert_allclose(m.norm(t2), 1.0, atol=1e-5)
    # right-handed: t1 × t2 = n
    np.testing.assert_allclose(m.cross(t1, t2), n, atol=1e-4)
