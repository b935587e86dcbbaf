"""Property tests for the SE(3) substrate (SURVEY.md §7.1 stage 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_svo_tpu.geometry import se3

RNG = np.random.default_rng(0)


def rand_twist(scale=1.0, n=()):
    return jnp.asarray(RNG.normal(size=n + (6,)) * scale, dtype=jnp.float32)


def test_exp_log_roundtrip():
    xi = rand_twist(0.5, (64,))
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_exp_zero_is_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(T, se3.identity(), atol=1e-7)


def test_exp_small_angle_stable():
    xi = rand_twist(1e-6, (8,))
    T = se3.exp(xi)
    assert np.all(np.isfinite(np.asarray(T)))
    np.testing.assert_allclose(se3.log(T), xi, atol=1e-7)


def test_rotation_orthonormal():
    T = se3.exp(rand_twist(2.0, (32,)))
    R = se3.rotation(T)
    I = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), I, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_compose_inverse():
    A = se3.exp(rand_twist(1.0, (16,)))
    B = se3.exp(rand_twist(1.0, (16,)))
    AB = se3.compose(A, B)
    back = se3.compose(AB, se3.inverse(B))
    np.testing.assert_allclose(back, A, atol=1e-5)


def test_transform_matches_compose():
    A = se3.exp(rand_twist(1.0, (8,)))
    B = se3.exp(rand_twist(1.0, (8,)))
    x = jnp.asarray(RNG.normal(size=(8, 3)), dtype=jnp.float32)
    lhs = se3.transform(se3.compose(A, B), x)
    rhs = se3.transform(A, se3.transform(B, x))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_retract_first_order():
    """d/deps [retract(T, eps*xi)] at eps=0 equals the twist action."""
    T = se3.exp(rand_twist(0.7))
    xi = rand_twist(1.0)
    x = jnp.asarray(RNG.normal(size=(3,)), dtype=jnp.float32)

    def f(eps):
        return se3.transform(se3.retract(T, eps * xi), x)

    g = jax.jacfwd(f)(0.0)
    expected = xi[:3] + jnp.cross(xi[3:], se3.transform(T, x))
    np.testing.assert_allclose(g, expected, atol=1e-4)


def test_adjoint_identity():
    """Ad_T relates twists: exp(Ad_T xi) = T exp(xi) T^-1."""
    T = se3.exp(rand_twist(0.8))
    xi = rand_twist(0.3)
    lhs = se3.exp(se3.adjoint(T) @ xi)
    rhs = se3.compose(se3.compose(T, se3.exp(xi)), se3.inverse(T))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_jit_compatible():
    f = jax.jit(lambda a, b: se3.log(se3.compose(se3.exp(a), se3.exp(b))))
    out = f(rand_twist(0.1), rand_twist(0.1))
    assert np.all(np.isfinite(np.asarray(out)))
