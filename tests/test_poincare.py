"""Poincaré ball ops tests — coverage the reference lacks entirely (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.ops import poincare as P


@pytest.fixture
def ball_points(rng):
    v = jnp.asarray(rng.normal(size=(16, 10)) * 0.3, jnp.float32)
    return P.exp_map_zero(v)


def test_points_inside_ball(ball_points):
    norms = np.linalg.norm(np.asarray(ball_points), axis=-1)
    assert (norms < 1.0).all()


def test_exp_log_zero_roundtrip(rng):
    v = jnp.asarray(rng.normal(size=(16, 10)) * 0.3, jnp.float32)
    v2 = P.log_map_zero(P.exp_map_zero(v))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)


def test_exp_map_zero_of_zero(rng):
    z = jnp.zeros((4, 10), jnp.float32)
    np.testing.assert_array_equal(np.asarray(P.exp_map_zero(z)), 0.0)
    np.testing.assert_array_equal(np.asarray(P.log_map_zero(z)), 0.0)


def test_mobius_identity(ball_points):
    z = jnp.zeros_like(ball_points)
    np.testing.assert_allclose(
        np.asarray(P.mobius_addition(z, ball_points)), np.asarray(ball_points), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(P.mobius_addition(ball_points, z)), np.asarray(ball_points), atol=1e-6
    )


def test_mobius_inverse(ball_points):
    out = P.mobius_addition(-ball_points, ball_points)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_distance_symmetry(ball_points):
    x, y = ball_points[:8], ball_points[8:]
    np.testing.assert_allclose(
        np.asarray(P.distance(x, y)), np.asarray(P.distance(y, x)), atol=1e-5
    )


def test_model_conversion_roundtrip(ball_points):
    lor = P.poincare_to_lorentz(ball_points)
    np.testing.assert_allclose(np.asarray(L.minkowski_dot(lor, lor)), 1.0, atol=1e-4)
    back = P.lorentz_to_poincare(lor)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ball_points), atol=1e-5)


def test_distance_agrees_across_models(ball_points):
    """Ball distance == hyperboloid distance for converted points (c=1)."""
    x, y = ball_points[:8], ball_points[8:]
    d_ball = np.asarray(P.distance(x, y))
    d_lor = np.asarray(L.distance(P.poincare_to_lorentz(x), P.poincare_to_lorentz(y)))
    np.testing.assert_allclose(d_ball, d_lor, atol=1e-3)


def test_mobius_scalar_mul(ball_points):
    # 1 ⊗ x = x
    r = jnp.ones((16, 1), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(P.mobius_scalar_mul(r, ball_points)), np.asarray(ball_points),
        atol=1e-4,
    )
