"""Geometry invariants for the Lorentz model ops.

Mirrors the reference's property-test strategy (tests/test_lorentz_model.py):
manifold constraint, projection validity, exp/log round-trip, distance axioms,
transport tangency — plus new coverage for the matmul pairwise kernel and the
real RSGD step (which the reference never implemented, SURVEY §2.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyptokenizer_tpu.ops import lorentz as L


@pytest.fixture
def points():
    key = jax.random.PRNGKey(42)
    return L.random_points(key, 32, 10, c=1.0, sigma=0.3)


def test_on_manifold(points):
    mdot = L.minkowski_dot(points, points)
    np.testing.assert_allclose(np.asarray(mdot), 1.0, atol=1e-5)


def test_projection_validity(rng):
    raw = jnp.asarray(rng.normal(size=(16, 11)), jnp.float32)
    proj = L.project_to_hyperboloid(raw, c=1.0)
    np.testing.assert_allclose(np.asarray(L.minkowski_dot(proj, proj)), 1.0, atol=1e-5)
    # Spatial coords untouched.
    np.testing.assert_allclose(np.asarray(proj[:, 1:]), np.asarray(raw[:, 1:]))


def test_exp_zero_is_identity(points):
    v = jnp.zeros_like(points)
    out = L.exp_map(points, v)
    # Reference clamps tangent norms to >= 1e-4; fp32 leaves ~1e-5 residue.
    np.testing.assert_allclose(np.asarray(out), np.asarray(points), atol=1e-5)


def test_log_exp_roundtrip(points):
    x = points[:16]
    y = points[16:]
    v = L.log_map(x, y)
    y2 = L.exp_map(x, v)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-4)


def test_distance_axioms(points):
    x, y = points[:16], points[16:]
    dxy = np.asarray(L.distance(x, y))
    dyx = np.asarray(L.distance(y, x))
    np.testing.assert_allclose(dxy, dyx, atol=1e-5)
    assert (dxy >= 0).all()
    # Identity: d(x, x) ~ 0 (acosh clamp floor gives ~1.4e-4).
    dxx = np.asarray(L.distance(x, x))
    assert (dxx < 1e-3).all()
    # Triangle inequality over sampled triples.
    z = jnp.roll(y, 1, axis=0)
    dxz = np.asarray(L.distance(x, z))
    dyz = np.asarray(L.distance(y, z))
    assert (dxz <= dxy + dyz + 1e-4).all()


def test_pairwise_matches_elementwise(points):
    x, y = points[:8], points[8:20]
    mat = np.asarray(L.pairwise_dist(x, y))
    for i in range(8):
        for j in range(12):
            d = float(L.distance(x[i], y[j]))
            assert abs(mat[i, j] - d) < 1e-4


def test_pairwise_minkowski_gram(points):
    x = points[:8]
    gram = np.asarray(L.pairwise_minkowski_dot(x, x))
    ref = np.asarray(L.minkowski_dot(x[:, None, :], x[None, :, :]))
    np.testing.assert_allclose(gram, ref, atol=1e-5)


def test_parallel_transport_tangency(points):
    x, y = points[:16], points[16:]
    v = L.log_map(x, y)
    v_t = L.parallel_transport(v, x, y)
    # Transported vector is tangent at y: <y, v_t>_L ~ 0.
    tang = np.asarray(L.minkowski_dot(y, v_t))
    np.testing.assert_allclose(tang, 0.0, atol=1e-3)


def test_tangent_project_is_tangent(points, rng):
    g = jnp.asarray(rng.normal(size=points.shape), jnp.float32)
    riem = L.tangent_project(points, g)
    # <x, g - <x,g> x>_L = <x,g> - <x,g><x,x> = 0 on the sheet.
    tang = np.asarray(L.minkowski_dot(points, riem))
    np.testing.assert_allclose(tang, 0.0, atol=1e-4)


def test_rsgd_step_stays_on_manifold(points, rng):
    g = jnp.asarray(rng.normal(size=points.shape), jnp.float32)
    out = L.rsgd_step(points, g, lr=0.1)
    np.testing.assert_allclose(np.asarray(L.minkowski_dot(out, out)), 1.0, atol=1e-4)
    # Zero grad => no movement.
    out0 = L.rsgd_step(points, jnp.zeros_like(points), lr=0.1)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(points), atol=1e-5)


def test_rsgd_descends(points):
    target = points[0]

    def loss(x):
        return jnp.sum(L.distance(x, jnp.broadcast_to(target, x.shape)) ** 2)

    x = points[16:]
    l0 = float(loss(x))
    for _ in range(20):
        g = jax.grad(loss)(x)
        x = L.rsgd_step(x, g, lr=0.05)
    assert float(loss(x)) < l0 * 0.5


def test_klein_conversion(points):
    k = np.asarray(L.lorentz_to_klein(points))
    assert (np.linalg.norm(k, axis=-1) < 1.0).all()


def test_jit_compatible(points):
    jd = jax.jit(L.pairwise_dist)
    np.testing.assert_allclose(
        np.asarray(jd(points, points)), np.asarray(L.pairwise_dist(points, points)),
        atol=1e-6,
    )
