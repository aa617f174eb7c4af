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


def test_geodesic_point_equals_exp_log_composition():
    """geodesic_point == exp_map(x, w*log_map(x, y)) in the well-conditioned
    regime (the identity sinh((1-w)d)/sinh(d) = cosh(wd) - sinh(wd)coth(d)m
    made cancellation-free)."""
    key = jax.random.PRNGKey(5)
    x = L.random_points(key, 64, 12, sigma=0.3)
    y = L.random_points(jax.random.PRNGKey(6), 64, 12, sigma=0.3)
    for w in (0.0, 0.25, 0.5, 1.0):
        ref = L.exp_map(x, w * L.log_map(x, y))
        got = L.geodesic_point(x, y, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
    # Vector weights (merge_batch passes one w per row).
    wv = jax.random.uniform(jax.random.PRNGKey(7), (64,))
    ref = L.exp_map(x, wv[:, None] * L.log_map(x, y))
    got = L.geodesic_point(x, y, wv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_geodesic_point_stable_at_large_distance():
    """At merge distance ~11 the exp/log composition loses ~all fp32
    precision (y - cosh(d) x cancels catastrophically); geodesic_point must
    stay accurate against a float64 oracle."""
    rng = np.random.default_rng(0)
    d1 = 101
    # far-apart points (the regime the old formula corrupted)
    sp = rng.normal(0, 3.0, (16, d1 - 1))
    x64 = np.concatenate(
        [np.sqrt(1 + (sp ** 2).sum(-1, keepdims=True)), sp], -1)
    sp2 = rng.normal(0, 3.0, (16, d1 - 1))
    y64 = np.concatenate(
        [np.sqrt(1 + (sp2 ** 2).sum(-1, keepdims=True)), sp2], -1)

    def oracle(x, y, w):  # float64 geodesic
        m = x[:, 0] * y[:, 0] - (x[:, 1:] * y[:, 1:]).sum(-1)
        d = np.arccosh(np.maximum(m, 1 + 1e-12))
        num_x = np.sinh((1 - w) * d) / np.sinh(d)
        num_y = np.sinh(w * d) / np.sinh(d)
        return num_x[:, None] * x + num_y[:, None] * y

    ref = oracle(x64, y64, 0.5)
    d_check = np.arccosh(x64[:, 0] * y64[:, 0]
                         - (x64[:, 1:] * y64[:, 1:]).sum(-1))
    assert d_check.mean() > 7  # genuinely the ill-conditioned regime
    got = np.asarray(L.geodesic_point(jnp.asarray(x64, jnp.float32),
                                      jnp.asarray(y64, jnp.float32), 0.5))
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3)
    assert rel.max() < 1e-3, rel.max()
    # Sanity: midpoint is equidistant in the w=0.5 case.
    mid = np.asarray(L.project_to_hyperboloid(
        L.geodesic_point(jnp.asarray(x64, jnp.float32),
                         jnp.asarray(y64, jnp.float32), 0.5)))
    da = np.asarray(L.distance(jnp.asarray(mid), jnp.asarray(x64, jnp.float32)))
    db = np.asarray(L.distance(jnp.asarray(mid), jnp.asarray(y64, jnp.float32)))
    np.testing.assert_allclose(da, db, rtol=1e-3)
