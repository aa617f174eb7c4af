"""Lorentz (hyperboloid) model operations.

TPU-native re-implementation of the reference geometry kernel library
(``embedding/lorentz_model.py:14-244``). All functions are pure ``jnp`` and safe
under ``jax.jit`` / ``vmap`` / ``pjit``; shapes are batch-first with the manifold
coordinate last: ``(..., d+1)`` where index 0 is the time-like coordinate.

Conventions:
  * ``<x,y>_L = x0*y0 - sum_i x_i y_i`` (the reference's sign convention:
    positive on the sheet, ``<x,x>_L = 1``; for distinct on-sheet points
    ``<x,y>_L = cosh(d) > 1``),
  * clamp ``<x,y>_L`` to ``>= 1 + 1e-8`` before ``acosh``,
  * clamp squared tangent norms to ``>= 1e-8``,
  * log-map coefficient capped at ``1e4`` with NaN masking,
  * exp-map zero-direction mask at ``v_norm < 1e-6``.

IMPORTANT — documented deviations from the reference implementation
(see DEVIATIONS.md). The reference's geometry is internally inconsistent and
fails its own unit tests (4/7 of tests/test_lorentz_model.py fail when run):
it negates the Minkowski dot before ``acosh`` (lorentz_model.py:108,134,169)
even though its own convention makes the dot *positive* on the sheet, so its
``distance`` returns exactly 0 for every pair of on-manifold points (verified
by running the reference code), its ``log_map`` coefficient always degenerates
to 1 through the NaN mask (:116-117), and ``parallel_transport`` /
``riemannian_gradient`` carry matching sign errors (their tangency tests fail).
This module implements the *intended* standard hyperbolic geometry — the
semantics the reference's test suite (tests/test_lorentz_model.py:123-169)
specifies — expressed in the reference's sign convention:

  distance(x, y)  = acosh(max(<x,y>_L, 1+eps)) / sqrt(c)
  log_map(x, y)   = coef * (y - <x,y>_L * x),  coef = acosh(m)/sqrt(m^2-1)
  exp_map(x, v)   uses the Minkowski tangent norm sqrt(-<v,v>_L)
                  (== the reference's spatial norm for tangents at the origin,
                  which is the only place the reference evaluates it on-path)
  transport(v)    = v - <y,v>_L/(1+<x,y>_L) * (x+y)
  tangent_project = g - <x,g>_L * x

Beyond the reference surface, this module adds:
  * ``pairwise_dist`` — an MXU-friendly matmul formulation of the (B1, B2)
    distance matrix (the reference broadcasts (B1, 1, d+1) x (1, B2, d+1),
    lorentz_model.py:141-178, which XLA would materialise; here the Minkowski
    Gram matrix is a single ``dot_general`` with a sign flip on the time axis),
  * ``rsgd_step`` — a *real* Riemannian SGD update (Euclidean grad -> tangent
    projection -> exp-map retraction -> re-projection). The reference declares
    RSGD (tokenizer/hyperbolic_merge.py:123) but never implements it (SURVEY §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --- stability constants (reference embedding/lorentz_model.py) ---
EPS_NORM = 1e-8          # min squared-norm clamp            (:85, :38)
ACOSH_EPS = 1e-8         # -<x,y> clamped to >= 1 + ACOSH_EPS (:109, :135, :172)
LOG_COEF_MAX = 1e4       # log-map coefficient cap            (:113)
EXP_ZERO_TOL = 1e-6      # exp-map degenerate-direction mask  (:89)

# Contraction precision for every inner product in this module. On TPU, XLA
# rewrites an elementwise mul+reduce into an MXU dot at DEFAULT precision —
# a single bf16 pass with ~2^-9 relative error (measured 2.9e-3 absolute on
# d=100 grams, tools/diag_midpoint.py). acosh(xy) near xy=1 needs absolute
# gram error << xy-1, so short distances lose ALL resolution at default
# precision. HIGHEST restores exact-f32-level grams (1.8e-6 vs float64 truth)
# and measures 0% slower at the framework's bandwidth-bound shapes (k=128;
# tools/diag_precision.py).
DOT_PREC = jax.lax.Precision.HIGHEST


def acosh(x: jax.Array) -> jax.Array:
    """``acosh`` for ``x >= 1`` as ``log(x + sqrt(x^2 - 1))``.

    The same evaluation the Pallas kernels use (Mosaic has no acosh
    primitive; ops/pallas/merge_loop._acosh) — sharing the formula keeps the
    XLA and kernel paths within 1 ulp of each other (log/sqrt lower
    bitwise-identically either side, tools/diag_midpoint.py). Same gradient
    as ``jnp.arccosh`` (1/sqrt(x^2-1)).
    """
    return jnp.log(x + jnp.sqrt(x * x - 1.0))


def _signature(d1: int, dtype) -> jax.Array:
    """Metric signature ``(+1, -1, ..., -1)`` of length ``d1``."""
    return jnp.concatenate(
        [jnp.ones((1,), dtype), -jnp.ones((d1 - 1,), dtype)])


def minkowski_dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Minkowski inner product ``x0*y0 - <x_s, y_s>`` over the last axis.

    Parity: reference lorentz_model.py:14-25. Evaluated as ONE signed
    contraction ``(x * s) . y`` at HIGHEST precision (see DOT_PREC) — the
    same folded-signature single dot the pairwise/kernel paths use.
    """
    return jnp.einsum("...i,...i->...", x * _signature(x.shape[-1], x.dtype),
                      y, precision=DOT_PREC)


def minkowski_norm(x: jax.Array) -> jax.Array:
    """``sqrt(max(<x,x>_L, 1e-8))``. Parity: reference lorentz_model.py:28-38."""
    return jnp.sqrt(jnp.maximum(minkowski_dot(x, x), EPS_NORM))


def project_to_hyperboloid(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Recompute the time coordinate so ``x`` lies on the sheet.

    ``x0 = sqrt(1 + c * ||x_spatial||^2)``. Parity: reference lorentz_model.py:41-56.
    """
    spatial = x[..., 1:]
    sq = jnp.einsum("...i,...i->...", spatial, spatial,
                    precision=DOT_PREC)[..., None]
    x0 = jnp.sqrt(1.0 + c * sq)
    return jnp.concatenate([x0, spatial], axis=-1)


def lorentz_to_klein(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Klein-model coordinates ``x_spatial / x0``. Parity: reference lorentz_model.py:59-70."""
    del c
    return x[..., 1:] / x[..., 0:1]


def exp_map(x: jax.Array, v: jax.Array, c: float = 1.0) -> jax.Array:
    """Exponential map of tangent vector ``v`` at base point ``x``.

    ``exp_x(v) = cosh(|v|) x + sinh(|v|) v/|v|`` with the Minkowski tangent
    norm ``|v| = sqrt(-<v,v>_L)`` (tangent vectors are spacelike, so
    ``<v,v>_L < 0`` under this sign convention). Degenerate-``v`` handling
    follows the reference (lorentz_model.py:89-91): near-zero tangents zero the
    direction term.

    Deviation from the reference (:85): the reference uses the *spatial* norm
    of ``v``, which equals the Minkowski norm only for tangents at the origin
    (``v0 = 0``) — the one place its on-path code evaluates it. Off-origin the
    spatial norm is simply wrong (breaks log/exp inversion); see DEVIATIONS.md.
    """
    del c
    v_sq = jnp.einsum("...i,...i->...", v[..., 1:], v[..., 1:],
                      precision=DOT_PREC)[..., None] - (
        v[..., 0:1] * v[..., 0:1]
    )
    v_norm = jnp.sqrt(jnp.maximum(v_sq, EPS_NORM))
    mask = (v_norm < EXP_ZERO_TOL).astype(v.dtype)
    direction = v / (v_norm + mask)
    direction = (1.0 - mask) * direction
    return jnp.cosh(v_norm) * x + jnp.sinh(v_norm) * direction


def log_map(x: jax.Array, y: jax.Array, c: float = 1.0) -> jax.Array:
    """Logarithmic map of ``y`` into the tangent space at ``x``.

    ``log_x(y) = coef * (y - m x)`` with ``m = <x,y>_L`` and
    ``coef = acosh(m)/sqrt(m^2 - 1)``, so ``|log_x(y)| = d(x, y)`` and
    ``<x, log_x(y)>_L = 0``. Coefficient cap and NaN mask follow the reference
    (lorentz_model.py:112-117); the sign of ``m`` is fixed (see module
    docstring / DEVIATIONS.md — the reference's version always degenerates to
    ``coef = 1`` and a non-tangent output).
    """
    del c
    m = minkowski_dot(x, y)
    m_c = jnp.maximum(m, 1.0 + ACOSH_EPS)
    denom_sq = m_c * m_c - 1.0
    coef = jnp.where(
        denom_sq > 0,
        acosh(m_c) / jnp.sqrt(jnp.maximum(denom_sq, EPS_NORM)),
        1.0,
    )
    coef = jnp.minimum(coef, LOG_COEF_MAX)
    coef = jnp.where(jnp.isnan(coef), 1.0, coef)
    return coef[..., None] * (y - m[..., None] * x)


def geodesic_point(x: jax.Array, y: jax.Array, w, c: float = 1.0) -> jax.Array:
    """Point at fraction ``w`` along the geodesic from ``x`` to ``y``.

    Mathematically identical to ``exp_map(x, w * log_map(x, y))`` (the
    reference's merge-midpoint composition, hyperbolic_merge.py:320-340):
    with ``d = acosh(<x,y>_L)``,

        gamma(w) = [sinh((1-w) d) x + sinh(w d) y] / sinh(d).

    Evaluated in the scaled-exponential form (every exponent <= 0, no
    overflow, no cancellation):

        gamma(w) = [e^{-wd}(1-e^{-2(1-w)d}) x + e^{-(1-w)d}(1-e^{-2wd}) y]
                   / (1 - e^{-2d}).

    The exp/log composition computes ``coef * (y - <x,y> x)`` where the
    subtraction cancels catastrophically once d is large (at d = 11,
    ``<x,y> = cosh d ~ 3.6e4`` and fp32 produces midpoints with O(100%)
    error — the reference shares this flaw); the geodesic form is a convex-
    like positive combination and stays accurate at any distance. Degenerate
    ``d -> 0`` returns ``x`` (the exp/log limit).
    """
    del c  # midpoints live on the c=1 sheet (distance-scale curvature model)
    m = minkowski_dot(x, y)
    m_c = jnp.maximum(m, 1.0 + ACOSH_EPS)
    d = acosh(m_c)
    w = jnp.asarray(w, x.dtype)
    a = (1.0 - w) * d
    b = w * d
    num_x = jnp.exp(-b) * (1.0 - jnp.exp(-2.0 * a))
    num_y = jnp.exp(-a) * (1.0 - jnp.exp(-2.0 * b))
    den = jnp.maximum(1.0 - jnp.exp(-2.0 * d), EPS_NORM)
    out = (num_x[..., None] * x + num_y[..., None] * y) / den[..., None]
    return jnp.where((d < EXP_ZERO_TOL)[..., None], x, out)


def distance(x: jax.Array, y: jax.Array, c: float = 1.0, eps: float = ACOSH_EPS) -> jax.Array:
    """Geodesic distance ``acosh(<x,y>_L) / sqrt(c)``.

    Sign fixed vs. the reference (lorentz_model.py:134 negates a positive dot
    and therefore returns 0 everywhere — DEVIATIONS.md).

    ``eps`` controls the acosh clamp. The default ``1e-8`` rounds to exactly
    1.0 in float32 (as in the reference / torch), which makes ``d(x, x) == 0``
    but yields NaN *gradients* at coincident points (``acosh'(1) = inf``
    reached through the clamp). Differentiable paths (losses, curvature
    optimisation) should pass ``eps >= 1e-6`` so the clamp point has a finite
    derivative.
    """
    xy = jnp.maximum(minkowski_dot(x, y), 1.0 + eps)
    return acosh(xy) / jnp.sqrt(jnp.asarray(c, dtype=x.dtype))


def pairwise_minkowski_dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Minkowski Gram matrix ``G[i, j] = <x_i, y_j>_L`` as one matmul.

    Computed as ``(x * s) @ y.T`` with the metric signature ``s = (+1, -1 ... -1)``
    folded into ``x`` — a single MXU ``dot_general`` instead of the reference's
    broadcasted elementwise formulation (lorentz_model.py:154-166).
    """
    return jax.lax.dot_general(
        x * _signature(x.shape[-1], x.dtype),
        y,
        dimension_numbers=(((x.ndim - 1,), (y.ndim - 1,)), ((), ())),
        precision=DOT_PREC,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def pairwise_dist(x: jax.Array, y: jax.Array, c: float = 1.0,
                  eps: float = ACOSH_EPS) -> jax.Array:
    """Pairwise distance matrix of shape ``(B1, B2)``.

    Capability parity with reference ``batch_distance`` (lorentz_model.py:
    141-178) / ``batch_distance_optimized`` (:181-210), reformulated for the
    MXU and with the distance sign fixed (DEVIATIONS.md).
    """
    xy = jnp.maximum(pairwise_minkowski_dot(x, y), 1.0 + eps)
    return acosh(xy) / jnp.sqrt(jnp.asarray(c, dtype=x.dtype))


# Aliases mirroring the reference's public names (SURVEY §2.1).
batch_distance = pairwise_dist
batch_distance_optimized = pairwise_dist


def parallel_transport(v: jax.Array, x: jax.Array, y: jax.Array, c: float = 1.0) -> jax.Array:
    """Parallel transport of tangent ``v`` from ``x`` to ``y``.

    ``PT(v) = v - <y,v>_L / (1 + <x,y>_L) * (x + y)`` — satisfies
    ``<y, PT(v)>_L = 0`` (the property the reference's own test asserts and its
    implementation at lorentz_model.py:213-228 fails; DEVIATIONS.md).
    """
    del c
    m = minkowski_dot(x, y)[..., None]
    coef = minkowski_dot(y, v)[..., None] / (1.0 + m)
    return v - coef * (x + y)


def tangent_project(x: jax.Array, g: jax.Array, c: float = 1.0) -> jax.Array:
    """Project an ambient vector onto the tangent space at ``x``.

    ``g_tan = g - <x, g>_L * x`` so that ``<x, g_tan>_L = 0`` (sign fixed vs.
    reference ``riemannian_gradient``, lorentz_model.py:231-244; DEVIATIONS.md).
    """
    del c
    return g - minkowski_dot(x, g)[..., None] * x


# Name-parity alias with the reference API.
riemannian_gradient = tangent_project


def rsgd_step(x: jax.Array, euclidean_grad: jax.Array, lr: float, c: float = 1.0) -> jax.Array:
    """One Riemannian SGD step on the hyperboloid.

    The reference *declares* an RSGD optimizer but never runs a gradient step
    (SURVEY §2.5 "ghost features"; tokenizer/hyperbolic_merge.py:123,141). This is
    the real thing: Euclidean grad -> tangent projection -> exp-map retraction of
    ``-lr * grad`` -> re-projection to control float drift.

    Following Nickel & Kiela (2018): the Riemannian gradient first rescales the
    Euclidean gradient by the inverse ambient metric (flip the time component:
    ``h = (-g0, g1, ..., gd)``), then projects onto the tangent space
    (``h - <x,h>_L x`` in this sign convention), then retracts via exp map.
    """
    h = euclidean_grad.at[..., 0].multiply(-1.0)
    riem = tangent_project(x, h, c)
    step = -lr * riem
    return project_to_hyperboloid(exp_map(x, step, c), c)


def origin(d: int, dtype=jnp.float32) -> jax.Array:
    """The hyperboloid origin ``(1, 0, ..., 0)`` in ``R^{d+1}``."""
    return jnp.concatenate([jnp.ones((1,), dtype), jnp.zeros((d,), dtype)])


def random_points(key: jax.Array, n: int, d: int, c: float = 1.0, sigma: float = 0.01,
                  dtype=jnp.float32) -> jax.Array:
    """Sample points near the origin: tangent Gaussian(0, sigma^2) -> exp map.

    Mirrors the reference's embedding init
    (scripts/train_hyperbolic_tokenizer.py:89-107): zero time coordinate in the
    tangent, per-point exp-map at the origin, final re-projection.
    """
    spatial = sigma * jax.random.normal(key, (n, d), dtype)
    tangent = jnp.concatenate([jnp.zeros((n, 1), dtype), spatial], axis=-1)
    base = jnp.broadcast_to(origin(d, dtype), (n, d + 1))
    return project_to_hyperboloid(exp_map(base, tangent, c), c)
