"""Poincaré ball model operations.

TPU-native re-implementation of the reference Poincaré family
(``embedding/poincare_ball.py:14-163``): Möbius gyrovector ops, origin exp/log
maps, ball distance and Lorentz<->Poincaré conversions. Pure jnp, batch-first,
manifold coordinate last ``(..., d)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST

EPS_NORM = 1e-8  # min-norm clamp (reference poincare_ball.py:62,81,100)


def norm(x: jax.Array) -> jax.Array:
    """Euclidean norm over the last axis, keepdims. Parity: poincare_ball.py:14-24."""
    return jnp.linalg.norm(x, axis=-1, keepdims=True)


def mobius_addition(x: jax.Array, y: jax.Array, c: float = 1.0) -> jax.Array:
    """Möbius addition ``x ⊕_c y``. Parity: poincare_ball.py:27-46."""
    # einsum at HIGHEST precision: XLA:TPU rewrites mul+reduce into a
    # default-precision (single-bf16-pass) MXU dot (see lorentz.DOT_PREC).
    x_sq = jnp.einsum("...i,...i->...", x, x, precision=_PREC)[..., None]
    y_sq = jnp.einsum("...i,...i->...", y, y, precision=_PREC)[..., None]
    xy = jnp.einsum("...i,...i->...", x, y, precision=_PREC)[..., None]
    num = (1.0 + 2.0 * c * xy + c * y_sq) * x + (1.0 - c * x_sq) * y
    denom = 1.0 + 2.0 * c * xy + c * c * x_sq * y_sq
    return num / denom


def mobius_scalar_mul(r: jax.Array, x: jax.Array, c: float = 1.0) -> jax.Array:
    """Möbius scalar multiplication ``r ⊗_c x``. Parity: poincare_ball.py:49-65."""
    sqrt_c = jnp.sqrt(jnp.asarray(c, x.dtype))
    x_norm = jnp.maximum(norm(x), EPS_NORM)
    return jnp.tanh(r * jnp.arctanh(sqrt_c * x_norm)) / (sqrt_c * x_norm) * x


def exp_map_zero(v: jax.Array, c: float = 1.0) -> jax.Array:
    """Exp map at the origin of the ball. Parity: poincare_ball.py:68-84.

    Keeps the reference's exact zero-mask semantics: exactly-zero vectors map to
    themselves (the zeros_mask branch), others through tanh scaling.
    """
    sqrt_c = jnp.sqrt(jnp.asarray(c, v.dtype))
    v_norm = norm(v)
    zeros_mask = (v_norm == 0).astype(v.dtype)
    v_norm_c = jnp.maximum(v_norm, EPS_NORM)
    mapped = jnp.tanh(sqrt_c * v_norm_c) / (sqrt_c * v_norm_c) * v
    return mapped * (1.0 - zeros_mask) + zeros_mask * v


def log_map_zero(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Log map at the origin of the ball. Parity: poincare_ball.py:87-103."""
    sqrt_c = jnp.sqrt(jnp.asarray(c, x.dtype))
    x_norm = norm(x)
    zeros_mask = (x_norm == 0).astype(x.dtype)
    x_norm_c = jnp.maximum(x_norm, EPS_NORM)
    mapped = jnp.arctanh(sqrt_c * x_norm_c) / (sqrt_c * x_norm_c) * x
    return mapped * (1.0 - zeros_mask) + zeros_mask * x


def distance(x: jax.Array, y: jax.Array, c: float = 1.0) -> jax.Array:
    """Ball distance ``2/sqrt(c) * atanh(sqrt(c) ||(-x) ⊕ y||)``.

    Parity: poincare_ball.py:106-126.
    """
    sqrt_c = jnp.sqrt(jnp.asarray(c, x.dtype))
    diff = mobius_addition(-x, y, c)
    return (2.0 / sqrt_c) * jnp.arctanh(sqrt_c * norm(diff))[..., 0]


def lorentz_to_poincare(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Stereographic projection hyperboloid -> ball. Parity: poincare_ball.py:129-140."""
    sqrt_c = jnp.sqrt(jnp.asarray(c, x.dtype))
    return x[..., 1:] / (x[..., 0:1] + 1.0 / sqrt_c)


def poincare_to_lorentz(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Inverse stereographic projection ball -> hyperboloid.

    Exact inverse of ``lorentz_to_poincare`` (y = x_s / (x0 + 1/sqrt(c))):
    with ``k = 1/sqrt(c)`` and ``s = ||y||^2``,

        x0  = (k s + sqrt(1 + s (k^2 - 1))) / (1 - s)
        x_s = y (x0 + k)

    which lands on the sheet ``<x,x>_L = 1`` for every ``c``. Deviation from
    the reference (poincare_ball.py:143-163), whose formula maps onto
    ``<x,x>_L = 1/4`` and fails the conversion roundtrip (the reference has no
    test covering it — SURVEY §4); see DEVIATIONS.md.
    """
    k = 1.0 / jnp.sqrt(jnp.asarray(c, x.dtype))
    s = jnp.einsum("...i,...i->...", x, x, precision=_PREC)[..., None]
    x0 = (k * s + jnp.sqrt(1.0 + s * (k * k - 1.0))) / (1.0 - s)
    return jnp.concatenate([x0, x * (x0 + k)], axis=-1)
