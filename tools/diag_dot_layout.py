"""Probe: HIGHEST-precision dot equality between XLA (unpadded, d=100/101)
and Mosaic (zero-padded to 128 lanes, data at different lane offsets).

If the MXU accumulation is shift/pad-invariant, the XLA oracle path can keep
natural (…, d+1) shapes while the kernels use 128-lane padded layouts and
still match bitwise."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

HI = jax.lax.Precision.HIGHEST
LANES = 128
D = 100
N = 256

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (N, D), jnp.float32) * 0.7
b = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32) * 0.7

# XLA: einsum over the natural d=100 axis.
xla_rowdot = np.asarray(jax.jit(
    lambda a, b: jnp.einsum("...i,...i->...", a, b, precision=HI))(a, b))

# Pallas: same data at lane offset 1 (kernel layout), zero pad elsewhere.
ap = jnp.zeros((N, LANES), jnp.float32).at[:, 1:D + 1].set(a)
bp = jnp.zeros((N, LANES), jnp.float32).at[:, 1:D + 1].set(b)


def _kern(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32)


pl_dot = np.asarray(jax.jit(pl.pallas_call(
    _kern, out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32)))(ap, bp))
pl_diag = pl_dot.diagonal()
print("rowdot xla(d=100) vs pallas(pad@1, 128): bitwise =",
      np.array_equal(xla_rowdot, pl_diag),
      "max_diff =", float(np.max(np.abs(xla_rowdot - pl_diag))))

# Also: offset 0 vs offset 1 inside pallas (pure shift invariance).
ap0 = jnp.zeros((N, LANES), jnp.float32).at[:, :D].set(a)
bp0 = jnp.zeros((N, LANES), jnp.float32).at[:, :D].set(b)
pl_dot0 = np.asarray(jax.jit(pl.pallas_call(
    _kern, out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32)))(ap0, bp0))
print("pallas pad@0 vs pad@1: bitwise =",
      np.array_equal(pl_dot0, pl_dot))

# Pairwise NxN: XLA dot over 100 vs pallas dot over padded 128.
xla_pair = np.asarray(jax.jit(
    lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=HI,
        preferred_element_type=jnp.float32))(a, b))
print("pairwise xla(d=100) vs pallas(128): bitwise =",
      np.array_equal(xla_pair, pl_dot),
      "max_diff =", float(np.max(np.abs(xla_pair - pl_dot))))

# einsum batcheddot vs dot_general pairwise diagonal (XLA-internal
# consistency: does '...i,...i->...' lower to the same MXU op?)
print("xla einsum vs xla pairwise diagonal: bitwise =",
      np.array_equal(xla_rowdot, xla_pair.diagonal()))
