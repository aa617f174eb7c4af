"""Probe: does the kernel's midpoint chain match XLA geodesic_point bitwise
on TPU?  Localizes divergence: gram dot -> acosh -> exp chain -> x_new."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.ops.lorentz import ACOSH_EPS, EPS_NORM, EXP_ZERO_TOL

LANES = 128
D1 = 101
N = 256

key = jax.random.PRNGKey(0)
pts = L.random_points(key, 2 * N, 100, sigma=0.5)   # (2N, 101)
x = pts[:N]
y = pts[N:]
xp = jnp.zeros((N, LANES), jnp.float32).at[:, :D1].set(x)
yp = jnp.zeros((N, LANES), jnp.float32).at[:, :D1].set(y)
w = jnp.full((N,), 0.5, jnp.float32)


def _acosh(v):
    return jnp.log(v + jnp.sqrt(v * v - 1.0))


def _kern(x_ref, y_ref, w_ref, m_ref, d_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    sig = jnp.where(lane == 0, 1.0, jnp.where(lane < D1, -1.0, 0.0))
    xi = x_ref[...]
    xj = y_ref[...]
    m_raw = jnp.sum(sig * xi * xj, axis=-1, keepdims=True)   # (N, 1)
    m_c = jnp.maximum(m_raw, 1.0 + ACOSH_EPS)
    dd = _acosh(m_c)
    ww = w_ref[...]
    a_ = (1.0 - ww) * dd
    b_ = ww * dd
    num_x = jnp.exp(-b_) * (1.0 - jnp.exp(-2.0 * a_))
    num_y = jnp.exp(-a_) * (1.0 - jnp.exp(-2.0 * b_))
    den = jnp.maximum(1.0 - jnp.exp(-2.0 * dd), EPS_NORM)
    x_new = (num_x * xi + num_y * xj) / den
    x_new = jnp.where(dd < EXP_ZERO_TOL, xi, x_new)
    m_ref[...] = m_raw
    d_ref[...] = dd
    o_ref[...] = x_new


kern = pl.pallas_call(_kern, out_shape=[
    jax.ShapeDtypeStruct((N, 1), jnp.float32),
    jax.ShapeDtypeStruct((N, 1), jnp.float32),
    jax.ShapeDtypeStruct((N, LANES), jnp.float32),
])
m_k, d_k, o_k = jax.jit(kern)(xp, yp, w[:, None])
m_k, d_k, o_k = np.asarray(m_k)[:, 0], np.asarray(d_k)[:, 0], np.asarray(o_k)


@jax.jit
def xla_chain(x, y, w):
    m = L.minkowski_dot(x, y)
    m_c = jnp.maximum(m, 1.0 + ACOSH_EPS)
    d = jnp.arccosh(m_c)
    return m, d, L.geodesic_point(x, y, w)


m_x, d_x, o_x = (np.asarray(v) for v in xla_chain(x, y, w))


def cmp(name, a, b):
    eq = np.array_equal(a, b)
    mad = float(np.max(np.abs(a - b))) if a.shape == b.shape else -1
    n_diff = int(np.sum(a != b))
    print(f"{name:12s} bitwise={eq} n_diff={n_diff}/{a.size} "
          f"max_abs_diff={mad:.3e}")


cmp("gram", m_k, m_x)
cmp("acosh", d_k, d_x)
cmp("x_new", o_k[:, :D1], o_x)

# Sub-probe: same VALUES through acosh formulas (isolate transcendentals).
mc = np.maximum(m_x, 1.0 + ACOSH_EPS).astype(np.float32)


def _acosh_host_kernel(v_ref, o_ref):
    v = v_ref[...]
    o_ref[...] = jnp.log(v + jnp.sqrt(v * v - 1.0))


ak = pl.pallas_call(_acosh_host_kernel,
                    out_shape=jax.ShapeDtypeStruct((N,), jnp.float32))
a_pl = np.asarray(jax.jit(ak)(jnp.asarray(mc)))
a_xla_formula = np.asarray(jax.jit(
    lambda v: jnp.log(v + jnp.sqrt(v * v - 1.0)))(jnp.asarray(mc)))
a_xla_arccosh = np.asarray(jax.jit(jnp.arccosh)(jnp.asarray(mc)))
cmp("acosh pl-vs-formula", a_pl, a_xla_formula)
cmp("acosh pl-vs-arccosh", a_pl, a_xla_arccosh)

# Sub-probe: exp bitwise between pallas and XLA on identical inputs.
vals = jnp.asarray(-np.abs(np.asarray(d_x, np.float32)))
ek = pl.pallas_call(lambda v_ref, o_ref: o_ref.__setitem__(
    ..., jnp.exp(v_ref[...])),
    out_shape=jax.ShapeDtypeStruct((N,), jnp.float32))
e_pl = np.asarray(jax.jit(ek)(vals))
e_x = np.asarray(jax.jit(jnp.exp)(vals))
cmp("exp", e_pl, e_x)
