"""Probe: precision and throughput of f32 dot paths on TPU (XLA vs Mosaic).

Decides the gram-precision policy for hyperbolic distances (KERNELS.md):
acosh(xy) near xy=1 needs absolute gram error << xy-1, so a single-pass
bf16 MXU gram (XLA DEFAULT) is unusable for short distances.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N, D = 256, 128
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (N, D), jnp.float32) * 0.5
b = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32) * 0.5
ref = (np.asarray(a, np.float64) @ np.asarray(b, np.float64).T)


def xla_dot(a, b, precision):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _kernel(a_ref, b_ref, o_ref, *, precision):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def _kernel_elem(a_ref, b_ref, o_ref):
    # (N, 1, D) * (1, N, D) lane reduce — VPU f32 exact path
    o_ref[...] = jnp.sum(a_ref[...][:, None, :] * b_ref[...][None, :, :],
                         axis=-1)


outs = {}
for prec in (None, jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST):
    name = f"xla_{prec}".lower()
    outs[name] = np.asarray(jax.jit(
        functools.partial(xla_dot, precision=prec))(a, b))
    try:
        pk = pl.pallas_call(functools.partial(_kernel, precision=prec),
                            out_shape=jax.ShapeDtypeStruct((N, N),
                                                           jnp.float32))
        outs[f"pallas_{prec}".lower()] = np.asarray(jax.jit(pk)(a, b))
    except Exception as e:
        print(f"pallas precision={prec} failed:",
              str(e).splitlines()[0][:120])
try:
    pe = pl.pallas_call(_kernel_elem,
                        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32))
    outs["pallas_elem"] = np.asarray(jax.jit(pe)(a, b))
except Exception as e:
    print("pallas_elem failed:", str(e).splitlines()[0][:120])
outs["xla_elem"] = np.asarray(jax.jit(
    lambda a, b: jnp.sum(a[:, None, :] * b[None, :, :], -1))(a, b))

names = list(outs)
print("== error vs float64 truth ==")
for n in names:
    print(f"{n:22s} max_abs_err={np.max(np.abs(outs[n] - ref)):.3e}")
print("== bitwise-equality matrix ==")
for i, n1 in enumerate(names):
    for n2 in names[i + 1:]:
        if np.array_equal(outs[n1], outs[n2]):
            print(f"{n1} == {n2}")

# Throughput at bench-relevant shape
M = 4096
aa = jax.random.normal(key, (M, 128), jnp.float32)
bb = jax.random.normal(jax.random.PRNGKey(2), (M, 128), jnp.float32)
for prec in (None, jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST):
    f = jax.jit(functools.partial(xla_dot, precision=prec))
    f(aa, bb).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        r = f(aa, bb)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 50
    print(f"xla {str(prec):28s} {M}x{M}x128: {dt * 1e3:.3f} ms "
          f"({2 * M * M * 128 / dt / 1e12:.1f} TFLOP/s)")
