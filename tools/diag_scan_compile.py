"""Is jax.lax.associative_scan the 400 s compile pig at N=2.9M on TPU?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

N = 2_900_000
x = jnp.zeros((N,), jnp.int32)


def t(name, fn):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(x).compile()
    print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(c(x))
    r = 3
    t0 = time.perf_counter()
    for _ in range(r):
        out = c(x)
    jax.block_until_ready(out)
    print(f"   exec {name}: {(time.perf_counter() - t0) / r * 1e3:.1f}ms",
          flush=True)


t("associative_scan(min)", lambda v: jax.lax.associative_scan(jnp.minimum, v))
t("cumsum", lambda v: jnp.cumsum(v))
t("cummax", lambda v: jax.lax.cummax(v, axis=0))
t("cummin_rev", lambda v: jax.lax.cummin(v, axis=0, reverse=True))
