"""Which piece of sync_corpus costs 459 s to COMPILE on TPU, and is the
non-power-of-2 corpus length (2,900,000) the trigger?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from hyptokenizer_tpu.tokenizer import scoring

T = 1 << 17


def time_compile(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    dt = time.perf_counter() - t0
    print(f"compile {name}: {dt:.1f}s", flush=True)
    return c


for n in (2_900_000, 1 << 21):
    print(f"--- corpus N = {n}", flush=True)
    corpus = jnp.zeros((n,), jnp.int32)
    merges = jnp.full((50_176, 2), -1, jnp.int32)

    time_compile(f"rank_replay@{n}",
                 lambda c, m: scoring.batch_rank_replay(
                     c, m, jnp.asarray(0, jnp.int32),
                     jnp.asarray(16, jnp.int32), 128),
                 corpus, merges)
    time_compile(f"build_pair_table@{n}",
                 lambda c: scoring.build_pair_table(c, T), corpus)
    time_compile(f"sort2@{n}",
                 lambda c: jax.lax.sort((c, c), num_keys=2), corpus)
    time_compile(f"compact@{n}", scoring.compact_corpus, corpus)
