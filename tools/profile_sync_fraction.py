"""Amdahl decomposition of the enhanced chunk: replicated sync_corpus vs
shardable merge loop (VERDICT r2 #5).

On this 2-vCPU host a virtual 8-device mesh timeshares 2 cores, so the
bench_scaling curve measures collective/dispatch overhead, not scaling. This
script instead measures the serial (replicated) fraction f of a chunk cycle
at devices=1; the multi-chip efficiency ceiling is 1 / (f + (1-f)/N).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bz2
import time

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
from hyptokenizer_tpu.tokenizer import enhanced_state as E
from hyptokenizer_tpu.tokenizer import normalize as N
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "wiki_corpus.txt.bz2")
with bz2.open(path, "rt", encoding="utf-8") as f:
    lines = [ln.rstrip("\n") for ln in f if ln.strip()][:2000]
chars = sorted({ch for ln in lines for ch in ln})
vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
emb = L.random_points(jax.random.PRNGKey(0), len(vocab), 100, sigma=0.5)
tok = EnhancedHyperbolicTokenizer(
    vocab, emb, max_vocab_size=8192, merge_threshold=100.0,
    alpha=0.05, beta=0.9, gamma=0.05, min_pair_freq=1, merge_batch=16,
    use_dense_channel=False, corpus_sample=lines, corpus_max_tokens=65_536,
    normalizer=NormalizerConfig(pre_split=N.WORDS_WITH_SPACE),
    merge_policy="priority", seed=0)

st = jax.tree.map(jnp.array, tok.enh_state)
cfg = tok.enh_config

sync_jit = jax.jit(E.sync_corpus, static_argnames=("config",))


def run_loop_only(st, n):
    start = st.base.num_merges
    start_step = st.base.step
    cap = n + 1024

    def cond(s):
        return ((~s.base.stopped) & (~s.needs_resync)
                & (s.base.num_merges - start < n)
                & (s.base.step - start_step < cap))

    return jax.lax.while_loop(cond, lambda s: E.enhanced_step(s, cfg), st)


loop_jit = jax.jit(run_loop_only, static_argnames=("n",))

# Warmup/compile both pieces.
st1 = sync_jit(st, cfg)
jax.block_until_ready(st1.pair_counts)
st2 = loop_jit(st1, 256)
jax.block_until_ready(st2.base.num_merges)

t_sync, t_loop, merges = 0.0, 0.0, 0
stc = st2
for _ in range(8):
    t0 = time.perf_counter()
    stc = sync_jit(stc, cfg)
    jax.block_until_ready(stc.pair_counts)
    t_sync += time.perf_counter() - t0
    m0 = int(stc.base.num_merges)
    t0 = time.perf_counter()
    stc = loop_jit(stc, 256)
    jax.block_until_ready(stc.base.num_merges)
    t_loop += time.perf_counter() - t0
    merges += int(stc.base.num_merges) - m0

f = t_sync / (t_sync + t_loop)
print(f"merges={merges} t_sync={t_sync:.2f}s t_loop={t_loop:.2f}s "
      f"replicated_fraction={f:.3f}")
for n in (2, 4, 8, 64):
    print(f"  efficiency ceiling at N={n}: {1.0 / (f + (1 - f) / n) / n:.2f} "
          f"(speedup {1.0 / (f + (1 - f) / n):.1f}x)")
