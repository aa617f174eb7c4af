"""On-chip timing decomposition of the flagship bench (VERDICT r2 #4).

Splits ctor / sync compile / sync exec / loop compile / loop exec at the
full bench scale, a few chunks in, so the 500 s first chunk has named parts.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bz2
import time

import jax
import jax.numpy as jnp

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
from hyptokenizer_tpu.tokenizer import enhanced_state as E
from hyptokenizer_tpu.tokenizer import normalize as N
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

t0 = time.perf_counter()
with bz2.open(os.path.join(HERE, "data", "wiki_corpus.txt.bz2"), "rt",
              encoding="utf-8") as f:
    lines = [ln.rstrip("\n") for ln in f if ln.strip()]
chars = sorted({ch for ln in lines for ch in ln})
vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
emb = L.random_points(jax.random.PRNGKey(0), len(vocab), 100, sigma=0.5)
print(f"host corpus load: {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
tok = EnhancedHyperbolicTokenizer(
    vocab, emb, max_vocab_size=50_176, merge_threshold=100.0,
    alpha=0.05, beta=0.9, gamma=0.05,
    use_hierarchical=False, use_compression_aware=False,
    use_adaptive_curvature=True, optimize_curvature_freq=1000,
    use_dense_channel=False, min_pair_freq=1, merge_batch=16,
    corpus_sample=lines, corpus_max_tokens=2_900_000,
    normalizer=NormalizerConfig(pre_split=N.WORDS_WITH_SPACE),
    merge_policy="priority", seed=0)
print(f"ctor: {time.perf_counter() - t0:.1f}s", flush=True)

st = jax.tree.map(jnp.array, tok.enh_state)
cfg = tok.enh_config

sync_jit = jax.jit(E.sync_corpus, static_argnames=("config",))
t0 = time.perf_counter()
lowered = sync_jit.lower(st, cfg)
compiled_sync = lowered.compile()
print(f"sync compile: {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
st1 = compiled_sync(st)
jax.block_until_ready(st1.pair_counts)
print(f"sync exec (N=2.9M): {time.perf_counter() - t0:.2f}s", flush=True)

# The loop: n_steps static = 2048 (bench log_every).
from hyptokenizer_tpu.ops.pallas import enhanced_loop

t0 = time.perf_counter()
st2 = enhanced_loop.run_enhanced_fused(st1, cfg, 2048)
jax.block_until_ready(st2.base.num_merges)
print(f"fused loop compile+first exec (2048 merges): "
      f"{time.perf_counter() - t0:.1f}s  merges={int(st2.base.num_merges)}",
      flush=True)

for k in range(4):
    t0 = time.perf_counter()
    st2 = compiled_sync(st2)
    jax.block_until_ready(st2.pair_counts)
    t_sync = time.perf_counter() - t0
    m0 = int(st2.base.num_merges)
    t0 = time.perf_counter()
    st2 = enhanced_loop.run_enhanced_fused(st2, cfg, 2048)
    jax.block_until_ready(st2.base.num_merges)
    t_loop = time.perf_counter() - t0
    m1 = int(st2.base.num_merges)
    print(f"chunk {k}: sync={t_sync:.2f}s loop={t_loop:.2f}s "
          f"merges={m1 - m0} ({(m1 - m0) / max(t_loop + t_sync, 1e-9):.0f}/s)",
          flush=True)
