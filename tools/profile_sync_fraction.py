"""Amdahl decomposition of the enhanced chunk cycle (VERDICT r2 #5).

On this 2-vCPU host a virtual 8-device mesh timeshares 2 cores, so
bench_scaling's multi-device wall-times measure dispatch/collective overhead,
not scaling. This script instead measures the pieces directly at 1 device:

  * t_local(N):   merge replay + pair-table build on an N-token corpus
                  (per-shard work under sync_corpus_sharded — scales 1/D)
  * t_combine:    merge_pair_tables + scoring/queue tail (replicated)
  * t_loop:       the merge while-loop itself (row-sharded — scales ~1/D)

and projects the multi-chip efficiency ceiling 1/(f + (1-f)/D) for the OLD
replicated sync (f = (t_local(N)+t_combine)/cycle) vs the NEW sharded sync
(f = t_combine/cycle).
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
from hyptokenizer_tpu.tokenizer import scoring
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig

CORPUS_N = 65_536

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
    use_dense_channel=False, corpus_sample=lines,
    corpus_max_tokens=CORPUS_N, corpus_shards=8,
    normalizer=NormalizerConfig(pre_split=N.WORDS_WITH_SPACE),
    merge_policy="priority", seed=0)

st = jax.tree.map(jnp.array, tok.enh_state)
cfg = tok.enh_config
T = cfg.freq_table_size


def timeit(fn, *a, reps=8):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


replay = scoring.batch_rank_replay


@jax.jit
def local_part(corpus):
    c = replay(corpus, st.base.merges, st.corpus_synced,
               st.base.num_merges - st.corpus_synced, cfg.n_init)
    return c, scoring.build_pair_table(c, T)


@jax.jit
def combine_part(keys, counts, nu):
    return scoring.merge_pair_tables(keys, counts, nu, T,
                                     max_id=cfg.base.max_vocab_size)


@jax.jit
def finish_part(st, corpus, keys, counts, n_unique, max_count):
    return E._sync_finish(st, cfg, corpus, keys, counts, n_unique, max_count)


# t_local at full N (old replicated sync does this on EVERY device) and at
# N/8 (per-shard work under the sharded sync).
t_local_full, (c_full, tbl_full) = timeit(local_part, st.corpus)
t_local_8th, (c8, tbl8) = timeit(local_part, st.corpus[:CORPUS_N // 8])

# Combine on 8 shard tables (content: replicate the 1/8 table), then the
# scoring/queue tail — both REPLICATED under the current sharded sync,
# measured separately (VERDICT r3 #6: measure, don't model).
keys8 = jnp.concatenate([tbl8[0]] * 8)
cnts8 = jnp.concatenate([tbl8[1]] * 8)
nus8 = jnp.stack([tbl8[2]] * 8)
t_combine, (gk, gc, gnu, gmx) = timeit(combine_part, keys8, cnts8, nus8)
t_finish, st_synced = timeit(finish_part, st, c_full, gk, gc, gnu, gmx)

# Merge loop (256 merges) from a synced state.
from hyptokenizer_tpu.parallel.sharded import _enhanced_loop_jit

t_loop, _ = timeit(
    lambda s: _enhanced_loop_jit(jax.tree.map(jnp.array, s), cfg, 256),
    st_synced, reps=4)

t_tail = t_combine + t_finish
cycle_old = t_local_full + t_tail + t_loop
f_old = (t_local_full + t_tail) / cycle_old
print(f"t_local(full N={CORPUS_N}) = {t_local_full*1e3:.1f} ms")
print(f"t_local(N/8)              = {t_local_8th*1e3:.1f} ms")
print(f"t_combine (replicated, 8 tables) = {t_combine*1e3:.1f} ms")
print(f"t_finish  (replicated scoring/queue tail) = {t_finish*1e3:.1f} ms")
print(f"t_loop (256 merges, row-sharded) = {t_loop*1e3:.1f} ms")
print(f"old replicated sync: serial fraction f = {f_old:.3f}")
for d in (2, 4, 8, 64):
    eff_old = 1.0 / (f_old + (1 - f_old) / d) / d
    # new: local scales 1/D (measured at 1/8 for d=8), tail replicated
    t_cycle_new = t_local_full / d + t_tail + t_loop / d
    eff_new = cycle_old / (d * t_cycle_new)
    rep_share = t_tail / t_cycle_new if d == 8 else None
    extra = f" replicated_share={rep_share:.2f}" if rep_share else ""
    print(f"  D={d}: efficiency ceiling old={eff_old:.2f} "
          f"new={eff_new:.2f}{extra}")
