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


# ---------------------------------------------------------------- v3 pieces
# The v3 sharded sync (parallel/sharded._sharded_sync_v3_fn) shards the
# combine and the scoring/queue tail too; its only REPLICATED stage is the
# K-sized final candidate merge. Per-device piece timings at their real
# D=8 shapes (measured single-device — the virtual CPU mesh timeshares two
# cores, so in-mesh wall times measure contention, not scaling):
D = 8
B = max(128, -(-2 * (T // D) // 128) * 128)
OWN = max(128, -(-2 * (T // D) // 128) * 128)
K = cfg.queue_size


@jax.jit
def v3_partition(pk, counts):
    valid = pk != scoring.PKEY_SENT
    h = (pk ^ (pk >> 15)) * jnp.int32(-1640531527)
    dest = jnp.where(valid, (h & jnp.int32(0x7FFFFFFF)) % D, 0)
    rank = jnp.zeros_like(pk)
    for d in range(D):
        m = valid & (dest == d)
        rank = jnp.where(m, scoring.blocked_cumsum(m.astype(jnp.int32)) - 1,
                         rank)
    slot = jnp.where(valid & (rank < B), dest * B + rank, D * B)
    sk = jnp.full((D * B + 1,), scoring.PKEY_SENT, jnp.int32).at[slot].set(
        jnp.where(valid, pk, scoring.PKEY_SENT), mode="drop")[:D * B]
    sc = jnp.zeros((D * B + 1,), jnp.int32).at[slot].set(
        jnp.where(valid, counts, 0), mode="drop")[:D * B]
    return sk, sc


@jax.jit
def v3_own_combine(fk, fc):
    fk, fc = jax.lax.sort((fk, fc), num_keys=1)
    m2 = fk.shape[0]
    idx = jnp.arange(m2, dtype=jnp.int32)
    bnd = jnp.concatenate([jnp.ones((1,), jnp.bool_), fk[1:] != fk[:-1]])
    head = bnd & (fk != scoring.PKEY_SENT)
    csum = scoring.blocked_cumsum(fc)
    nbp = scoring.blocked_cummin_reverse(jnp.where(bnd, idx, m2))
    nbp_excl = jnp.concatenate([nbp[1:], jnp.full((1,), m2, jnp.int32)])
    run_sum = (csum[jnp.minimum(nbp_excl - 1, m2 - 1)]
               - jnp.where(idx > 0, csum[jnp.maximum(idx - 1, 0)], 0))
    seg = scoring.blocked_cumsum(head.astype(jnp.int32)) - 1
    oslot = jnp.where(head, seg, m2)
    ok_u = jnp.full((m2 + 1,), scoring.PKEY_SENT, jnp.int32).at[oslot].set(
        fk, mode="drop")[:OWN]
    oc_u = jnp.zeros((m2 + 1,), jnp.int32).at[oslot].set(
        run_sum.astype(jnp.int32), mode="drop")[:OWN]
    return ok_u, oc_u


@jax.jit
def v3_score_topk(st, ok_u, oc_u):
    valid_u = ok_u != scoring.PKEY_SENT
    hi_u, lo_u = scoring.unpack_lex(ok_u)
    rows = jnp.where(valid_u, hi_u, 0)
    cols = jnp.where(valid_u, lo_u, 0)
    dists = L.distance(st.base.emb[rows], st.base.emb[cols],
                       st.base.curvature)
    dists = jnp.where(valid_u, dists, jnp.inf)
    score3 = E._full_scores(st, cfg, rows, cols, dists, oc_u)
    okc = valid_u & (oc_u >= cfg.min_pair_freq)
    score3 = jnp.where(okc[:, None], score3, -jnp.inf)
    tb = ok_u[None, :]
    return scoring.top_k_desc(score3[:, :1].T, K, tiebreak=tb)


@jax.jit
def v3_final_merge(tv, pk, dm):
    ftv, ftp = scoring.top_k_desc(tv, K, tiebreak=pk)
    fsel = jnp.minimum(ftp, tv.shape[1] - 1)
    return ftv, jnp.take_along_axis(pk, fsel, axis=1), \
        jnp.take_along_axis(dm, fsel, axis=1)


pk_full = scoring.pack_lex(tbl_full[0][:, 0], tbl_full[0][:, 1])
t_part, (sk, sc) = timeit(v3_partition, pk_full, tbl_full[1])
t_ownc, (ok_u, oc_u) = timeit(v3_own_combine, sk, sc)
t_sco, (tv1, tp1) = timeit(v3_score_topk, st_synced, ok_u, oc_u)
tvm = jnp.tile(tv1, (1, D))
pkm = jnp.tile(jnp.where(tv1 > -jnp.inf, jnp.take(
    ok_u, jnp.minimum(tp1, OWN - 1)), scoring.PKEY_SENT), (1, D))
dmm = jnp.zeros_like(tvm)
t_fin, _ = timeit(v3_final_merge, tvm, pkm, dmm)

cycle_v3 = t_local_8th + t_part + t_ownc + t_sco + t_fin + t_loop / D
print("\n--- v3 sharded sync decomposition (per-device work at D=8) ---")
print(f"t_local(N/8)      = {t_local_8th*1e3:.1f} ms   (scales 1/D)")
print(f"t_partition       = {t_part*1e3:.1f} ms   (O(T) per device)")
print(f"t_own_combine(2T) = {t_ownc*1e3:.1f} ms   (O(T) per device)")
print(f"t_score+topk(2T/D)= {t_sco*1e3:.1f} ms   (scales 1/D)")
print(f"t_final_merge(DK) = {t_fin*1e3:.1f} ms   (REPLICATED)")
print(f"v3 cycle at D=8   = {cycle_v3*1e3:.1f} ms vs old replicated "
      f"{(t_local_full + t_tail + t_loop)*1e3:.1f} ms")
print(f"v3 replicated share at D=8 = {t_fin / cycle_v3:.3f}")


# ------------------------------------------------- all-features v3 (round 5)
# VERDICT r4 #3 "Done" criterion: the ALL-FEATURES sharded config (dense
# channel + frequency + hierarchical + compression + adaptive curvature)
# measured < 10% replicated share at D=8. Same methodology: per-device
# piece timings at their real D=8 shapes. The extra feature work (PR=3
# queues, coherence, morphology) all rides the sharded scoring stage; the
# only replicated stage is still the K-sized final merge (now 3 phase rows).
tok_all = EnhancedHyperbolicTokenizer(
    vocab, emb, max_vocab_size=8192, merge_threshold=100.0,
    use_frequency_aware=True, alpha=0.4, beta=0.4, gamma=0.2,
    use_hierarchical=True, use_compression_aware=True,
    use_adaptive_curvature=True, optimize_curvature_freq=100,
    use_dense_channel=True, min_pair_freq=1, merge_batch=16,
    corpus_sample=lines, corpus_max_tokens=CORPUS_N, corpus_shards=8,
    seed=0)
st_all = jax.tree.map(jnp.array, tok_all.enh_state)
cfg_all = tok_all.enh_config
replay_all = scoring.batch_fixpoint_replay


@jax.jit
def local_part_all(corpus):
    c = replay_all(corpus, st_all.base.merges, st_all.corpus_synced,
                   st_all.base.num_merges - st_all.corpus_synced,
                   cfg_all.n_init)
    return c, scoring.build_pair_table(c, T)


@jax.jit
def finish_part_all(st, corpus, keys, counts, n_unique, max_count):
    return E._sync_finish(st, cfg_all, corpus, keys, counts, n_unique,
                          max_count)


@jax.jit
def v3_score_topk_all(st, ok_u, oc_u):
    valid_u = ok_u != scoring.PKEY_SENT
    hi_u, lo_u = scoring.unpack_lex(ok_u)
    rows = jnp.where(valid_u, hi_u, 0)
    cols = jnp.where(valid_u, lo_u, 0)
    dists = L.distance(st.base.emb[rows], st.base.emb[cols],
                       st.base.curvature)
    dists = jnp.where(valid_u, dists, jnp.inf)
    score3 = E._full_scores(st, cfg_all, rows, cols, dists, oc_u)
    okc = valid_u & (oc_u >= cfg_all.min_pair_freq)
    score3 = jnp.where(okc[:, None], score3, -jnp.inf)
    tb = jnp.broadcast_to(ok_u[None, :], (3, ok_u.shape[0]))
    return scoring.top_k_desc(score3.T, K, tiebreak=tb)


t_local_all_8th, (c8a, tbl8a) = timeit(local_part_all,
                                       st_all.corpus[:CORPUS_N // 8])
t_local_all_full, (cfa, tblfa) = timeit(local_part_all, st_all.corpus)
_, stall_synced = timeit(finish_part_all, st_all, cfa, tblfa[0], tblfa[1],
                         tblfa[2], tblfa[3])
pk_fa = scoring.pack_lex(tblfa[0][:, 0], tblfa[0][:, 1])
t_part_a, (ska, sca) = timeit(v3_partition, pk_fa, tblfa[1])
t_ownc_a, (ok_ua, oc_ua) = timeit(v3_own_combine, ska, sca)
t_sco_a, (tv3, tp3) = timeit(v3_score_topk_all, stall_synced, ok_ua, oc_ua)
tvm3 = jnp.tile(tv3, (1, D))
pkm3 = jnp.tile(jnp.where(tv3 > -jnp.inf, jnp.take(
    ok_ua, jnp.minimum(tp3, OWN - 1)), scoring.PKEY_SENT), (1, D))
dmm3 = jnp.zeros_like(tvm3)
t_fin_a, _ = timeit(v3_final_merge, tvm3, pkm3, dmm3)
t_loop_all, _ = timeit(
    lambda s: _enhanced_loop_jit(jax.tree.map(jnp.array, s), cfg_all, 256),
    stall_synced, reps=4)

cycle_v3_all = (t_local_all_8th + t_part_a + t_ownc_a + t_sco_a + t_fin_a
                + t_loop_all / D)
cycle_old_all = (t_local_all_full + t_combine + t_sco_a * D + t_fin_a
                 + t_loop_all)
print("\n--- ALL-FEATURES v3 decomposition (per-device work at D=8) ---")
print(f"t_local(N/8)      = {t_local_all_8th*1e3:.1f} ms   (scales 1/D)")
print(f"t_partition       = {t_part_a*1e3:.1f} ms   (O(T) per device)")
print(f"t_own_combine(2T) = {t_ownc_a*1e3:.1f} ms   (O(T) per device)")
print(f"t_score+topk(2T/D, PR=3) = {t_sco_a*1e3:.1f} ms   (scales 1/D)")
print(f"t_final_merge(3,DK) = {t_fin_a*1e3:.1f} ms   (REPLICATED)")
print(f"t_loop(256, all features) = {t_loop_all*1e3:.1f} ms (row-sharded)")
print(f"all-features v3 cycle at D=8 = {cycle_v3_all*1e3:.1f} ms")
print(f"all-features v3 replicated share at D=8 = "
      f"{t_fin_a / cycle_v3_all:.3f}")
