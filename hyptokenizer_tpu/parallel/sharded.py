"""Sharded merge training step.

The step function is the same pure ``merge_step`` as single-chip (state.py);
SPMD partitioning comes entirely from sharding annotations: XLA partitions the
row-dimension matvecs across the mesh and inserts the global-argmin collectives
(all-gather of per-shard minima — O(mesh) bytes, negligible), keeping the
embedding matrix distributed. This is the jax-native replacement for the
NCCL/torch.distributed layer the reference never had (SURVEY §2.6).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh

from hyptokenizer_tpu.parallel.mesh import shard_state, state_shardings
from hyptokenizer_tpu.tokenizer import state as state_lib
from hyptokenizer_tpu.tokenizer.state import MergeConfig, MergeState


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("state",))
def _run(state: MergeState, config: MergeConfig, n_steps) -> MergeState:
    start = state.step

    def cond(s):
        return (~s.stopped) & (s.step - start < n_steps)

    return jax.lax.while_loop(cond, lambda s: state_lib.merge_step(s, config), state)


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("st",))
def _run_enhanced(st, config, n_steps):
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    st = E.sync_corpus(st, config)
    return _enhanced_loop_body(st, config, n_steps)


def _enhanced_loop_body(st, config, n_steps: int):
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    start_merges = st.base.num_merges
    start_step = st.base.step
    attempt_cap = n_steps + 1024

    def cond(s):
        return ((~s.base.stopped) & (~s.needs_resync)
                & (s.base.num_merges - start_merges < n_steps)
                & (s.base.step - start_step < attempt_cap))

    return jax.lax.while_loop(cond, lambda s: E.enhanced_step(s, config), st)


@functools.lru_cache(maxsize=16)
def _sharded_sync_fn(mesh: Mesh, config):
    """Jitted corpus-sharded sync for (mesh, config): per-shard merge replay
    and pair-table build via shard_map (each device sorts its own N/S corpus
    slice instead of every device sorting the full array — the replicated
    serialization VERDICT r2 #5 measured at 78% of the chunk cycle), then a
    tiny replicated combine (scoring.merge_pair_tables) and the shared
    scoring/queue tail (enhanced_state._sync_finish)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from hyptokenizer_tpu.parallel.mesh import VOCAB_AXIS
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    from hyptokenizer_tpu.tokenizer import scoring

    replay = (scoring.batch_rank_replay if config.priority_replay
              else scoring.batch_fixpoint_replay)

    def local(corpus_shard, merges, synced, num_merges):
        c = replay(corpus_shard, merges, synced, num_merges - synced,
                   config.n_init)
        k, cnt, nu, mx = scoring.build_pair_table(
            c, config.freq_table_size, max_id=config.base.max_vocab_size)
        return c, k, cnt, nu[None], mx[None]

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P(VOCAB_AXIS), P(), P(), P()),
        out_specs=(P(VOCAB_AXIS), P(VOCAB_AXIS, None), P(VOCAB_AXIS),
                   P(VOCAB_AXIS), P(VOCAB_AXIS)),
        check_rep=False)

    @jax.jit
    def sync(st):
        corpus, keys, counts, nus, mxs = sm(
            st.corpus, st.base.merges, st.corpus_synced, st.base.num_merges)
        keys, counts, n_unique, max_count = scoring.merge_pair_tables(
            keys, counts, nus, config.freq_table_size,
            max_id=config.base.max_vocab_size)
        return E._sync_finish(st, config, corpus, keys, counts, n_unique,
                              max_count)

    return sync


@functools.lru_cache(maxsize=16)
def _sharded_sync_v3_fn(mesh: Mesh, config):
    """Fully-sharded sync for corpus-only configs (VERDICT r3 #6).

    The v2 sharded sync still ran the pair-table COMBINE (a D*T-row sort)
    and the scoring/queue tail replicated on every device — measured at
    ~98% of the chunk cycle at D=8 on the profile workload
    (tools/profile_sync_fraction.py). Here every T-sized stage shards:

      1. per-shard replay + pair count (as v2),
      2. hash-partition of pair keys + all_to_all: each device OWNS a
         disjoint key subset; combining is a local (2T/D-row) sort,
      3. scoring + top-K on owned keys only (emb all-gathered once),
      4. a K-sized replicated merge of the D per-device candidate lists.

    Bit-identical to the single-device sync when no table overflows: scores
    are computed with the same elementwise formula on the same values, and
    every top-K stage tie-breaks by the packed pair key, which equals the
    single-device sorted-table-position order (scoring.top_k_desc's
    tiebreak mode). The state pair table is materialized in hash-partition
    order (D per-owner sorted slices); corpus-only configs never read it
    mid-chunk (the next sync rebuilds from the corpus), and dense-channel
    configs read it through scoring.lookup_pair_counts_hashed — the
    sharded wrapper marks the loop config with ``pair_table_hashed=D``
    (VERDICT r4 #3).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    import jax.numpy as jnp

    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.parallel.mesh import VOCAB_AXIS
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    from hyptokenizer_tpu.tokenizer import scoring

    D = int(mesh.devices.size)
    T = config.freq_table_size
    B = max(128, -(-2 * (T // D) // 128) * 128)  # per-(src,dest) bucket cap
    K = config.queue_size
    PR = 3 if config.use_hierarchical else 1
    TD = T // D
    SENT = scoring.PKEY_SENT
    INF = jnp.inf
    replay = (scoring.batch_rank_replay if config.priority_replay
              else scoring.batch_fixpoint_replay)
    max_v = config.base.max_vocab_size

    def local(corpus_shard, merges, synced, num_merges, emb_sh, len_sh,
              thr, curv, samp, th_sh, bl_sh, vw_sh, powers,
              morph, msize, word, wsize):
        # 1. per-shard replay + pair count.
        c = replay(corpus_shard, merges, synced, num_merges - synced,
                   config.n_init)
        keys, counts, nu, _mx = scoring.build_pair_table(c, T, max_id=max_v)
        pk = scoring.pack_lex(keys[:, 0], keys[:, 1])
        valid = pk != SENT

        # 2. hash-partition (dest uniform in the key, independent of the
        # key ORDER so ownership balances statistically). scoring.pair_dest
        # is the single source of truth: the in-loop hashed lookup
        # (dense channel) must address the same owner slices.
        dest = jnp.where(valid, scoring.pair_dest(pk, D), 0)
        rank = jnp.zeros_like(pk)
        for d in range(D):
            m = valid & (dest == d)
            rank = jnp.where(
                m, scoring.blocked_cumsum(m.astype(jnp.int32)) - 1, rank)
        send_overflow = jnp.any(valid & (rank >= B))
        slot = jnp.where(valid & (rank < B), dest * B + rank, D * B)
        sk = jnp.full((D * B + 1,), SENT, jnp.int32).at[slot].set(
            jnp.where(valid, pk, SENT), mode="drop")[:D * B]
        sc = jnp.zeros((D * B + 1,), jnp.int32).at[slot].set(
            jnp.where(valid, counts, 0), mode="drop")[:D * B]
        rk = jax.lax.all_to_all(sk.reshape(D, B), VOCAB_AXIS, 0, 0)
        rc = jax.lax.all_to_all(sc.reshape(D, B), VOCAB_AXIS, 0, 0)

        # 3a. owned combine: sort received entries by key, sum runs.
        fk, fc = jax.lax.sort((rk.reshape(D * B), rc.reshape(D * B)),
                              num_keys=1)
        m2 = D * B
        idx = jnp.arange(m2, dtype=jnp.int32)
        bnd = jnp.concatenate([jnp.ones((1,), jnp.bool_), fk[1:] != fk[:-1]])
        head = bnd & (fk != SENT)
        csum = scoring.blocked_cumsum(fc)
        nbp = scoring.blocked_cummin_reverse(jnp.where(bnd, idx, m2))
        nbp_excl = jnp.concatenate([nbp[1:], jnp.full((1,), m2, jnp.int32)])
        run_sum = (csum[jnp.minimum(nbp_excl - 1, m2 - 1)]
                   - jnp.where(idx > 0, csum[jnp.maximum(idx - 1, 0)], 0))
        seg = scoring.blocked_cumsum(head.astype(jnp.int32)) - 1
        oslot = jnp.where(head, seg, m2)
        # Owned uniques are head-packed; score only the first OWN_CAP slots
        # (expected fill T/D under the uniform hash — OWN_CAP = 2T/D leaves
        # 2x headroom; beyond-cap spill raises the overflow signal).
        own_cap = max(128, -(-2 * TD // 128) * 128)
        ok_u = jnp.full((m2 + 1,), SENT, jnp.int32).at[oslot].set(
            fk, mode="drop")[:own_cap]
        oc_u = jnp.zeros((m2 + 1,), jnp.int32).at[oslot].set(
            run_sum.astype(jnp.int32), mode="drop")[:own_cap]
        n_own = jnp.sum(head.astype(jnp.int32))
        own_overflow = n_own > own_cap

        # 3b. global statistics (exact: owned key sets are disjoint).
        overflow = jax.lax.pmax(
            (send_overflow | own_overflow | (nu > T)
             | (n_own > TD)).astype(jnp.int32),
            VOCAB_AXIS) > 0
        n_unique = jax.lax.psum(n_own, VOCAB_AXIS)
        n_unique = jnp.where(overflow,
                             jnp.maximum(n_unique, T + 1), n_unique)
        max_count = jax.lax.pmax(jnp.max(oc_u), VOCAB_AXIS)
        corpus_tokens = jax.lax.psum(scoring.corpus_token_count(c),
                                     VOCAB_AXIS)

        # 3c. score owned keys (embedding table gathered once per sync).
        emb_full = jax.lax.all_gather(emb_sh, VOCAB_AXIS, axis=0, tiled=True)
        len_full = jax.lax.all_gather(len_sh, VOCAB_AXIS, axis=0, tiled=True)
        th_full = jax.lax.all_gather(th_sh, VOCAB_AXIS, axis=0, tiled=True)
        bl_full = jax.lax.all_gather(bl_sh, VOCAB_AXIS, axis=0, tiled=True)
        vw_full = jax.lax.all_gather(vw_sh, VOCAB_AXIS, axis=0, tiled=True)
        hi_u, lo_u = scoring.unpack_lex(ok_u)
        valid_u = ok_u != SENT
        rows = jnp.where(valid_u, hi_u, 0)
        cols = jnp.where(valid_u, lo_u, 0)
        dists = L.distance(emb_full[rows], emb_full[cols], curv)
        dists = jnp.where(valid_u, dists, INF)
        score3 = E._full_scores_raw(
            config, emb_full, len_full, thr, curv, samp,
            max_count, corpus_tokens, th_full, bl_full,
            vw_full.astype(jnp.bool_), powers, morph, msize, word, wsize,
            rows, cols, dists, oc_u)
        okc = valid_u & (oc_u >= config.min_pair_freq)
        if config.base.max_token_len > 0:
            okc &= (len_full[rows] + len_full[cols]
                    <= config.base.max_token_len)
        score3 = jnp.where(okc[:, None], score3, -INF)
        qv = jax.lax.psum(
            jnp.sum((score3 > -INF).astype(jnp.int32), axis=0), VOCAB_AXIS)

        # 3d. local top-K over owned keys, tie-break = packed key (== the
        # single-device sorted-table position order).
        if config.use_hierarchical:
            sv = score3.T                                  # (3, own_cap)
        else:
            sv = score3[:, :1].T                           # (1, own_cap)
        tb = jnp.broadcast_to(ok_u[None, :], (PR, own_cap))
        tv, tp = scoring.top_k_desc(sv, K, tiebreak=tb)
        sel = jnp.minimum(tp, own_cap - 1)
        found = tv > -INF
        sel_pk = jnp.where(found, jnp.take(ok_u, sel), SENT)
        sel_d = jnp.where(found, jnp.take(dists, sel), INF)

        # State pair table: first T/D owned uniques per device (key order;
        # hash-partition layout). Content-complete only when every device
        # owns <= T/D uniques; per-device hash imbalance beyond T/D raises
        # the `overflow` signal (3b includes n_own > TD), which surfaces as
        # the host-side pair-table warning — a post-v3 save()'s
        # frequencies.json export is best-effort under that warning (the
        # LOOP is unaffected: corpus-only mode rebuilds from the corpus at
        # the next sync and never reads this table). (ADVICE r4 #2)
        return (c, tv[None], sel_pk[None], sel_d[None], qv,
                n_unique, max_count, corpus_tokens,
                ok_u[:TD], oc_u[:TD])

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P(VOCAB_AXIS), P(), P(), P(), P(VOCAB_AXIS, None),
                  P(VOCAB_AXIS), P(), P(), P(), P(VOCAB_AXIS, None),
                  P(VOCAB_AXIS), P(VOCAB_AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(VOCAB_AXIS),
                   P(VOCAB_AXIS, None, None), P(VOCAB_AXIS, None, None),
                   P(VOCAB_AXIS, None, None),
                   P(), P(), P(), P(),
                   P(VOCAB_AXIS), P(VOCAB_AXIS)),
        check_rep=False)

    @jax.jit
    def sync(st):
        key, sub = jax.random.split(st.key)
        samp = jax.random.randint(sub, (config.coherence_samples,), 0,
                                  jnp.maximum(st.base.vocab_size, 1))
        (corpus, tv, pkm, dm, qv, n_unique, max_count, corpus_tokens,
         sk, sc) = sm(st.corpus, st.base.merges, st.corpus_synced,
                      st.base.num_merges, st.base.emb, st.base.lengths,
                      st.base.threshold, st.base.curvature, samp,
                      st.token_hash, st.byte_lengths,
                      st.has_vowel.astype(jnp.int32), st.hash_powers,
                      st.morph_table, st.morph_size, st.word_table,
                      st.word_size)
        # 4. replicated K-sized merge of the D candidate lists.
        q_i, q_j, q_dist, q_score = _merge_topk_lists(tv, pkm, dm, D, K, PR)
        keys2 = jnp.stack(scoring.unpack_lex(sk), axis=-1)
        return st.replace(
            key=key, coh_samples=samp, corpus=corpus,
            corpus_synced=st.base.num_merges, corpus_tokens=corpus_tokens,
            pair_keys=keys2, pair_counts=sc,
            max_pair_count=max_count, pair_unique=n_unique,
            q_i=q_i, q_j=q_j, q_dist=q_dist, q_score=q_score,
            q_valid_total=qv,
            needs_resync=jnp.asarray(False))

    return sync


def _merge_topk_lists(tv, pkm, dm, D: int, K: int, PR: int):
    """Replicated K-sized merge of D per-device candidate top-K lists.

    Inputs are the shard_map outputs stacked on the device axis:
    tv/pkm/dm of shape (D, PR, K) — scores, packed pair keys, distances.
    Tie-breaks by packed key == single-device sorted-table-position order,
    so the merged queues are bit-identical to the unsharded sync's.
    Returns (q_i, q_j, q_dist, q_score) each (3, K) (single-phase PR=1
    results broadcast to the 3 phase rows, as enhanced_state._sync_finish).
    """
    import jax.numpy as jnp

    from hyptokenizer_tpu.tokenizer import scoring

    INF = jnp.inf
    SENT = scoring.PKEY_SENT
    tvf = jnp.transpose(tv, (1, 0, 2)).reshape(PR, D * K)
    pkf = jnp.transpose(pkm, (1, 0, 2)).reshape(PR, D * K)
    dmf = jnp.transpose(dm, (1, 0, 2)).reshape(PR, D * K)
    ftv, ftp = scoring.top_k_desc(tvf, K, tiebreak=pkf)
    fsel = jnp.minimum(ftp, D * K - 1)
    fpk = jnp.take_along_axis(pkf, fsel, axis=1)
    fd = jnp.take_along_axis(dmf, fsel, axis=1)
    stored = ftv > -INF
    hi, lo = scoring.unpack_lex(jnp.where(stored, fpk, jnp.int32(SENT)))
    q_i = jnp.where(stored, hi, -1)
    q_j = jnp.where(stored, lo, -1)
    q_dist = jnp.where(stored, fd, INF)
    q_score = ftv
    if PR == 1:
        q_i = jnp.broadcast_to(q_i, (3, K))
        q_j = jnp.broadcast_to(q_j, (3, K))
        q_dist = jnp.broadcast_to(q_dist, (3, K))
        q_score = jnp.broadcast_to(q_score, (3, K))
    return q_i, q_j, q_dist, q_score


@functools.lru_cache(maxsize=16)
def _sharded_sync_frozen_fn(mesh: Mesh, config):
    """Sharded queue rebuild for FROZEN-frequency configs (VERDICT r4 #3).

    Loaded-artifact tokenizers (enhanced ``load()`` without a corpus) keep
    one static lex-sorted pair table for the whole run; each chunk's sync
    only re-scores it against the current embeddings/curvature/threshold
    and rebuilds the candidate queues (enhanced_state._sync_finish's frozen
    branch). That scoring + top-K is the whole cycle and shards by table
    rows: each device scores its contiguous T/D slice and selects a local
    top-K (tie-break = packed key, which equals the lex-table position
    order the single-device path breaks ties by), then the same K-sized
    replicated merge as v3. The consumed-history membership join's sort
    stays replicated (V-sized, vs the T-sized sharded scoring); the
    membership *checks* shard with the rows.

    This path also closes a pre-round-5 sharded-frozen corruption: the v2
    sharded sync unconditionally replayed the (dummy) corpus and rebuilt
    the pair table from it, silently zeroing restored frequencies — frozen
    configs that cannot take this path now use the replicated sync instead
    of v2 (run_enhanced_sharded gate).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    import jax.numpy as jnp

    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.parallel.mesh import VOCAB_AXIS
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    from hyptokenizer_tpu.tokenizer import scoring

    D = int(mesh.devices.size)
    K = config.queue_size
    PR = 3 if config.use_hierarchical else 1
    SENT = scoring.PKEY_SENT
    INF = jnp.inf

    def local(keys_sl, counts_sl, emb_sh, len_sh, thr, curv, samp,
              th_sh, bl_sh, vw_sh, powers, morph, msize, word, wsize,
              hist_hi, hist_lo, n_hist, max_count, corpus_tokens):
        emb_full = jax.lax.all_gather(emb_sh, VOCAB_AXIS, axis=0, tiled=True)
        len_full = jax.lax.all_gather(len_sh, VOCAB_AXIS, axis=0, tiled=True)
        th_full = jax.lax.all_gather(th_sh, VOCAB_AXIS, axis=0, tiled=True)
        bl_full = jax.lax.all_gather(bl_sh, VOCAB_AXIS, axis=0, tiled=True)
        vw_full = jax.lax.all_gather(vw_sh, VOCAB_AXIS, axis=0, tiled=True)
        khi = keys_sl[:, 0]
        klo = keys_sl[:, 1]
        valid = khi != SENT
        rows = jnp.where(valid, khi, 0)
        cols = jnp.where(valid, klo, 0)
        dists = L.distance(emb_full[rows], emb_full[cols], curv)
        dists = jnp.where(valid, dists, INF)
        score3 = E._full_scores_raw(
            config, emb_full, len_full, thr, curv, samp, max_count,
            corpus_tokens, th_full, bl_full, vw_full.astype(jnp.bool_),
            powers, morph, msize, word, wsize, rows, cols, dists, counts_sl)
        ok = valid & (counts_sl >= config.min_pair_freq)
        if config.base.max_token_len > 0:
            ok &= (len_full[rows] + len_full[cols]
                   <= config.base.max_token_len)
        consumed = scoring.in_sorted_pair_set(
            khi, klo, hist_hi, hist_lo, n_hist) & valid
        score3 = jnp.where((ok & ~consumed)[:, None], score3, -INF)
        qv = jax.lax.psum(
            jnp.sum((score3 > -INF).astype(jnp.int32), axis=0), VOCAB_AXIS)
        pk = scoring.pack_lex(khi, klo)
        sv = score3.T if config.use_hierarchical else score3[:, :1].T
        tb = jnp.broadcast_to(pk[None, :], (PR, pk.shape[0]))
        tv, tp = scoring.top_k_desc(sv, K, tiebreak=tb)
        sel = jnp.minimum(tp, pk.shape[0] - 1)
        found = tv > -INF
        sel_pk = jnp.where(found, jnp.take(pk, sel), SENT)
        sel_d = jnp.where(found, jnp.take(dists, sel), INF)
        return tv[None], sel_pk[None], sel_d[None], qv

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P(VOCAB_AXIS, None), P(VOCAB_AXIS), P(VOCAB_AXIS, None),
                  P(VOCAB_AXIS), P(), P(), P(), P(VOCAB_AXIS, None),
                  P(VOCAB_AXIS), P(VOCAB_AXIS), P(), P(), P(), P(), P(),
                  P(), P(), P(), P(), P()),
        out_specs=(P(VOCAB_AXIS, None, None), P(VOCAB_AXIS, None, None),
                   P(VOCAB_AXIS, None, None), P()),
        check_rep=False)

    @jax.jit
    def sync(st):
        key, sub = jax.random.split(st.key)
        samp = jax.random.randint(sub, (config.coherence_samples,), 0,
                                  jnp.maximum(st.base.vocab_size, 1))
        base = st.base
        in_hist = jnp.arange(base.merges.shape[0]) < base.num_merges
        hist_hi = jnp.where(in_hist, base.merges[:, 0], scoring.PKEY_SENT)
        hist_lo = jnp.where(in_hist, base.merges[:, 1], scoring.PKEY_SENT)
        hist_hi, hist_lo = jax.lax.sort((hist_hi, hist_lo), num_keys=2)
        tv, pkm, dm, qv = sm(
            st.pair_keys, st.pair_counts, base.emb, base.lengths,
            base.threshold, base.curvature, samp, st.token_hash,
            st.byte_lengths, st.has_vowel.astype(jnp.int32), st.hash_powers,
            st.morph_table, st.morph_size, st.word_table, st.word_size,
            hist_hi, hist_lo, base.num_merges, st.max_pair_count,
            st.corpus_tokens)
        q_i, q_j, q_dist, q_score = _merge_topk_lists(tv, pkm, dm, D, K, PR)
        # Frozen: table, counts, corpus, corpus_tokens all unchanged.
        return st.replace(
            key=key, coh_samples=samp, corpus_synced=base.num_merges,
            q_i=q_i, q_j=q_j, q_dist=q_dist, q_score=q_score,
            q_valid_total=qv, needs_resync=jnp.asarray(False))

    return sync


def _corpus_shard_aligned(st, n_dev: int) -> bool:
    """True when every corpus shard boundary lands on PAD/SEP (so per-shard
    pair counting is exact). One tiny device gather; see
    utils/data.shard_align_corpus."""
    import jax.numpy as jnp

    n = st.corpus.shape[0]
    if n_dev <= 1:
        return True
    if n % n_dev != 0:
        return False
    import numpy as np
    idx = jnp.asarray([k * (n // n_dev) - 1 for k in range(1, n_dev)])
    vals = np.asarray(st.corpus[idx])
    return bool(np.all(vals < 0))


def select_sync_path(st, config, mesh: Mesh) -> str:
    """Which sync implementation a sharded enhanced run will use.

    * ``"v3"`` — fully-sharded hash-partitioned sync (live corpus; includes
      dense-channel configs since round 5, whose loop then reads the table
      through the hashed-layout lookup),
    * ``"v3f"`` — sharded re-scoring of the static frozen table,
    * ``"v2"`` — per-shard replay + replicated combine/tail (oversized
      vocabs or a table size not divisible by the mesh),
    * ``"replicated"`` — unsharded sync (unaligned corpus, or a frozen
      config the v3f gate rejects: the v2 sync would rebuild — and zero —
      the restored table from the dummy corpus).

    Exposed so tests and the driver dryrun can assert the path they mean to
    exercise instead of duplicating the gate conditions.
    """
    from hyptokenizer_tpu.tokenizer import scoring as _scoring

    aligned = (config.needs_corpus
               and _corpus_shard_aligned(st, mesh.devices.size))
    if not aligned:
        return "replicated"
    # pack_lex keys (hash partition, combine sort, tie-breaks, hashed
    # lookup) are only injective/order-preserving for ids <= PACK_MAX_ID-1,
    # so oversized vocabs fall back to the v2 sharded sync (ADVICE r4 #1).
    eligible = (config.base.max_vocab_size <= _scoring.PACK_MAX_ID
                and config.freq_table_size % mesh.devices.size == 0)
    if config.frozen_freqs:
        return "v3f" if eligible else "replicated"
    return "v3" if eligible else "v2"


def run_enhanced_sharded(st, config, n_steps: int, mesh: Mesh):
    """Sharded chunk of the enhanced scored loop (flagship multi-chip path).

    The corpus-dimension sync work (merge replay + pair counting) runs
    per-shard via shard_map when the corpus layout is shard-aligned
    (EnhancedHyperbolicTokenizer(corpus_shards=N)); otherwise it falls back
    to the replicated sync, which is correct but serializes ~80% of the
    chunk cycle (tools/profile_sync_fraction.py).
    """
    from hyptokenizer_tpu.parallel.mesh import shard_enhanced_state
    if st.base.emb.shape[0] % mesh.devices.size != 0:
        raise ValueError("max_vocab_size not divisible by mesh size")
    path = select_sync_path(st, config, mesh)
    sharded_sync = path != "replicated"
    use_v3 = path == "v3"
    use_v3f = path == "v3f"
    loop_config = config
    if use_v3 and config.use_dense_channel:
        loop_config = config.replace(
            pair_table_hashed=int(mesh.devices.size))
    st = shard_enhanced_state(st, mesh)
    # Same (sync -> merge -> resync) pacing as the single-device
    # enhanced_state.run_enhanced: queue exhaustion mid-chunk triggers a
    # fresh sync here, so the two paths' chunk accounting and merge
    # sequences stay identical.
    remaining = n_steps
    before = int(st.base.num_merges)
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    with mesh:
        while True:
            E.DISPATCH_ROUNDS += 1
            if sharded_sync:
                sync_fn = (_sharded_sync_frozen_fn if use_v3f
                           else _sharded_sync_v3_fn if use_v3
                           else _sharded_sync_fn)
                st = sync_fn(mesh, config)(st)
                st = _enhanced_loop_jit(st, loop_config, remaining)
            else:
                st = _run_enhanced(st, config, remaining)
            now = int(st.base.num_merges)
            remaining -= now - before
            before = now
            if remaining <= 0 or bool(st.base.stopped):
                break
            if not bool(st.needs_resync):
                break  # candidate drought / attempt cap: caller decides
    return shard_enhanced_state(st, mesh)


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("st",))
def _enhanced_loop_jit(st, config, n_steps):
    return _enhanced_loop_body(st, config, n_steps)


def run_embed_train_sharded(emb0, corpus, vocab_size, key, mesh: Mesh,
                            **kw):
    """RSGD embedding pretraining with the table and corpus row-sharded.

    Same jitted scan as tokenizer/embed_train.py; XLA partitions the batched
    gathers/scatter-adds across the mesh (the gradient all-reduce rides the
    collectives XLA inserts). BASELINE config 5: 'Riemannian embedding
    updates + count psum across N>=2 hosts'.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hyptokenizer_tpu.parallel.mesh import VOCAB_AXIS
    from hyptokenizer_tpu.tokenizer.embed_train import train_embeddings

    row2d = NamedSharding(mesh, P(VOCAB_AXIS, None))
    row1d = NamedSharding(mesh, P(VOCAB_AXIS))
    emb0 = jax.device_put(jnp.asarray(emb0), row2d)
    corpus = jax.device_put(jnp.asarray(corpus), row1d)
    with mesh:
        return train_embeddings(emb0, corpus, vocab_size, key, **kw)


def run_merges_sharded(state: MergeState, config: MergeConfig, n_steps: int,
                       mesh: Mesh) -> MergeState:
    """Run ``n_steps`` merge steps with the state sharded over ``mesh``.

    The input state may be unsharded (it will be placed); the output keeps the
    mesh shardings, so chained calls don't re-shard.
    """
    if state.emb.shape[0] % mesh.devices.size != 0:
        raise ValueError(
            f"max_vocab_size {state.emb.shape[0]} not divisible by mesh size "
            f"{mesh.devices.size}; use parallel.mesh.pad_vocab_for_mesh")
    state = shard_state(state, mesh)
    with mesh:
        out = _run(state, config, n_steps)
    # jit propagates input shardings; re-assert canonical placement so chained
    # calls and host reads see the expected layout (no-op when already there).
    return shard_state(out, mesh)
