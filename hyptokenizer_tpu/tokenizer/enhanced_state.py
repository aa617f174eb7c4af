"""The enhanced (feature-scored) merge loop as a jitted device state machine.

Capability parity with ``EnhancedFastHyperbolicTokenizer``
(enhanced_fast_hyperbolic_merge.py:66-1427): frequency-aware scoring, semantic
coherence, compression-aware scoring, 3-phase hierarchical curriculum with
morphology boosts, and adaptive trainable curvature — composed as one scored
step, feature-flagged by a static config (the reference's inheritance diamond
becomes function composition; SURVEY §7.3).

Candidate architecture — two channels, both exact and device-resident:

* **dense (geometric) channel**: the global minimum-distance unmerged pair,
  maintained incrementally by tokenizer/search.py. Its representative is scored
  with the full feature formula each step.
* **sparse (corpus) channel**: every unique *adjacent token pair in the
  corpus* (the pairs a frequency/compression/morphology signal can exist for),
  fully scored when the pair-frequency snapshot is rebuilt at chunk
  boundaries. Pairs keep their corpus order — merging (a, b) creates the
  string a+b even when index(a) > index(b), which the reference's
  upper-triangular candidate representation cannot express (it always
  concatenates in index order, hyperbolic_merge.py:317-319).

Each step merges the better-scoring of the two channel winners. This realises
the reference's intended semantics — "score all candidates, pick the best
combined score" (enhanced_…:992-1013) — without its restriction to a
distance-first ANN pool: a high-frequency pair can win regardless of its
geometric rank. Remaining approximation: a pair that neither occurs in the
corpus nor is the distance argmin cannot win a step; in the reference such
pairs score alpha/(1+d) + phase-low-constant, which is maximised by the
distance argmin anyway (up to coherence noise).

Scoring formula parity (enhanced_…:903-990): cascading weight renormalisation,
phase-dependent morphology scores 0.8/0.2, 0.9/0.3, 1.0/0.4, sigmoid coherence
centred on the threshold, log1p-normalised frequency.

Adaptive curvature follows enhanced_…:637-792 (margin-ranking hierarchy loss +
anti-collapse/anti-spread distortion loss, Adam, clamp [0.1, 10]). Curvature
acts as a pure distance scale — the c=1 sheet with distances scaled by
1/sqrt(c) *is* curvature -c hyperbolic space — which makes the reference's
(broken for c != 1) re-projection unnecessary; DEVIATIONS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import scoring
from hyptokenizer_tpu.tokenizer.state import (
    MergeConfig, MergeState, merge_batch, merge_pair,
)

INF = jnp.inf
# Adaptive threshold growth cap: beyond this every finite distance passes,
# so further growth only degrades logs/coherence terms.
THRESHOLD_CAP = 1e6
GRAD_EPS = 1e-6  # acosh clamp for differentiable paths (ops/lorentz.py)


@struct.dataclass
class EnhancedConfig:
    """Static configuration (jit-hashable) for the scored loop."""

    base: MergeConfig = struct.field(
        pytree_node=False, default_factory=MergeConfig)
    n_init: int = struct.field(pytree_node=False, default=0)
    has_corpus: bool = struct.field(pytree_node=False, default=False)
    # Candidates consumed per step. >1 replicates the reference's
    # cache consume-on-read batching (fast_hyperbolic_merge.py:263-265):
    # the top-scored candidates of one search round merge without re-scoring.
    merge_batch: int = struct.field(pytree_node=False, default=8)
    # Corpus grounding. min_pair_freq: a sparse candidate needs at least this
    # many corpus occurrences. use_dense_channel=False restricts merges to
    # corpus pairs entirely (BPE-like; prevents the geometric chain-collapse
    # from filling the vocab tail once frequent pairs are exhausted).
    min_pair_freq: int = struct.field(pytree_node=False, default=1)
    use_dense_channel: bool = struct.field(pytree_node=False, default=True)
    # Corpus-replay order: False = the reference's tokenize() fixpoint
    # (leftmost-first); True = merge-rank order (classic BPE), which makes the
    # trained tokenizer's priority-mode encoder reproduce the training
    # tokenization exactly (scoring.batch_rank_replay).
    priority_replay: bool = struct.field(pytree_node=False, default=False)

    use_frequency: bool = struct.field(pytree_node=False, default=False)
    alpha: float = struct.field(pytree_node=False, default=0.4)
    beta: float = struct.field(pytree_node=False, default=0.4)
    gamma: float = struct.field(pytree_node=False, default=0.2)
    coherence_samples: int = struct.field(pytree_node=False, default=50)

    use_compression: bool = struct.field(pytree_node=False, default=False)
    compression_weight: float = struct.field(pytree_node=False, default=0.3)

    use_hierarchical: bool = struct.field(pytree_node=False, default=False)
    morphology_weight: float = struct.field(pytree_node=False, default=0.3)
    phase2_step: int = struct.field(pytree_node=False, default=1000)
    phase3_step: int = struct.field(pytree_node=False, default=6000)
    phase_thresholds: tuple = struct.field(
        pytree_node=False, default=(0.05, 0.1, 0.2))

    use_adaptive_curvature: bool = struct.field(pytree_node=False, default=False)
    curvature_freq: int = struct.field(pytree_node=False, default=100)
    curvature_lr: float = struct.field(pytree_node=False, default=0.01)
    hierarchy_weight: float = struct.field(pytree_node=False, default=1.0)
    distortion_weight: float = struct.field(pytree_node=False, default=0.5)
    curvature_min: float = struct.field(pytree_node=False, default=0.1)
    curvature_max: float = struct.field(pytree_node=False, default=10.0)
    hier_pairs: int = struct.field(pytree_node=False, default=100)
    hier_negatives: int = struct.field(pytree_node=False, default=10)
    distortion_samples: int = struct.field(pytree_node=False, default=500)

    freq_table_size: int = struct.field(pytree_node=False, default=1 << 17)

    @property
    def needs_corpus(self) -> bool:
        return self.has_corpus and (self.use_frequency or self.use_compression
                                    or self.use_hierarchical)

    def weights(self):
        """Cascaded feature weights (enhanced_…:945-977)."""
        if self.use_frequency:
            alpha, beta, gamma = self.alpha, self.beta, self.gamma
        else:
            alpha, beta, gamma = 0.7, 0.0, 0.0
        comp_w = 0.0
        if self.use_compression:
            comp_w = self.compression_weight
            alpha *= (1 - comp_w)
            beta *= (1 - comp_w)
            gamma *= (1 - comp_w)
        morph_w = 0.0
        if self.use_hierarchical:
            morph_w = self.morphology_weight
            alpha *= (1 - morph_w)
            beta *= (1 - morph_w)
            gamma *= (1 - morph_w)
            comp_w *= (1 - morph_w)
        return alpha, beta, gamma, comp_w, morph_w


@struct.dataclass
class EnhancedState:
    """Base merge state + corpus statistics + feature state (a pytree)."""

    base: MergeState
    key: jax.Array                 # PRNG for sampling-based scores/losses
    phase: jax.Array               # i32: 1/2/3 hierarchical phase

    # Corpus (token-id stream; PAD=-1 holes removed by compaction, SEP=-2
    # line separators) + pair-frequency snapshot.
    corpus: jax.Array              # (N,) i32
    corpus_synced: jax.Array       # i32 — merges already replayed onto corpus
    pair_keys: jax.Array           # (T,) u32 sorted (key = a*max_V+b)
    pair_counts: jax.Array         # (T,) i32
    max_pair_count: jax.Array      # i32
    pair_unique: jax.Array         # i32 — unique pairs BEFORE table clipping
                                   # (> T means the snapshot dropped pairs)

    # Sparse corpus-pair candidate channel (aligned with pair_keys).
    sp_dist: jax.Array             # (T,) f32 current-curvature distance
    sp_score: jax.Array            # (T, 3) f32 combined score per phase
    sp_consumed: jax.Array         # (T,) bool — pair already merged

    # Token hashes + features for device-side morphology checks.
    token_hash: jax.Array          # (max_V, 2) u32
    byte_lengths: jax.Array        # (max_V,) i32
    has_vowel: jax.Array           # (max_V,) bool — ORs under concatenation
    hash_powers: jax.Array         # (2, MAX_HASH_LEN) u32
    morph_table: jax.Array         # (Mm,) u32 sorted (padded 0xFFFFFFFF)
    morph_size: jax.Array          # i32
    word_table: jax.Array          # (Mw,) u32 sorted
    word_size: jax.Array           # i32

    # Adam state for the trainable curvature.
    curv_m: jax.Array              # f32
    curv_v: jax.Array              # f32
    curv_t: jax.Array              # i32
    curv_last: jax.Array           # i32 — num_merges at last curvature update


def phase_threshold(config: EnhancedConfig, phase: jax.Array) -> jax.Array:
    t = jnp.asarray(config.phase_thresholds, jnp.float32)
    return t[jnp.clip(phase - 1, 0, 2)]


@functools.partial(jax.jit, static_argnames=("max_v", "table_size"))
def assemble_enhanced_buffers(t_hash0, b_len0, vflag0, max_v: int,
                              table_size: int):
    """Pad initial-vocab token features to max_v and build the constant-fill
    pair-table buffers on device (one cacheable compile, ~no upload)."""
    n0 = t_hash0.shape[0]
    pair_keys = jnp.full((table_size,), jnp.uint32(0xFFFFFFFF))
    pair_counts = jnp.zeros((table_size,), jnp.int32)
    sp_dist = jnp.full((table_size,), INF, jnp.float32)
    sp_score = jnp.full((table_size, 3), -INF, jnp.float32)
    sp_consumed = jnp.zeros((table_size,), jnp.bool_)
    token_hash = jnp.zeros((max_v, 2), jnp.uint32).at[:n0].set(t_hash0)
    byte_lengths = jnp.zeros((max_v,), jnp.int32).at[:n0].set(b_len0)
    has_vowel = jnp.zeros((max_v,), jnp.bool_).at[:n0].set(vflag0)
    return (pair_keys, pair_counts, sp_dist, sp_score, sp_consumed,
            token_hash, byte_lengths, has_vowel)


# ----------------------------------------------------------------- features

def _coherence(emb, rows, cols, lengths, c, threshold, samples_idx):
    """Sigmoid semantic coherence of simulated merges (enhanced_…:291-346)."""
    xi = emb[rows]
    xj = emb[cols]
    w_j = (lengths[cols].astype(jnp.float32)
           / jnp.maximum(lengths[rows] + lengths[cols], 1).astype(jnp.float32))
    v = L.log_map(xi, xj)
    mid = L.exp_map(xi, w_j[:, None] * v)
    samp_emb = emb[samples_idx]
    dmat = L.pairwise_dist(mid, samp_emb, c, eps=GRAD_EPS)
    not_self = ((samples_idx[None, :] != rows[:, None])
                & (samples_idx[None, :] != cols[:, None]))
    cnt = jnp.maximum(jnp.sum(not_self, axis=1), 1)
    avg = jnp.sum(jnp.where(not_self, dmat, 0.0), axis=1) / cnt
    return 1.0 / (1.0 + jnp.exp(avg - threshold))


def _morph_scores(st: EnhancedState, rows, cols):
    """(n, 3) morphology score per phase for candidate pairs."""
    base = st.base
    len_i = base.lengths[rows]
    len_j = base.lengths[cols]
    p1 = jnp.where((len_i <= 2) & (len_j <= 2), 0.8, 0.2)
    merged_hash = scoring.compose_hash(
        st.token_hash[rows], st.token_hash[cols],
        st.byte_lengths[cols], st.hash_powers)
    mkey = scoring.pack_hash(merged_hash[..., 0], merged_hash[..., 1])
    is_morph = scoring.in_sorted_set(mkey, st.morph_table, st.morph_size)
    merged_vowel = st.has_vowel[rows] | st.has_vowel[cols]
    merged_len = len_i + len_j
    # Word validity = set membership OR the vowel fallback
    # (hierarchical_…:218-222): has_vowel ORs exactly under concatenation.
    is_word = (scoring.in_sorted_set(mkey, st.word_table, st.word_size)
               | ((merged_len >= 3) & merged_vowel))
    p2 = jnp.where(is_morph, 0.9, 0.3)
    p3 = jnp.where(is_word, 1.0, 0.4)
    return jnp.stack([p1, p2, p3], axis=-1)


def _full_scores(st: EnhancedState, config: EnhancedConfig, rows, cols,
                 dists, freqs, key):
    """(n, 3) combined score per phase with the reference's weight cascade."""
    base = st.base
    alpha, beta, gamma, comp_w, morph_w = config.weights()
    n = rows.shape[0]

    dist_score = 1.0 / (1.0 + dists)
    frequency_score = jnp.zeros((n,), jnp.float32)
    semantic = jnp.zeros((n,), jnp.float32)
    compression = jnp.zeros((n,), jnp.float32)

    if config.use_frequency:
        denom = jnp.log1p(jnp.maximum(st.max_pair_count, 1).astype(jnp.float32))
        frequency_score = jnp.log1p(freqs.astype(jnp.float32)) / jnp.maximum(
            denom, 1e-9)
        samp = jax.random.randint(key, (config.coherence_samples,), 0,
                                  jnp.maximum(base.vocab_size, 1))
        semantic = _coherence(base.emb, rows, cols, base.lengths,
                              base.curvature, base.threshold, samp)
    if config.use_compression:
        total = jnp.maximum(scoring.corpus_token_count(st.corpus), 1
                            ).astype(jnp.float32)
        ratio = total / jnp.maximum(total - freqs.astype(jnp.float32), 1.0)
        compression = jnp.clip(ratio - 1.0, 0.0, 1.0)

    score = (alpha * dist_score + beta * frequency_score + gamma * semantic
             + comp_w * compression)[:, None] * jnp.ones((1, 3))
    if config.use_hierarchical:
        score = score + morph_w * _morph_scores(st, rows, cols)
    return score


# --------------------------------------------------------------- curvature

def _curvature_losses(st: EnhancedState, config: EnhancedConfig,
                      key: jax.Array, c: jax.Array) -> jax.Array:
    """Hierarchy-preservation + distortion loss (enhanced_…:637-755)."""
    base = st.base
    k1, k2, k3 = jax.random.split(key, 3)
    emb = base.emb

    hp = config.hier_pairs
    hn = config.hier_negatives
    idx = jnp.arange(hp, dtype=jnp.int32)
    take = jnp.maximum(base.num_merges - hp, 0) + idx
    take = jnp.minimum(take, jnp.maximum(base.num_merges - 1, 0))
    valid_pair = idx < jnp.minimum(base.num_merges, hp)
    pi = base.merges[take, 0]
    pj = base.merges[take, 1]
    xi = emb[pi]
    xj = emb[pj]
    pair_d = L.distance(xi, xj, c, eps=GRAD_EPS)
    negs = jax.random.randint(k1, (hp, hn), 0, jnp.maximum(base.vocab_size, 1))
    neg_emb = emb[negs]
    d_i = L.distance(xi[:, None, :], neg_emb, c, eps=GRAD_EPS)
    d_j = L.distance(xj[:, None, :], neg_emb, c, eps=GRAD_EPS)
    not_self = (negs != pi[:, None]) & (negs != pj[:, None])
    margin = 0.1
    h_i = jnp.where(not_self, jax.nn.relu(pair_d[:, None] - d_i + margin), 0.0)
    h_j = jnp.where(not_self, jax.nn.relu(pair_d[:, None] - d_j + margin), 0.0)
    cnt = jnp.maximum(jnp.sum(not_self, axis=1), 1)
    per_pair = (jnp.sum(h_i, axis=1) + jnp.sum(h_j, axis=1)) / cnt
    n_eff = jnp.maximum(jnp.sum(valid_pair), 1)
    hier_loss = jnp.sum(jnp.where(valid_pair, per_pair, 0.0)) / (2 * n_eff)

    ds = config.distortion_samples
    ii = jax.random.randint(k2, (ds,), 0, jnp.maximum(base.vocab_size, 1))
    jj = jax.random.randint(k3, (ds,), 0, jnp.maximum(base.vocab_size, 1))
    dd = L.distance(emb[ii], emb[jj], c, eps=GRAD_EPS)
    keep = ii != jj
    cnt = jnp.maximum(jnp.sum(keep), 1)
    mean_d = jnp.sum(jnp.where(keep, dd, 0.0)) / cnt
    var_d = jnp.sum(jnp.where(keep, (dd - mean_d) ** 2, 0.0)) / cnt
    distortion = jnp.exp(-10.0 * mean_d) + 0.1 * var_d

    return (config.hierarchy_weight * hier_loss
            + config.distortion_weight * distortion)


def _maybe_update_curvature(st: EnhancedState, config: EnhancedConfig,
                            key: jax.Array) -> EnhancedState:
    """Adam step on curvature every ``curvature_freq`` merges."""
    if config.curvature_freq <= 0:
        return st

    def update(st):
        base = st.base
        loss_fn = lambda c: _curvature_losses(st, config, key, c)
        g = jax.grad(loss_fn)(base.curvature)
        t = st.curv_t + 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        m = b1 * st.curv_m + (1 - b1) * g
        v = b2 * st.curv_v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** t.astype(jnp.float32))
        vhat = v / (1 - b2 ** t.astype(jnp.float32))
        c_new = base.curvature - config.curvature_lr * mhat / (jnp.sqrt(vhat) + eps)
        c_new = jnp.clip(c_new, config.curvature_min, config.curvature_max)
        # Distances scale by 1/sqrt(c): rescale cached candidate distances
        # (both channels) instead of a full recompute — exact under the
        # distance-scale curvature model.
        scale = jnp.sqrt(base.curvature / c_new)
        best_dist = jnp.where(jnp.isfinite(base.best_dist),
                              base.best_dist * scale, base.best_dist)
        return st.replace(
            base=base.replace(curvature=c_new, best_dist=best_dist),
            sp_dist=st.sp_dist * scale,
            curv_m=m, curv_v=v, curv_t=t)

    # Keyed on merge count (== the reference's step counter when one merge
    # happens per step).
    do = (st.base.num_merges // config.curvature_freq) > \
         (st.curv_last // config.curvature_freq)
    st = jax.lax.cond(do, update, lambda s: s, st)
    return st.replace(curv_last=jnp.where(do, st.base.num_merges,
                                          st.curv_last))


# -------------------------------------------------------------------- step

def enhanced_step(st: EnhancedState, config: EnhancedConfig) -> EnhancedState:
    """One scored step: merge up to ``merge_batch`` candidates.

    Selection: the fully-scored dense (distance-argmin) representative plus
    the top sparse corpus pairs, ordered by combined score. Consuming several
    top candidates per round without re-scoring is the reference's candidate
    cache behavior (fast_hyperbolic_merge.py:63-133, 263-265).
    """
    base = st.base
    max_v = base.emb.shape[0]

    if config.use_hierarchical:
        # Phase = f(merge count): idempotent under batching
        # (transition steps {2:1000, 3:6000}; enhanced_…:1056-1066).
        thr_tab = jnp.asarray(config.phase_thresholds, jnp.float32)
        phase = (1 + (base.num_merges >= config.phase2_step).astype(jnp.int32)
                 + (base.num_merges >= config.phase3_step).astype(jnp.int32))
        changed = phase != st.phase
        base = base.replace(threshold=jnp.where(
            changed, thr_tab[jnp.clip(phase - 1, 0, 2)], base.threshold))
        st = st.replace(base=base, phase=phase)

    if config.use_adaptive_curvature:
        key, sub = jax.random.split(st.key)
        st = st.replace(key=key)
        st = _maybe_update_curvature(st, config, sub)
        base = st.base

    key, sub = jax.random.split(st.key)
    st = st.replace(key=key)
    pidx = jnp.clip(st.phase - 1, 0, 2)

    # Dense channel representative: global distance argmin, fully scored.
    di = jnp.argmin(base.best_dist).astype(jnp.int32)
    dd = base.best_dist[di]
    dj = base.best_j[di]
    dense_key = di.astype(jnp.uint32) * jnp.uint32(max_v) \
        + dj.astype(jnp.uint32)
    dense_freq = scoring.lookup_pair_counts(dense_key[None], st.pair_keys,
                                            st.pair_counts)[0]
    dense_score = _full_scores(st, config, di[None], dj[None], dd[None],
                               dense_freq[None], sub)[0][pidx]
    dense_valid = jnp.isfinite(dd) & (dd < base.threshold)
    if config.needs_corpus and not config.use_dense_channel:
        dense_valid = jnp.asarray(False)

    nb = max(1, config.merge_batch)
    if config.needs_corpus:
        sp_ok = (~st.sp_consumed) & (st.sp_dist < base.threshold)
        sp_vals = jnp.where(sp_ok, st.sp_score[:, pidx], -INF)
        top_vals, top_pos = jax.lax.top_k(sp_vals, nb)
        top_keys = st.pair_keys[top_pos]
        sp_i = (top_keys // jnp.uint32(max_v)).astype(jnp.int32)
        sp_j = (top_keys % jnp.uint32(max_v)).astype(jnp.int32)
        sp_d = st.sp_dist[top_pos]
        sp_valid = jnp.isfinite(top_vals) & (top_vals > -INF) & sp_ok[top_pos]
        # Dedupe: a sparse entry equal to the dense pair yields the same
        # merged token; keep the dense copy only.
        sp_valid = sp_valid & ~(dense_valid & (top_keys == dense_key))
    else:
        sp_i = jnp.zeros((nb,), jnp.int32)
        sp_j = jnp.zeros((nb,), jnp.int32)
        sp_d = jnp.full((nb,), INF, jnp.float32)
        top_vals = jnp.full((nb,), -INF, jnp.float32)
        top_pos = jnp.zeros((nb,), jnp.int32)
        sp_valid = jnp.zeros((nb,), jnp.bool_)

    # Combined batch (dense + sparse), ordered by score descending. The
    # sparse channel is already sorted (top_k); inserting the one dense
    # candidate is a vectorized insertion at its rank — an argsort here
    # costs ~100 us/step on TPU for a 17-element array.
    ds = jnp.where(dense_valid, dense_score, -INF)
    ss = jnp.where(sp_valid, top_vals, -INF)
    p = jnp.sum(ss > ds).astype(jnp.int32)  # stable: dense first on ties
    idx = jnp.arange(nb + 1, dtype=jnp.int32)
    sp_idx = jnp.clip(jnp.where(idx < p, idx, idx - 1), 0, nb - 1)
    take_dense = idx == p
    cand_i = jnp.where(take_dense, di, sp_i[sp_idx])
    cand_j = jnp.where(take_dense, dj, sp_j[sp_idx])
    cand_d = jnp.where(take_dense, dd, sp_d[sp_idx])
    cand_valid = jnp.where(take_dense, dense_valid, sp_valid[sp_idx])
    cand_valid = cand_valid & jnp.isfinite(cand_d)

    any_valid = jnp.any(cand_valid) & \
        (base.vocab_size < config.base.max_vocab_size)

    def do_merge(st):
        base0 = st.base
        prev_merges = base0.num_merges
        new_base = merge_batch(base0, cand_i, cand_j, cand_d, cand_valid)
        nb_done = new_base.num_merges - prev_merges
        # Slots actually assigned (order-preserving prefix of valid).
        rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
        applied = cand_valid & (rank < nb_done)
        slot = jnp.where(applied, base0.vocab_size + rank, max_v)
        # Token features for the new tokens (vectorised, drop-out-of-bounds).
        nh = scoring.compose_hash(st.token_hash[cand_i],
                                  st.token_hash[cand_j],
                                  st.byte_lengths[cand_j], st.hash_powers)
        token_hash = st.token_hash.at[slot].set(nh, mode="drop")
        byte_lengths = st.byte_lengths.at[slot].set(
            st.byte_lengths[cand_i] + st.byte_lengths[cand_j], mode="drop")
        has_vowel = st.has_vowel.at[slot].set(
            st.has_vowel[cand_i] | st.has_vowel[cand_j], mode="drop")
        # Consume the sparse entries of every applied ordered pair.
        mkey = (cand_i.astype(jnp.uint32) * jnp.uint32(max_v)
                + cand_j.astype(jnp.uint32))
        pos = jnp.minimum(jnp.searchsorted(st.pair_keys, mkey),
                          st.pair_keys.shape[0] - 1)
        hit = applied & (st.pair_keys[pos] == mkey)
        consumed = st.sp_consumed.at[jnp.where(hit, pos, st.sp_consumed.shape[0])
                                     ].set(True, mode="drop")
        return st.replace(base=new_base, sp_consumed=consumed,
                          token_hash=token_hash, byte_lengths=byte_lengths,
                          has_vowel=has_vowel)

    def no_merge(st):
        base = st.base
        empty = base.empty_rounds + 1
        if config.base.adaptive_threshold:
            grow = empty >= config.base.empty_growth_after
            thr = jnp.minimum(
                jnp.where(grow, base.threshold * config.base.empty_growth,
                          base.threshold), THRESHOLD_CAP)
            return st.replace(base=base.replace(
                threshold=thr, empty_rounds=jnp.where(grow, 0, empty)))
        stopped = empty >= config.base.empty_stop_after
        return st.replace(base=base.replace(empty_rounds=empty,
                                            stopped=stopped))

    prev_merges = st.base.num_merges
    st = jax.lax.cond(any_valid, do_merge, no_merge, st)
    base = st.base
    step = base.step + 1
    # Periodic threshold growth per merge count (fast_…:572-576).
    if config.base.adaptive_threshold and config.base.threshold_growth_every > 0:
        every = config.base.threshold_growth_every
        grow = (base.num_merges // every) > (prev_merges // every)
        thr = jnp.minimum(
            jnp.where(grow, base.threshold * config.base.threshold_growth,
                      base.threshold), THRESHOLD_CAP)
    else:
        thr = base.threshold
    full = base.vocab_size >= config.base.max_vocab_size
    return st.replace(base=base.replace(
        step=step, threshold=thr, stopped=base.stopped | full))


# ------------------------------------------------------------------- chunk

def sync_corpus(st: EnhancedState, config: EnhancedConfig) -> EnhancedState:
    """Replay un-synced merges onto the corpus; rebuild the pair table and the
    sparse candidate channel scores."""
    if not config.needs_corpus:
        return st
    base = st.base
    max_v = base.emb.shape[0]

    # Batched replay of the un-synced merge rules (a few O(N) passes instead
    # of one per merge): encode()-semantics leftmost-match by default, or
    # merge-rank order when the tokenizer encodes in priority mode.
    replay = (scoring.batch_rank_replay if config.priority_replay
              else scoring.batch_fixpoint_replay)
    corpus = replay(
        st.corpus, base.merges, st.corpus_synced,
        base.num_merges - st.corpus_synced, config.n_init, max_v)
    keys, counts, n_unique, max_count = scoring.build_pair_table(
        corpus, max_v, config.freq_table_size)

    st = st.replace(corpus=corpus, corpus_synced=base.num_merges,
                    pair_keys=keys, pair_counts=counts,
                    max_pair_count=max_count, pair_unique=n_unique)

    # Sparse channel: decode pairs, compute distances and full scores.
    # Self-pairs (a, a) are valid corpus candidates — 'aa' from adjacent
    # identical tokens (doubled letters etc.); their distance is ~0. Only the
    # reference's *geometric* candidate matrix excludes the diagonal (its
    # triu mask, hyperbolic_merge.py:258); corpus pairs are real occurrences.
    valid = keys != jnp.uint32(0xFFFFFFFF)
    rows = jnp.where(valid, (keys // jnp.uint32(max_v)).astype(jnp.int32), 0)
    cols = jnp.where(valid, (keys % jnp.uint32(max_v)).astype(jnp.int32), 0)
    dists = L.distance(base.emb[rows], base.emb[cols], base.curvature)
    dists = jnp.where(valid, dists, INF)

    key, sub = jax.random.split(st.key)
    score3 = _full_scores(st, config, rows, cols, dists,
                          counts, sub)
    ok = valid & (counts >= config.min_pair_freq)
    score3 = jnp.where(ok[:, None], score3, -INF)

    # Pairs already merged (any historical ordered pair) are consumed.
    hist_keys = jnp.where(
        jnp.arange(base.merges.shape[0]) < base.num_merges,
        base.merges[:, 0].astype(jnp.uint32) * jnp.uint32(max_v)
        + base.merges[:, 1].astype(jnp.uint32),
        jnp.uint32(0xFFFFFFFF))
    hist_sorted = jnp.sort(hist_keys)
    consumed = scoring.in_sorted_set(keys, hist_sorted,
                                     base.num_merges) & valid

    return st.replace(key=key, sp_dist=dists, sp_score=score3,
                      sp_consumed=consumed)


@functools.partial(jax.jit, static_argnames=("config", "n_steps"),
                   donate_argnames=("st",))
def run_enhanced(st: EnhancedState, config: EnhancedConfig,
                 n_steps: int) -> EnhancedState:
    """One chunk: sync corpus statistics, then merge up to ``n_steps`` tokens.

    ``n_steps`` caps *merges* (the reference's step counter advances one merge
    per step); loop iterations are additionally bounded so candidate-free
    threshold-adaptation rounds terminate.
    """
    st = sync_corpus(st, config)
    start_merges = st.base.num_merges
    start_step = st.base.step
    attempt_cap = n_steps + 1024

    def cond(s):
        return ((~s.base.stopped)
                & (s.base.num_merges - start_merges < n_steps)
                & (s.base.step - start_step < attempt_cap))

    return jax.lax.while_loop(cond, lambda s: enhanced_step(s, config), st)
