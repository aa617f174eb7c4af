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

Sparse-channel representation: per-phase **score-sorted candidate queues**
(top ``queue_size`` by combined score, built at each corpus sync). Because
within-chunk scores are frozen, the per-step top-k over the whole pair table
reduces to taking the first still-valid entries of a sorted queue — the exact
device-side analogue of the reference's bounded candidate cache with
consume-on-read (fast_hyperbolic_merge.py:63-133, 263-265). Consumption
-INFs matching queue entries across all phases; when a partially-consumed
truncated queue can no longer fill a batch, the chunk ends with
``needs_resync`` and the next chunk rebuilds everything (fresher statistics
than the full-table scan would have used). Coherence sampling is per-chunk
(one 50-token sample set drawn at sync, used by every candidate scored in
that chunk) — the reference redraws per candidate, which only changes the
noise realisation of its sigmoid term.

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
    MergeConfig, MergeState, merge_batch,
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

    # Loaded-artifact mode (enhanced load() without a corpus): the pair table
    # was restored from frequencies.json and there is no corpus to replay —
    # sync keeps the restored counts frozen (exactly the reference's
    # continued-training behavior: it freezes host-dict frequencies for a
    # whole run, enhanced_…:266-290) while still rebuilding queue scores
    # against the current embeddings/curvature each chunk.
    frozen_freqs: bool = struct.field(pytree_node=False, default=False)

    # Pair-table layout the LOOP should assume: 0/1 = one lex-sorted table
    # (build_pair_table); D > 1 = the v3 sharded sync's hash-partitioned
    # layout (D per-owner slices, each sorted — scoring.pair_dest). Only the
    # dense channel's per-step frequency lookup consults this; the sharded
    # wrapper sets it on the config it hands the loop after a v3 sync
    # (VERDICT r4 #3: dense-channel configs on the v3 path).
    pair_table_hashed: int = struct.field(pytree_node=False, default=0)

    freq_table_size: int = struct.field(pytree_node=False, default=1 << 17)
    # Sparse-channel candidate queue length per phase (top-k by score at each
    # sync). Large enough that a chunk rarely exhausts it; exhaustion is
    # handled by an early resync, not an error.
    queue_size: int = struct.field(pytree_node=False, default=4096)

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
    corpus_tokens: jax.Array       # i32 — live token count at last sync
    pair_keys: jax.Array           # (T, 2) i32 lex-sorted (lanes = left id,
                                   # right id — exact at any vocab size)
    pair_counts: jax.Array         # (T,) i32
    max_pair_count: jax.Array      # i32
    pair_unique: jax.Array         # i32 — unique pairs BEFORE table clipping
                                   # (> T means the snapshot dropped pairs)

    # Sparse corpus-pair candidate queues: per phase, the top ``queue_size``
    # candidates by combined score, sorted descending (consume-on-read).
    q_i: jax.Array                 # (3, K) i32 left id (-1 empty)
    q_j: jax.Array                 # (3, K) i32 right id
    q_dist: jax.Array              # (3, K) f32 distance at sync curvature
    q_score: jax.Array             # (3, K) f32 score; -INF = empty/consumed
    q_valid_total: jax.Array       # (3,) i32 valid candidates in FULL table
                                   # at sync (> K means the queue truncated)
    needs_resync: jax.Array        # bool — queue exhausted; end the chunk
    coh_samples: jax.Array         # (S,) i32 per-chunk coherence sample ids

    # Token hashes + features for device-side morphology checks.
    token_hash: jax.Array          # (max_V, 2) i32
    byte_lengths: jax.Array        # (max_V,) i32
    has_vowel: jax.Array           # (max_V,) bool — ORs under concatenation
    hash_powers: jax.Array         # (2, MAX_HASH_LEN) i32
    morph_table: jax.Array         # (Mm,) i32 sorted (padded HKEY_SENT)
    morph_size: jax.Array          # i32
    word_table: jax.Array          # (Mw,) i32 sorted
    word_size: jax.Array           # i32

    # Adam state for the trainable curvature.
    curv_m: jax.Array              # f32
    curv_v: jax.Array              # f32
    curv_t: jax.Array              # i32
    curv_last: jax.Array           # i32 — num_merges at last curvature update


@functools.partial(jax.jit,
                   static_argnames=("max_v", "table_size", "queue_size",
                                    "coh_samples"))
def assemble_enhanced_buffers(t_feat, morph_tab, word_tab, misc, max_v: int,
                              table_size: int, queue_size: int = 4096,
                              coh_samples: int = 50):
    """Build EVERY enhanced-state device array in one cacheable dispatch.

    Inputs cross host->device as four small arrays: ``t_feat`` (n0, 4)
    int32 = [hash1, hash2, byte_len, has_vowel] per initial token, the two
    sorted morphology hash tables, and ``misc`` (3,) int32 =
    [seed, morph_size, word_size]. Everything else — padded feature
    buffers, constant-fill pair table and queues, the PRNG key, the
    hash-power tables (a trace-time constant baked into the executable),
    and every scalar field — is produced device-side. Dispatch count IS
    ctor wall time on the tunneled transport (each deferred op pays a
    round-trip at the ctor's flush fetch; measured 59 s in bad weather
    pre-batching), so this is one jit call, not thirty ``jnp.asarray``\\ s.
    """
    n0 = t_feat.shape[0]
    pair_keys = jnp.full((table_size, 2), scoring.PKEY_SENT)
    pair_counts = jnp.zeros((table_size,), jnp.int32)
    q_i = jnp.full((3, queue_size), -1, jnp.int32)
    q_j = jnp.full((3, queue_size), -1, jnp.int32)
    q_dist = jnp.full((3, queue_size), INF, jnp.float32)
    q_score = jnp.full((3, queue_size), -INF, jnp.float32)
    samples = jnp.zeros((coh_samples,), jnp.int32)
    token_hash = jnp.zeros((max_v, 2), jnp.int32).at[:n0].set(t_feat[:, :2])
    byte_lengths = jnp.zeros((max_v,), jnp.int32).at[:n0].set(t_feat[:, 2])
    has_vowel = jnp.zeros((max_v,), jnp.bool_).at[:n0].set(
        t_feat[:, 3].astype(jnp.bool_))
    key = jax.random.PRNGKey(misc[0])
    powers = scoring.hash_powers()  # numpy at trace time -> baked constant
    scalars = dict(
        phase=jnp.asarray(1, jnp.int32),
        corpus_synced=jnp.asarray(0, jnp.int32),
        corpus_tokens=jnp.asarray(0, jnp.int32),
        max_pair_count=jnp.asarray(0, jnp.int32),
        pair_unique=jnp.asarray(0, jnp.int32),
        q_valid_total=jnp.zeros((3,), jnp.int32),
        needs_resync=jnp.asarray(False),
        curv_m=jnp.asarray(0.0, jnp.float32),
        curv_v=jnp.asarray(0.0, jnp.float32),
        curv_t=jnp.asarray(0, jnp.int32),
        curv_last=jnp.asarray(0, jnp.int32),
        morph_size=misc[1],
        word_size=misc[2],
    )
    return (pair_keys, pair_counts, q_i, q_j, q_dist, q_score, samples,
            token_hash, byte_lengths, has_vowel, key, powers,
            morph_tab, word_tab, scalars)


# ----------------------------------------------------------------- features

def _coherence(emb, rows, cols, lengths, c, threshold, samples_idx):
    """Sigmoid semantic coherence of simulated merges (enhanced_…:291-346)."""
    xi = emb[rows]
    xj = emb[cols]
    w_j = (lengths[cols].astype(jnp.float32)
           / jnp.maximum(lengths[rows] + lengths[cols], 1).astype(jnp.float32))
    mid = L.geodesic_point(xi, xj, w_j)
    samp_emb = emb[samples_idx]
    dmat = L.pairwise_dist(mid, samp_emb, c, eps=GRAD_EPS)
    not_self = ((samples_idx[None, :] != rows[:, None])
                & (samples_idx[None, :] != cols[:, None]))
    cnt = jnp.maximum(jnp.sum(not_self, axis=1), 1)
    avg = jnp.sum(jnp.where(not_self, dmat, 0.0), axis=1) / cnt
    return 1.0 / (1.0 + jnp.exp(avg - threshold))


def _morph_scores(st: EnhancedState, rows, cols):
    """(n, 3) morphology score per phase for candidate pairs."""
    return _morph_scores_raw(
        st.base.lengths, st.token_hash, st.byte_lengths, st.has_vowel,
        st.hash_powers, st.morph_table, st.morph_size, st.word_table,
        st.word_size, rows, cols)


def _morph_scores_raw(lengths, token_hash, byte_lengths, has_vowel,
                      hash_powers, morph_table, morph_size, word_table,
                      word_size, rows, cols):
    len_i = lengths[rows]
    len_j = lengths[cols]
    p1 = jnp.where((len_i <= 2) & (len_j <= 2), 0.8, 0.2)
    merged_hash = scoring.compose_hash(
        token_hash[rows], token_hash[cols],
        byte_lengths[cols], hash_powers)
    mkey = scoring.pack_hash(merged_hash[..., 0], merged_hash[..., 1])
    is_morph = scoring.in_sorted_set(mkey, morph_table, morph_size)
    merged_vowel = has_vowel[rows] | has_vowel[cols]
    merged_len = len_i + len_j
    # Word validity = set membership OR the vowel fallback
    # (hierarchical_…:218-222): has_vowel ORs exactly under concatenation.
    is_word = (scoring.in_sorted_set(mkey, word_table, word_size)
               | ((merged_len >= 3) & merged_vowel))
    p2 = jnp.where(is_morph, 0.9, 0.3)
    p3 = jnp.where(is_word, 1.0, 0.4)
    return jnp.stack([p1, p2, p3], axis=-1)


def _full_scores(st: EnhancedState, config: EnhancedConfig, rows, cols,
                 dists, freqs):
    """(n, 3) combined score per phase with the reference's weight cascade.

    Coherence uses the per-chunk sample set ``st.coh_samples`` (drawn once per
    sync); the corpus token total for compression is the sync-time snapshot
    ``st.corpus_tokens`` (the corpus itself only changes at sync).
    """
    base = st.base
    return _full_scores_raw(
        config, base.emb, base.lengths, base.threshold, base.curvature,
        st.coh_samples, st.max_pair_count, st.corpus_tokens,
        st.token_hash, st.byte_lengths, st.has_vowel, st.hash_powers,
        st.morph_table, st.morph_size, st.word_table, st.word_size,
        rows, cols, dists, freqs)


def _full_scores_raw(config: EnhancedConfig, emb, lengths, threshold,
                     curvature, coh_samples, max_pair_count, corpus_tokens,
                     token_hash, byte_lengths, has_vowel, hash_powers,
                     morph_table, morph_size, word_table, word_size,
                     rows, cols, dists, freqs):
    """_full_scores on explicit arrays (shard_map-friendly: the sharded sync
    scores its owned key subset with exactly this function, so per-element
    score bits match the single-device path)."""
    alpha, beta, gamma, comp_w, morph_w = config.weights()
    n = rows.shape[0]

    dist_score = 1.0 / (1.0 + dists)
    frequency_score = jnp.zeros((n,), jnp.float32)
    semantic = jnp.zeros((n,), jnp.float32)
    compression = jnp.zeros((n,), jnp.float32)

    if config.use_frequency:
        denom = jnp.log1p(jnp.maximum(max_pair_count, 1).astype(jnp.float32))
        frequency_score = jnp.log1p(freqs.astype(jnp.float32)) / jnp.maximum(
            denom, 1e-9)
        semantic = _coherence(emb, rows, cols, lengths,
                              curvature, threshold, coh_samples)
    if config.use_compression:
        total = jnp.maximum(corpus_tokens, 1).astype(jnp.float32)
        ratio = total / jnp.maximum(total - freqs.astype(jnp.float32), 1.0)
        compression = jnp.clip(ratio - 1.0, 0.0, 1.0)

    score = (alpha * dist_score + beta * frequency_score + gamma * semantic
             + comp_w * compression)[:, None] * jnp.ones((1, 3))
    if config.use_hierarchical:
        score = score + morph_w * _morph_scores_raw(
            lengths, token_hash, byte_lengths, has_vowel, hash_powers,
            morph_table, morph_size, word_table, word_size, rows, cols)
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


def _maybe_update_curvature(st: EnhancedState,
                            config: EnhancedConfig) -> EnhancedState:
    """Adam step on curvature every ``curvature_freq`` merges.

    The RNG key splits INSIDE the fired update only, so the key sequence is a
    function of merge counts alone — the fused segment kernel
    (ops/pallas/enhanced_loop.py) halts at curvature events and runs this
    very function between segments, reproducing the while-loop path's RNG
    stream exactly.
    """
    if config.curvature_freq <= 0:
        return st

    def update(st):
        base = st.base
        key, sub = jax.random.split(st.key)
        st = st.replace(key=key)
        loss_fn = lambda c: _curvature_losses(st, config, sub, c)
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
            q_dist=st.q_dist * scale,
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
        st = _maybe_update_curvature(st, config)
        base = st.base

    pidx = jnp.clip(st.phase - 1, 0, 2)
    nb = max(1, config.merge_batch)

    # Dense channel representative: global distance argmin, fully scored.
    use_dense = config.use_dense_channel or not config.needs_corpus
    if use_dense:
        di = jnp.argmin(base.best_dist).astype(jnp.int32)
        dd = base.best_dist[di]
        dj = base.best_j[di]
        if config.pair_table_hashed > 1:
            dense_freq = scoring.lookup_pair_counts_hashed(
                di[None], dj[None], st.pair_keys, st.pair_counts,
                config.pair_table_hashed)[0]
        else:
            dense_freq = scoring.lookup_pair_counts(
                di[None], dj[None], st.pair_keys, st.pair_counts)[0]
        dense_score = _full_scores(st, config, di[None], dj[None], dd[None],
                                   dense_freq[None])[0][pidx]
        dense_valid = jnp.isfinite(dd) & (dd < base.threshold)
        if config.base.max_token_len > 0:
            # Backstop for the structural fold gate (states loaded/rebuilt
            # with a full candidate re-scan can carry overlong pairs).
            dense_valid &= (base.lengths[di] + base.lengths[dj]
                            <= config.base.max_token_len)
    else:
        di = jnp.asarray(0, jnp.int32)
        dj = jnp.asarray(0, jnp.int32)
        dd = jnp.asarray(INF, jnp.float32)
        dense_score = jnp.asarray(-INF, jnp.float32)
        dense_valid = jnp.asarray(False)

    need_rs = jnp.asarray(False)
    if config.needs_corpus:
        # Consume-on-read from the current phase's score-sorted queue:
        # remaining entries keep score-descending order, so the first ``nb``
        # valid positions ARE the top-nb candidates of the full table (any
        # entry outside a top-K queue scores below every stored entry).
        k = config.queue_size
        qs = st.q_score[pidx]
        qd = st.q_dist[pidx]
        qi = st.q_i[pidx]
        qj = st.q_j[pidx]
        valid = (qs > -INF) & (qd < base.threshold)
        if config.use_dense_channel:
            # Dedupe: a queue entry equal to the dense pair yields the same
            # merged token; keep the dense copy only.
            valid = valid & ~(dense_valid & (qi == di) & (qj == dj))
        vrank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        take = valid & (vrank < nb)
        # Dense (nb,) gather of the taken queue positions, in score order.
        pos_k = jnp.arange(k, dtype=jnp.int32)
        sel = jnp.full((nb + 1,), k, jnp.int32).at[
            jnp.where(take, vrank, nb)].set(pos_k, mode="drop")[:nb]
        found = sel < k
        selc = jnp.minimum(sel, k - 1)
        sp_i = qi[selc]
        sp_j = qj[selc]
        sp_d = qd[selc]
        top_vals = jnp.where(found, qs[selc], -INF)
        sp_valid = found
        # Exhaustion: a TRUNCATED queue that has been partially consumed and
        # can no longer fill a batch may hide better candidates in the full
        # table — end the chunk; the wrapper resyncs (fresher stats).
        truncated = st.q_valid_total[pidx] > k
        consumed_any = base.num_merges > st.corpus_synced
        need_rs = (truncated & consumed_any
                   & (jnp.sum(valid.astype(jnp.int32)) < nb))
        if not config.use_dense_channel:
            # Corpus-only mode: with every queue entry consumed (-INF), no
            # amount of threshold growth can make a candidate — the merges
            # applied so far have certainly created NEW corpus pairs, so
            # end the chunk for a fresh sync instead of burning the step
            # budget on no-merge threshold rounds (~65 us each in the fused
            # kernel). consumed_any guards the genuinely-empty-corpus case,
            # which must fall through to the no-merge stop logic.
            n_live = jnp.sum((qs > -INF).astype(jnp.int32))
            need_rs = need_rs | ((n_live == 0) & consumed_any)
    else:
        sp_i = jnp.zeros((nb,), jnp.int32)
        sp_j = jnp.zeros((nb,), jnp.int32)
        sp_d = jnp.full((nb,), INF, jnp.float32)
        top_vals = jnp.full((nb,), -INF, jnp.float32)
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
        new_base = merge_batch(base0, cand_i, cand_j, cand_d, cand_valid,
                               config.base.max_token_len)
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
        if config.needs_corpus:
            # Consume every applied ordered pair across ALL phase queues
            # (a pair can be stored in several; dense merges too).
            eq = ((st.q_i[:, :, None] == cand_i[None, None, :])
                  & (st.q_j[:, :, None] == cand_j[None, None, :])
                  & applied[None, None, :])
            q_score = jnp.where(jnp.any(eq, axis=-1), -INF, st.q_score)
            st = st.replace(q_score=q_score)
        return st.replace(base=new_base,
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
    if config.needs_corpus:
        # Queue exhaustion ends the chunk WITHOUT a step (the wrapper resyncs
        # and the step is retried against the rebuilt full table).
        st = jax.lax.cond(
            need_rs,
            lambda s: s.replace(needs_resync=jnp.asarray(True)),
            lambda s: jax.lax.cond(any_valid, do_merge, no_merge, s), st)
    else:
        st = jax.lax.cond(any_valid, do_merge, no_merge, st)
    base = st.base
    step = base.step + jnp.where(st.needs_resync, 0, 1)
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
    if config.frozen_freqs:
        # No corpus to replay: keep the restored pair-count snapshot, refresh
        # scores/queues against the current embeddings and curvature.
        return _sync_finish(st, config, st.corpus, st.pair_keys,
                            st.pair_counts, st.pair_unique, st.max_pair_count)

    # Batched replay of the un-synced merge rules (a few O(N) passes instead
    # of one per merge): encode()-semantics leftmost-match by default, or
    # merge-rank order when the tokenizer encodes in priority mode.
    replay = (scoring.batch_rank_replay if config.priority_replay
              else scoring.batch_fixpoint_replay)
    corpus = replay(
        st.corpus, base.merges, st.corpus_synced,
        base.num_merges - st.corpus_synced, config.n_init)
    keys, counts, n_unique, max_count = scoring.build_pair_table(
        corpus, config.freq_table_size,
        max_id=config.base.max_vocab_size)
    return _sync_finish(st, config, corpus, keys, counts, n_unique,
                        max_count)


def _sync_finish(st: EnhancedState, config: EnhancedConfig, corpus,
                 keys, counts, n_unique, max_count) -> EnhancedState:
    """Tail of the sync: scores + candidate queues from a fresh pair table.

    Shared by :func:`sync_corpus` and the corpus-sharded variant
    (parallel/sharded.sync_corpus_sharded), which computes the replayed
    corpus and the pair table with per-shard work instead.
    """
    base = st.base

    # Per-chunk coherence sample set (one draw per sync — every candidate
    # scored this chunk sees the same samples; the reference redraws per
    # candidate, which only changes its sigmoid term's noise realisation).
    key, sub = jax.random.split(st.key)
    samp = jax.random.randint(sub, (config.coherence_samples,), 0,
                              jnp.maximum(base.vocab_size, 1))
    # Frozen restored frequencies have NO live corpus: keep the loader's
    # token-total stand-in (the compression-ratio denominator) instead of
    # clobbering it with the empty dummy buffer's count of 0.
    corpus_tokens = (st.corpus_tokens if config.frozen_freqs
                     else scoring.corpus_token_count(corpus))
    st = st.replace(key=key, coh_samples=samp,
                    corpus=corpus, corpus_synced=base.num_merges,
                    corpus_tokens=corpus_tokens,
                    pair_keys=keys, pair_counts=counts,
                    max_pair_count=max_count, pair_unique=n_unique)

    # Sparse channel: decode pairs, compute distances and full scores.
    # Self-pairs (a, a) are valid corpus candidates — 'aa' from adjacent
    # identical tokens (doubled letters etc.); their distance is ~0. Only the
    # reference's *geometric* candidate matrix excludes the diagonal (its
    # triu mask, hyperbolic_merge.py:258); corpus pairs are real occurrences.
    valid = keys[:, 0] != scoring.PKEY_SENT
    rows = jnp.where(valid, keys[:, 0].astype(jnp.int32), 0)
    cols = jnp.where(valid, keys[:, 1].astype(jnp.int32), 0)
    dists = L.distance(base.emb[rows], base.emb[cols], base.curvature)
    dists = jnp.where(valid, dists, INF)

    score3 = _full_scores(st, config, rows, cols, dists, counts)
    ok = valid & (counts >= config.min_pair_freq)
    if config.base.max_token_len > 0:
        # Merged-token length gate (MergeConfig.max_token_len).
        ok &= (base.lengths[rows] + base.lengths[cols]
               <= config.base.max_token_len)
    score3 = jnp.where(ok[:, None], score3, -INF)

    # Pairs already merged (any historical ordered pair) are consumed. With
    # a LIVE corpus this check is provably redundant: replay substitutes a
    # merged pair's every adjacency with the new id and substitution never
    # deletes the tokens *between* two others, so a historical pair's
    # adjacency count is 0 after its replay, forever — it cannot re-enter
    # the table at all (tests/test_scoring.py pins this invariant). Only
    # frozen restored frequencies (enhanced load() without a corpus) carry
    # stale counts for historical pairs and need the explicit membership
    # join — which costs a 44 s-to-compile 4-operand sort at flagship
    # shapes, so it stays off the live path (VERDICT r3 #3).
    if config.frozen_freqs:
        in_hist = jnp.arange(base.merges.shape[0]) < base.num_merges
        hist_hi = jnp.where(in_hist, base.merges[:, 0], scoring.PKEY_SENT)
        hist_lo = jnp.where(in_hist, base.merges[:, 1], scoring.PKEY_SENT)
        hist_hi, hist_lo = jax.lax.sort((hist_hi, hist_lo), num_keys=2)
        consumed = scoring.in_sorted_pair_set(
            keys[:, 0], keys[:, 1], hist_hi, hist_lo,
            base.num_merges) & valid
        score3 = jnp.where((~consumed)[:, None], score3, -INF)

    # Per-phase score-sorted candidate queues (consume-on-read within the
    # chunk; see module docstring). Without the hierarchical curriculum the
    # three phase columns are IDENTICAL (morph_w = 0 and the phase never
    # leaves 1): score/select one row and broadcast — a 3x cut of the
    # replicated top-k/queue tail (VERDICT r3 #6).
    k = config.queue_size
    if config.use_hierarchical:
        top_vals, top_pos = scoring.top_k_desc(score3.T, k)  # (3, K) each
        q_valid_total = jnp.sum((score3 > -INF).astype(jnp.int32), axis=0)
    else:
        tv1, tp1 = scoring.top_k_desc(score3[:, :1].T, k)    # (1, K)
        top_vals = jnp.broadcast_to(tv1, (3, k))
        top_pos = jnp.broadcast_to(tp1, (3, k))
        qv1 = jnp.sum((score3[:, 0] > -INF).astype(jnp.int32))
        q_valid_total = jnp.broadcast_to(qv1[None], (3,))
    stored = top_vals > -INF
    q_i = jnp.where(stored, rows[top_pos], -1)
    q_j = jnp.where(stored, cols[top_pos], -1)
    q_dist = jnp.where(stored, dists[top_pos], INF)

    return st.replace(q_i=q_i, q_j=q_j, q_dist=q_dist, q_score=top_vals,
                      q_valid_total=q_valid_total,
                      needs_resync=jnp.asarray(False))


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("st",))
def _run_enhanced_xla(st: EnhancedState, config: EnhancedConfig,
                      n_steps) -> EnhancedState:
    """XLA while-loop backend for :func:`run_enhanced`.

    ``n_steps`` is traced (one executable for every ``remaining`` value the
    resync wrapper re-enters with)."""
    st = sync_corpus(st, config)
    start_merges = st.base.num_merges
    start_step = st.base.step
    attempt_cap = n_steps + 1024

    def cond(s):
        return ((~s.base.stopped) & (~s.needs_resync)
                & (s.base.num_merges - start_merges < n_steps)
                & (s.base.step - start_step < attempt_cap))

    return jax.lax.while_loop(cond, lambda s: enhanced_step(s, config), st)


# Segment-boundary helpers for the fused kernel backend.
sync_corpus_jit = jax.jit(sync_corpus, static_argnames=("config",))
curvature_update_jit = jax.jit(_maybe_update_curvature,
                               static_argnames=("config",))

_FUSED_DISABLED = False
# Backend used by the most recent run_enhanced call in this process:
# "fused" (Pallas segment kernel) or "xla" (while-loop). bench.py reports it
# in the headline JSON so a silent fallback is visible in the artifact
# (VERDICT r2 #2).
LAST_BACKEND = None
# Cumulative count of chunk dispatch rounds (each = one corpus sync + one
# loop run) in this process. optimize_merges diffs consecutive readings to
# report per-chunk `chunk_syncs` — a chunk that needed several syncs (queue
# exhaustion) is visibly slower for an attributable reason (VERDICT r4 #8).
DISPATCH_ROUNDS = 0


def _disable_fused() -> None:
    global _FUSED_DISABLED
    _FUSED_DISABLED = True
    import logging
    import traceback
    logging.getLogger(__name__).warning(
        "fused enhanced kernel failed to compile; falling back to the XLA "
        "while-loop for this process. This is a Mosaic LOWERING regression — "
        "run `python -m hyptokenizer_tpu.cli.test_tpu --kernel-check` on the "
        "TPU and see ops/pallas/KERNELS.md for the legal-construct rules:\n%s",
        traceback.format_exc())


def _run_chunk_dispatch(st: EnhancedState, config: EnhancedConfig,
                        n_steps: int) -> EnhancedState:
    """One sync + merge round on the best available backend."""
    global LAST_BACKEND, DISPATCH_ROUNDS
    DISPATCH_ROUNDS += 1
    use_pallas = config.base.use_pallas
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas and not _FUSED_DISABLED:
        from hyptokenizer_tpu.ops.pallas import enhanced_loop
        if enhanced_loop.supports(st, config):
            try:
                out = enhanced_loop.run_enhanced_fused(st, config, n_steps)
                LAST_BACKEND = "fused"
                return out
            except Exception:
                # A kernel COMPILE failure (env/toolchain) downgrades to the
                # XLA path for the process; mid-run state is unharmed (the
                # fused path mutates nothing before its first kernel
                # returns, and segments are functional). Runtime data errors
                # would raise identically under XLA, so only the first
                # failure is swallowed — and loudly.
                _disable_fused()
    LAST_BACKEND = "xla"
    return _run_enhanced_xla(st, config, n_steps)


def run_enhanced(st: EnhancedState, config: EnhancedConfig,
                 n_steps: int) -> EnhancedState:
    """One chunk: merge ``n_steps`` tokens, re-syncing corpus statistics as
    often as the candidate queues demand.

    ``n_steps`` caps *merges* (the reference's step counter advances one merge
    per step); loop iterations are additionally bounded so candidate-free
    threshold-adaptation rounds terminate. Queue exhaustion mid-chunk
    (``needs_resync``) triggers a fresh sync HERE rather than ending the
    chunk short — the caller's chunk accounting (and the bench's windowed
    rates) see full chunks regardless of how many syncs they took.

    Backend dispatch mirrors ``state.run_merges``: on TPU the chunk runs as
    fused Pallas segment kernels (ops/pallas/enhanced_loop.py — per-step
    dispatch latency amortises across a whole segment); elsewhere, or when
    the kernel's shape preconditions fail, the jitted ``lax.while_loop``.
    """
    if (config.use_dense_channel or not config.needs_corpus) and \
            bool(st.base.best_dist[0] == -jnp.inf):
        # Poisoned dense-candidate arrays (state trained corpus-only, where
        # candidate maintenance is skipped by design — MergeConfig
        # .init_candidates). Failing loudly here beats silently consuming
        # stale/garbage candidates (VERDICT r3 #7).
        raise ValueError(
            "dense candidate channel requested but best_dist is poisoned: "
            "this state was built/trained with use_dense_channel=False "
            "(corpus-only), which never maintains the dense-candidate "
            "arrays. Rebuild them (search.full_pass_best) or keep "
            "use_dense_channel=False.")
    remaining = n_steps
    before = int(st.base.num_merges)
    while True:
        st = _run_chunk_dispatch(st, config, remaining)
        now = int(st.base.num_merges)
        remaining -= now - before
        before = now
        if remaining <= 0 or bool(st.base.stopped):
            break
        if not bool(st.needs_resync):
            break  # candidate drought / attempt cap: caller decides
    return st
