"""Pure device-side scoring primitives for the enhanced merge loop.

Capability parity with the reference's feature-flag scorers
(enhanced_fast_hyperbolic_merge.py:266-990, frequency_aware_hyperbolic_merge.py
:92-234, compression_aware_tokenizer.py:124-190, hierarchical_hyperbolic_merge
.py:158-277), reformulated for the TPU:

* corpus = a device int32 id array; merges are replayed onto it and pair
  frequencies are rebuilt as a sorted-key count table at chunk boundaries
  (the reference freezes host-dict frequencies for a whole training run —
  enhanced_…:266-290; per-chunk snapshots are strictly fresher),
* token strings never reach the device: each token carries a polynomial
  rolling hash that composes under concatenation
  (hash(a+b) = hash(a)*B^len(b) + hash(b)), so the morphology validity of a
  *candidate* merged string is a table lookup against host-provided sorted
  hash sets (replaces the reference's per-candidate python string checks,
  hierarchical_…:158-225),
* compression gain is computed exactly from the candidate pair's corpus
  frequency (each non-overlapping occurrence removes one token) instead of
  greedily re-tokenizing <=10 sample texts (compression_aware_…:91-122 — whose
  normalised score the reference itself notes saturates; SURVEY §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np

# numpy (not jnp) scalars: creating a jnp value at import time initialises
# the XLA backend, which breaks jax.distributed.initialize() for any caller
# that imports this package before multi-host setup.
PAD_ID = _np.int32(-1)
# Line separator: breaks adjacency (the reference counts pairs per line,
# frequency_aware_…:92-112) but survives compaction, unlike PAD.
SEP_ID = _np.int32(-2)

# Two 15-bit-prime rolling hashes packed into one int32 key. int32 (not
# uint32) everywhere: Mosaic lowers no unsigned reductions (the round-2
# on-chip failure — VERDICT r2 #1), and 15-bit primes keep every modular
# product (< 32748^2 < 2^30) and the packed key (< 32749*65536 < 2^31-1)
# exact in int32 on both the XLA and the Pallas path.
HASH_P1 = 32749
HASH_P2 = 32719
HASH_B1 = 257
HASH_B2 = 263
MAX_HASH_LEN = 4096  # token-length cap for the power tables
HKEY_SENT = _np.int32(2**31 - 1)  # sorted-table pad; every valid packed key
                                  # is < 32749*65536 + 32718 < 2^31 - 1


def hash_powers(max_len: int = MAX_HASH_LEN):
    """Power tables B^k mod p for both hash primes, shape (2, max_len).

    Computed host-side with numpy (it is constant data; tracing a 4096-step
    scan just to build it costs real compile time).
    """
    import numpy as _np

    def powers(b, p):
        out = _np.empty((max_len,), _np.int32)
        acc = 1
        for k in range(max_len):
            out[k] = acc
            acc = (acc * b) % p
        return out

    return jnp.asarray(_np.stack([powers(HASH_B1, HASH_P1),
                                  powers(HASH_B2, HASH_P2)]))


def hash_string(s: str):
    """Host-side reference hash of a python string (matches device compose)."""
    h1 = 0
    h2 = 0
    for ch in s.encode("utf-8"):
        h1 = (h1 * HASH_B1 + ch) % HASH_P1
        h2 = (h2 * HASH_B2 + ch) % HASH_P2
    return h1, h2


def pack_hash(h1, h2):
    """Pack the two residues into one int32 lookup key (< 2^31 - 1)."""
    return (jnp.int32(h1) * jnp.int32(65536) + jnp.int32(h2)).astype(jnp.int32)


def compose_hash(h_i: jax.Array, h_j: jax.Array, byte_len_j: jax.Array,
                 powers: jax.Array) -> jax.Array:
    """hash(a+b) from hash(a), hash(b), len_bytes(b). Shapes (..., 2).

    int32 throughout: residues < 2^15 and powers < 2^15, so the products stay
    below 2^30 — exact in int32 (and Mosaic-legal in the fused kernel).
    """
    idx = jnp.minimum(byte_len_j, MAX_HASH_LEN - 1)
    p1 = powers[0, idx]
    p2 = powers[1, idx]
    c1 = (h_i[..., 0] * p1 + h_j[..., 0]) % jnp.int32(HASH_P1)
    c2 = (h_i[..., 1] * p2 + h_j[..., 1]) % jnp.int32(HASH_P2)
    return jnp.stack([c1, c2], axis=-1)


# ------------------------------------------------------------- blocked scans
#
# XLA:TPU compile time for a 1-D scan grows with the scanned length (measured
# on-chip: cumsum@2.9M = 10 s, cummax@2.9M = 19-24 s to COMPILE — the bulk of
# the sync_corpus compile budget, VERDICT r3 #3). The two-level decomposition
# — per-row scan of a (R, block) reshape + a tiny cross-row offset scan —
# compiles in ~0.7 s at the same N and is bit-exact for the integer scans
# used here. Execution cost is the same O(N) vector work.

SCAN_BLOCK = 8192


def _blocked_scan(x: jax.Array, cum, comb, identity, reverse: bool = False,
                  block: int = SCAN_BLOCK) -> jax.Array:
    n = x.shape[0]
    if n <= 2 * block:
        return cum(x, axis=0, reverse=reverse)
    r = -(-n // block)
    pad = r * block - n
    if pad:
        # Identity padding at the tail is inert in both directions (forward
        # scans never read past n; reverse scans fold identity first).
        x = jnp.concatenate([x, jnp.full((pad,), identity, x.dtype)])
    inner = cum(x.reshape(r, block), axis=1, reverse=reverse)
    edge = inner[:, 0] if reverse else inner[:, -1]
    off = cum(edge, axis=0, reverse=reverse)
    if reverse:
        off = jnp.concatenate([off[1:], jnp.full((1,), identity, x.dtype)])
    else:
        off = jnp.concatenate([jnp.full((1,), identity, x.dtype), off[:-1]])
    out = comb(inner, off[:, None])
    return out.reshape(-1)[:n]


def blocked_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive cumsum, two-level (compile-cheap at corpus sizes)."""
    return _blocked_scan(x, jax.lax.cumsum, jnp.add, 0)


def blocked_cummax(x: jax.Array) -> jax.Array:
    """Inclusive cummax, two-level (int dtypes)."""
    ident = jnp.iinfo(x.dtype).min
    return _blocked_scan(x, jax.lax.cummax, jnp.maximum, ident)


def blocked_cummin_reverse(x: jax.Array) -> jax.Array:
    """Inclusive reverse (suffix) cummin, two-level (int dtypes)."""
    ident = jnp.iinfo(x.dtype).max
    return _blocked_scan(x, jax.lax.cummin, jnp.minimum, ident, reverse=True)


def blocked_cumsum_rows(x: jax.Array) -> jax.Array:
    """Per-row inclusive cumsum of a (P, T) array, two-level over T."""
    p, t = x.shape
    if t <= 2 * SCAN_BLOCK:
        return jnp.cumsum(x, axis=1)
    r = -(-t // SCAN_BLOCK)
    pad = r * SCAN_BLOCK - t
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    x3 = x.reshape(p, r, SCAN_BLOCK)
    inner = jnp.cumsum(x3, axis=2)
    off = jnp.cumsum(inner[:, :, -1], axis=1)
    off = jnp.concatenate([jnp.zeros((p, 1), x.dtype), off[:, :-1]], axis=1)
    return (inner + off[:, :, None]).reshape(p, r * SCAN_BLOCK)[:, :t]


def _membership_sort_join(keys: jax.Array, table: jax.Array,
                          table_size: jax.Array) -> jax.Array:
    """Sort-join membership: sort (table ++ queries) by (key, tag) and let a
    prefix max propagate the most recent *table* key to each query.

    A per-key binary search is log2(|table|) serialized scalar gathers per
    query (~7.5 ns each on the TPU vector memory — ~45 ms for 131k queries
    against two tables), while sorting is an XLA-native high-throughput op:
    the whole join costs one ~(Q+T)-element multi-operand sort plus one scan
    and one scatter (~3 ms at Q=131k).
    """
    q = keys.shape[0]
    mt = table.shape[0]
    tpos = jnp.arange(mt, dtype=jnp.int32)
    sent = jnp.int32(HKEY_SENT)
    tkey = jnp.where(tpos < table_size, table, sent)
    allk = jnp.concatenate([tkey, keys])
    tag = jnp.concatenate([jnp.zeros((mt,), jnp.int32),
                           jnp.ones((q,), jnp.int32)])
    # Query slot in the output; table entries park in the dropped slot q.
    opos = jnp.concatenate([jnp.full((mt,), q, jnp.int32),
                            jnp.arange(q, dtype=jnp.int32)])
    sk, stag, spos = jax.lax.sort((allk, tag, opos), num_keys=2)
    # Most recent table key (+1, so key 0 is distinguishable from "none");
    # keys are sorted ascending, so a prefix max carries the nearest table
    # key at-or-below each position. Valid keys are < HKEY_SENT, so +1 never
    # overflows for matchable entries (sentinel rows are masked out).
    tbl_mark = jnp.where((stag == 0) & (sk != sent), sk + jnp.int32(1),
                         jnp.int32(0))
    last_tbl = blocked_cummax(tbl_mark)
    member = (stag == 1) & (last_tbl == sk + jnp.int32(1)) & (sk != sent)
    # Each query slot is written exactly once (spos is unique over queries);
    # table entries all land in dropped slot q.
    out = jnp.zeros((q + 1,), jnp.bool_).at[spos].set(member)
    return out[:q]


def in_sorted_set(keys: jax.Array, table: jax.Array, table_size: jax.Array) -> jax.Array:
    """Membership of int32 keys in a sorted int32 table (padded with HKEY_SENT).

    Large query batches dispatch to the sort-join (see above); small ones
    (the per-step dense-candidate checks) keep the binary search, which is
    cheaper than sorting the whole table for a handful of keys.
    """
    if keys.size >= 4096:
        return _membership_sort_join(keys, table, table_size)
    pos = jnp.searchsorted(table, keys)
    pos = jnp.minimum(pos, table.shape[0] - 1)
    return (table[pos] == keys) & (pos < table_size)


# ------------------------------------------------------------------ pair keys
#
# Adjacent-pair keys are TWO int32 lanes (hi = left token id, lo = right
# token id), ordered lexicographically — which equals the order of the
# mathematical key a*max_vocab+b. A single-lane 32-bit packing overflows once
# max_vocab exceeds 65535, and the reference DEFAULT is max_vocab_size=100000
# (hyperbolic_merge.py:115): wrapped keys silently alias distinct pairs and
# corrupt frequencies/consumed sets. Two lanes are exact for any id < 2^31
# (TPU-native 32-bit ops), at the cost of one extra compare/sort operand per
# op. int32 rather than uint32 because token ids are int32 everywhere else
# and Mosaic lowers no unsigned reductions (VERDICT r2 #1).

PKEY_SENT = _np.int32(2**31 - 1)  # sentinel in BOTH lanes; any valid hi
                                  # lane is a token id < max_vocab << 2^31

# ---- order-preserving single-lane packing (ids <= PACK_MAX_ID - 1) ----
#
# XLA:TPU sort compile time scales with operand COUNT as well as length
# (measured: sort1@2.9M = 14.5 s, sort2@2.9M = 30 s, sort4@181k = 44 s).
# When every token id fits in 16 bits, the two-lane pair key packs into ONE
# int32 whose *int32* ascending order equals the (hi, lo) lexicographic
# order: u = hi*65536 + lo is the unsigned bit pattern (int32 multiply wraps
# two's-complement), and flipping the sign bit (xor INT32_MIN) converts
# unsigned order to int32 order. The packing is used internally by the sort-
# heavy table builds; the table representation stays two-lane everywhere.

PACK_MAX_ID = 65535  # max_vocab_size bound: ids <= 65534 keep the packed
                     # key strictly below the PKEY_SENT sentinel
_I32_MIN = _np.int32(-2**31)


def pack_lex(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """int32 key with int32 order == lex (hi, lo); sentinel rows -> PKEY_SENT.

    Requires hi, lo in [0, 65534] for valid rows (callers gate on
    max_vocab_size <= PACK_MAX_ID)."""
    u = hi * jnp.int32(65536) + lo
    k = u ^ _I32_MIN
    return jnp.where(hi == PKEY_SENT, jnp.int32(PKEY_SENT), k)


def unpack_lex(k: jax.Array):
    """Inverse of :func:`pack_lex` (sentinel-preserving)."""
    u = k ^ _I32_MIN
    hi = (u >> 16) & jnp.int32(0xFFFF)
    lo = u & jnp.int32(0xFFFF)
    sent = k == jnp.int32(PKEY_SENT)
    return (jnp.where(sent, jnp.int32(PKEY_SENT), hi),
            jnp.where(sent, jnp.int32(PKEY_SENT), lo))


def searchsorted_pairs(t_hi: jax.Array, t_lo: jax.Array,
                       q_hi: jax.Array, q_lo: jax.Array) -> jax.Array:
    """Vectorised lexicographic ``searchsorted`` (side='left') on lane pairs.

    log2(T) rounds of batched gathers — same access pattern as
    ``jnp.searchsorted``; use only for small query batches (the sort-join
    covers large ones).
    """
    n = t_hi.shape[0]
    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mh = t_hi[mid]
        ml = t_lo[mid]
        lt = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        return jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid)

    lo, _ = jax.lax.fori_loop(0, max(int(n), 1).bit_length(), body, (lo, hi))
    return lo


def _pair_membership_sort_join(q_hi, q_lo, t_hi, t_lo, table_size):
    """Two-lane generalisation of :func:`_membership_sort_join`: sort
    (table ++ queries) by (hi, lo, tag) and compare each query against the
    most recent table row (propagated as an index by a prefix max)."""
    q = q_hi.shape[0]
    mt = t_hi.shape[0]
    tpos = jnp.arange(mt, dtype=jnp.int32)
    in_tbl = tpos < table_size
    thi = jnp.where(in_tbl, t_hi, PKEY_SENT)
    tlo = jnp.where(in_tbl, t_lo, PKEY_SENT)
    allh = jnp.concatenate([thi, q_hi])
    alll = jnp.concatenate([tlo, q_lo])
    tag = jnp.concatenate([jnp.zeros((mt,), jnp.int32),
                           jnp.ones((q,), jnp.int32)])
    opos = jnp.concatenate([jnp.full((mt,), q, jnp.int32),
                            jnp.arange(q, dtype=jnp.int32)])
    sh, sl, stag, spos = jax.lax.sort((allh, alll, tag, opos), num_keys=3)
    idx = jnp.arange(q + mt, dtype=jnp.int32)
    tbl_mark = jnp.where((stag == 0) & (sh != PKEY_SENT), idx, jnp.int32(-1))
    last_tbl = blocked_cummax(tbl_mark)
    lt = jnp.maximum(last_tbl, 0)
    member = ((stag == 1) & (last_tbl >= 0)
              & (sh[lt] == sh) & (sl[lt] == sl) & (sh != PKEY_SENT))
    out = jnp.zeros((q + 1,), jnp.bool_).at[spos].set(member)
    return out[:q]


def in_sorted_pair_set(q_hi, q_lo, t_hi, t_lo, table_size) -> jax.Array:
    """Membership of (hi, lo) pair keys in a lex-sorted two-lane table."""
    q_hi = q_hi.astype(jnp.int32)
    q_lo = q_lo.astype(jnp.int32)
    if q_hi.size >= 4096:
        return _pair_membership_sort_join(q_hi, q_lo, t_hi, t_lo, table_size)
    pos = searchsorted_pairs(t_hi, t_lo, q_hi, q_lo)
    posc = jnp.minimum(pos, t_hi.shape[0] - 1)
    return ((t_hi[posc] == q_hi) & (t_lo[posc] == q_lo)
            & (pos < table_size))


# --------------------------------------------------------------- corpus ops

def apply_merge_to_corpus(corpus: jax.Array, i: jax.Array, j: jax.Array,
                          new_id: jax.Array) -> jax.Array:
    """Replace left-to-right non-overlapping adjacent (i, j) with ``new_id``.

    Greedy scan semantics (as the reference's tokenize fixpoint applies one
    rule): within a run of consecutive matches, every other match applies,
    starting from the run head. PAD holes are left at consumed positions;
    ``compact_corpus`` removes them.
    """
    n = corpus.shape[0]
    nxt = jnp.roll(corpus, -1).at[-1].set(PAD_ID)
    m = (corpus == i) & (nxt == j)
    prev_m = jnp.roll(m, 1).at[0].set(False)
    run_start = m & ~prev_m
    idx = jnp.arange(n, dtype=jnp.int32)
    start_idx = jnp.where(run_start, idx, jnp.int32(-1))
    last_start = blocked_cummax(start_idx)
    applied = m & (((idx - last_start) % 2) == 0)
    applied_prev = jnp.roll(applied, 1).at[0].set(False)
    out = jnp.where(applied, new_id, corpus)
    return jnp.where(applied_prev, PAD_ID, out)


def compact_corpus(corpus: jax.Array) -> jax.Array:
    """Move non-PAD entries to the front, preserving order; PAD-fill the tail.

    cumsum + scatter stream compaction — O(N), cheaper than a sort and runs
    once per applied merge inside the chunk replay.
    """
    n = corpus.shape[0]
    nonpad = corpus != PAD_ID
    target = jnp.where(nonpad, blocked_cumsum(nonpad.astype(jnp.int32)) - 1, n)
    return jnp.full((n + 1,), PAD_ID, corpus.dtype).at[target].set(corpus)[:n]


def replay_merges_on_corpus(corpus: jax.Array, pairs: jax.Array,
                            n_init, count) -> jax.Array:
    """Apply ``count`` merges sequentially (merge k creates id ``n_init + k``),
    compacting between steps so later merges see pairs created by earlier ones.

    O(count * N): prefer :func:`batch_fixpoint_replay` for chunked replay.
    """
    def cond(carry):
        k, _ = carry
        return k < count

    def body(carry):
        k, c = carry
        c = apply_merge_to_corpus(c, pairs[k, 0], pairs[k, 1],
                                  jnp.asarray(n_init, jnp.int32) + k)
        return k + 1, compact_corpus(c)

    _, out = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), corpus))
    return out


def match_rules(key_hi: jax.Array, key_lo: jax.Array, merges: jax.Array,
                start, count, n_init: int, *, rule_group: int = 512,
                tile: int = 16384) -> jax.Array:
    """Merged-token id for each two-lane pair key, or -1 where none matches.

    Rules are merges [start, start+count) with key lanes (a, b) and merged
    id n_init+k. Matching is a tiled broadcast-compare against rule groups —
    NOT a sorted-table binary search: a 16-round ``searchsorted`` over an
    N-element query array is 16 N-wide random gathers, which serialize on the
    TPU's vector memory (measured 240 ms for N=2M vs ~6 ms for this form,
    which is pure VPU compare/select work).

    At most one rule can match a key (a pair is never merged twice —
    state.merge_pair's structural exclusion), so a max-reduction over groups
    is exact. O(N * count) compares, grouped so the common chunked-replay
    case (count <= rule_group) is a single sweep.
    """
    n = key_hi.shape[0]
    n_tiles = -(-n // tile)
    pad_n = n_tiles * tile
    if pad_n != n:
        key_hi = jnp.pad(key_hi, (0, pad_n - n), constant_values=PKEY_SENT)
        key_lo = jnp.pad(key_lo, (0, pad_n - n), constant_values=PKEY_SENT)
    key2 = jnp.stack([key_hi.reshape(n_tiles, tile),
                      key_lo.reshape(n_tiles, tile)], axis=1)
    # Pad the rule table to a group multiple so no dynamic_slice start is ever
    # clamped (a clamp would silently shift the group window off its ids).
    max_k = merges.shape[0]
    pad_k = -(-max_k // rule_group) * rule_group
    if pad_k != max_k:
        merges = jnp.pad(merges, ((0, pad_k - max_k), (0, 0)),
                         constant_values=-1)
    group_lo = start // rule_group          # first group index (traced)
    n_groups = (start + count - 1) // rule_group - group_lo + 1

    def one_group(carry):
        g, acc = carry
        g0 = (group_lo + g) * rule_group
        rules = jax.lax.dynamic_slice_in_dim(merges, g0, rule_group, axis=0)
        ks = g0 + jnp.arange(rule_group, dtype=jnp.int32)
        ok = (ks >= start) & (ks < start + count) & (rules[:, 0] >= 0)
        rhi = jnp.where(ok, rules[:, 0], PKEY_SENT)
        rlo = jnp.where(ok, rules[:, 1], PKEY_SENT)
        rid = jnp.asarray(n_init, jnp.int32) + ks

        def one_tile(kt):
            eq = (kt[0][:, None] == rhi[None, :]) \
                & (kt[1][:, None] == rlo[None, :])
            return jnp.max(jnp.where(eq, rid[None, :], jnp.int32(-1)), axis=1)

        acc = jnp.maximum(acc, jax.lax.map(one_tile, key2).reshape(pad_n))
        return g + 1, acc

    _, matched = jax.lax.while_loop(
        lambda carry: carry[0] < n_groups, one_group,
        (jnp.asarray(0, jnp.int32), jnp.full((pad_n,), -1, jnp.int32)))
    # Sentinel keys can never match: a valid rule hi lane is a token id,
    # strictly below the PKEY_SENT (int32 max) sentinel.
    return matched[:n]


def _adjacent_pair_keys(c: jax.Array):
    """Two-lane (hi, lo) keys for each adjacent corpus pair; sentinel where
    either side is PAD/SEP."""
    nxt = jnp.roll(c, -1).at[-1].set(PAD_ID)
    valid = (c >= 0) & (nxt >= 0)
    hi = jnp.where(valid, c, PKEY_SENT)
    lo = jnp.where(valid, nxt, PKEY_SENT)
    return hi, lo, valid


def batch_fixpoint_replay(corpus: jax.Array, merges: jax.Array,
                          start, count, n_init: int) -> jax.Array:
    """Apply merges [start, start+count) as ONE rule table to fixpoint.

    Each pass matches *all* rules simultaneously (tiled compare via
    :func:`match_rules`), resolves overlapping matches with the greedy
    left-to-right parity rule, substitutes, compacts, and repeats until a
    pass changes nothing — the same fixpoint first-match semantics as
    ``tokenize()`` (hyperbolic_merge.py:433-445): when matches of different
    in-chunk rules overlap, the LEFTMOST wins (position priority, not merge
    order) — exactly how the reference's own corpus statistics behave, since
    they re-tokenize with the full rule dict (frequency_aware_…:92-112).
    Within-chunk rule chains resolve across passes. Verified exact against a
    python tokenize-fixpoint oracle (tests/test_scoring.py).
    O(passes * N * count) compares; passes ~= chain depth (typically < 10).

    Termination refinement: merging always interposes a *new* id between its
    neighbours, so a pass can only create matches for rules whose operands
    are themselves within-chunk merged ids (``>= n_init + start``). When the
    chunk has no such rule (always true in corpus-grounded mode, whose
    candidates all predate the chunk), one parity pass is provably complete
    and the fixpoint-confirmation pass is skipped.
    """
    n = corpus.shape[0]
    max_k = merges.shape[0]
    ks = jnp.arange(max_k, dtype=jnp.int32)
    in_chunk = (ks >= start) & (ks < start + count)
    can_chain = jnp.any(
        in_chunk & (jnp.max(merges, axis=1)
                    >= jnp.asarray(n_init, jnp.int32) + start))

    def one_pass(c):
        hi, lo, valid = _adjacent_pair_keys(c)
        mid = match_rules(hi, lo, merges, start, count, n_init)
        m = valid & (mid >= 0)
        prev_m = jnp.roll(m, 1).at[0].set(False)
        run_start = m & ~prev_m
        idx = jnp.arange(n, dtype=jnp.int32)
        start_idx = jnp.where(run_start, idx, jnp.int32(-1))
        last_start = blocked_cummax(start_idx)
        applied = m & (((idx - last_start) % 2) == 0)
        applied_prev = jnp.roll(applied, 1).at[0].set(False)
        out = jnp.where(applied, mid, c)
        out = jnp.where(applied_prev, PAD_ID, out)
        return compact_corpus(out), jnp.any(applied)

    def cond(carry):
        _, changed, passes = carry
        return changed & (can_chain | (passes < 1))

    def body(carry):
        c, _, passes = carry
        c2, changed = one_pass(c)
        return c2, changed, passes + 1

    out, _, _ = jax.lax.while_loop(
        cond, body, (corpus, count > 0, jnp.asarray(0, jnp.int32)))
    return out


def batch_rank_replay(corpus: jax.Array, merges: jax.Array,
                      start, count, n_init: int) -> jax.Array:
    """Apply merges [start, start+count) in RANK order (classic BPE).

    Equivalent to applying each rule fully (left-to-right non-overlapping)
    before the next — which equals priority-ordered encode
    (encode.tokenize_priority_py): a new adjacency created by applying rank r
    can only match a rule of rank > r (a rule referencing token t must
    postdate the merge that created t), so by-rank sequential application is
    order-consistent with "always apply the lowest applicable rank".

    Vectorised as passes of maximal matchings: each pass matches all rules,
    then iteratively selects matches that are local (rank, position) minima —
    adjacent candidates always carry equal rank (both survive the strict-rank
    suppression only if equal), where the left-to-right parity rule applies.
    Unselected matches always lose an operand to a selected neighbour, so a
    pass consumes every match it found; later passes only see new adjacencies
    (within-chunk chains). Verified against a rank-sequential python oracle
    (tests/test_scoring.py).
    """
    n = corpus.shape[0]
    max_k = merges.shape[0]
    ks = jnp.arange(max_k, dtype=jnp.int32)
    in_chunk = (ks >= start) & (ks < start + count)
    can_chain = jnp.any(
        in_chunk & (jnp.max(merges, axis=1)
                    >= jnp.asarray(n_init, jnp.int32) + start))
    idx = jnp.arange(n, dtype=jnp.int32)

    def select_matching(m, pri):
        """Maximal matching by (rank, pos): iterated local-minima rounds."""
        def round_cond(carry):
            alive, _ = carry
            return jnp.any(alive)

        def round_body(carry):
            alive, sel = carry
            big = jnp.int32(2**31 - 1)
            p = jnp.where(alive, pri, big)
            lp = jnp.roll(p, 1).at[0].set(big)
            rp = jnp.roll(p, -1).at[-1].set(big)
            cand = alive & (p <= lp) & (p <= rp)
            # Adjacent cands have equal rank (same rule): leftmost parity.
            prev_c = jnp.roll(cand, 1).at[0].set(False)
            run_start = cand & ~prev_c
            start_idx = jnp.where(run_start, idx, jnp.int32(-1))
            last_start = blocked_cummax(start_idx)
            take = cand & (((idx - last_start) % 2) == 0)
            sel = sel | take
            near = take | jnp.roll(take, 1).at[0].set(False) \
                | jnp.roll(take, -1).at[-1].set(False)
            return alive & ~near, sel

        _, sel = jax.lax.while_loop(
            round_cond, round_body, (m, jnp.zeros_like(m)))
        return sel

    def one_pass(c):
        hi, lo, valid = _adjacent_pair_keys(c)
        mid = match_rules(hi, lo, merges, start, count, n_init)
        m = valid & (mid >= 0)
        applied = select_matching(m, mid)  # mid is monotone in rank
        applied_prev = jnp.roll(applied, 1).at[0].set(False)
        out = jnp.where(applied, mid, c)
        out = jnp.where(applied_prev, PAD_ID, out)
        return compact_corpus(out), jnp.any(applied)

    def cond(carry):
        _, changed, passes = carry
        return changed & (can_chain | (passes < 1))

    def body(carry):
        c, _, passes = carry
        c2, changed = one_pass(c)
        return c2, changed, passes + 1

    out, _, _ = jax.lax.while_loop(
        cond, body, (corpus, count > 0, jnp.asarray(0, jnp.int32)))
    return out


def corpus_token_count(corpus: jax.Array) -> jax.Array:
    return jnp.sum(corpus >= 0).astype(jnp.int32)


# ------------------------------------------------------- pair count snapshot

def build_pair_table(corpus: jax.Array, table_size: int,
                     max_id: int | None = None):
    """Sorted (pair_key, count) snapshot of adjacent-pair frequencies.

    Pair keys are two int32 lanes (hi = left id, lo = right id) in
    lexicographic order — exact at any vocab size (the single-lane
    a*max_vocab+b packing wraps above 65535 ids). Returns
    (keys_sorted (T, 2), counts, n_unique, max_count). Unused slots hold
    key = (PKEY_SENT, PKEY_SENT) / count = 0.

    ``max_id``: static bound on token ids (the tokenizer's max_vocab_size).
    When it fits 16 bits the sort runs on the order-preserving packed key —
    one sort operand instead of two, which halves the dominant term of the
    sync compile budget (sort1@2.9M = 14.5 s vs sort2 = 30 s on TPU).
    Results are bit-identical to the two-lane sort.
    """
    khi, klo, _ = _adjacent_pair_keys(corpus)  # sentinel where PAD/SEP
    if max_id is not None and max_id <= PACK_MAX_ID:
        sk = jax.lax.sort(pack_lex(khi, klo))
        khi, klo = unpack_lex(sk)
    else:
        khi, klo = jax.lax.sort((khi, klo), num_keys=2)
    n = khi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sent = PKEY_SENT
    # Run boundaries of the sorted keys; `head` = boundaries of real runs.
    bnd = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (khi[1:] != khi[:-1]) | (klo[1:] != klo[:-1])])
    head = bnd & (khi != sent)
    # Per-run counts come from *boundary position differences* (suffix-min
    # scan + tiny gathers) rather than a second N-element scatter-add: a
    # random scatter serializes on TPU (~9 ns/element — 18 ms at N=2M),
    # while the scan is a vector op.
    nbp = blocked_cummin_reverse(jnp.where(bnd, idx, n))  # next bnd at/after i
    nbp_excl = jnp.concatenate([nbp[1:], jnp.full((1,), n, jnp.int32)])
    # One scatter: head element index per table slot (drop overflow/non-head).
    seg = blocked_cumsum(head.astype(jnp.int32)) - 1
    slot = jnp.where(head & (seg < table_size), seg, table_size)
    hp = jnp.full((table_size + 1,), n, jnp.int32).at[slot].set(idx)
    hp_t = hp[:table_size]
    ok = hp_t < n
    hp_c = jnp.minimum(hp_t, n - 1)
    keys_out = jnp.stack([jnp.where(ok, khi[hp_c], sent),
                          jnp.where(ok, klo[hp_c], sent)], axis=-1)
    counts = jnp.where(ok, nbp_excl[hp_c] - hp_t, 0).astype(jnp.int32)
    n_unique = jnp.sum(head.astype(jnp.int32))
    max_count = jnp.max(counts)
    # n_unique is the UNCLIPPED count: callers compare it against table_size
    # to detect snapshot overflow (dropped candidates are a silent cap).
    return (keys_out, counts, n_unique, max_count)


def merge_pair_tables(keys: jax.Array, counts: jax.Array,
                      n_uniques: jax.Array, table_size: int,
                      max_id: int | None = None):
    """Combine per-shard pair tables into one global sorted table.

    ``keys`` is the row-concatenation of S per-shard (T, 2) tables (shape
    (S*T, 2)), ``counts`` (S*T,), ``n_uniques`` (S,) the per-shard UNCLIPPED
    unique counts. Returns the same (keys, counts, n_unique, max_count)
    contract as :func:`build_pair_table` and is count-exact with it on the
    concatenated corpus when no shard overflowed: per-shard uniques are
    subsets of the global uniques, so "global fits in table_size" implies
    every shard fits. Under overflow, keys/counts of the kept (lex-first)
    table_size slots are STILL exact — a globally-kept key has shard-rank <=
    its global rank in every shard, so no shard dropped it — and n_unique is
    a lower bound that still exceeds table_size (shard-local overflow is
    additionally propagated by raising it past table_size), so callers'
    overflow surfacing fires identically; only the exact unclipped value is
    unknowable from truncated shard tables. Work: one O(S*T log(S*T)) sort —
    tiny next to the per-shard O(N/S log N/S) corpus sorts it parallelises.
    """
    khi, klo = keys[:, 0], keys[:, 1]
    if max_id is not None and max_id <= PACK_MAX_ID:
        sk, cnt = jax.lax.sort((pack_lex(khi, klo), counts), num_keys=1)
        khi, klo = unpack_lex(sk)
    else:
        khi, klo, cnt = jax.lax.sort((khi, klo, counts), num_keys=2)
    m = khi.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    sent = PKEY_SENT
    bnd = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (khi[1:] != khi[:-1]) | (klo[1:] != klo[:-1])])
    head = bnd & (khi != sent)
    # Per-run count = csum at the position before the next boundary minus
    # csum before the run head (counts are per-shard partial sums now, not
    # all-ones, so boundary position differences don't apply).
    csum = blocked_cumsum(cnt.astype(jnp.int32))
    nbp = blocked_cummin_reverse(jnp.where(bnd, idx, m))
    nbp_excl = jnp.concatenate([nbp[1:], jnp.full((1,), m, jnp.int32)])
    run_sum = (csum[jnp.minimum(nbp_excl - 1, m - 1)]
               - jnp.where(idx > 0, csum[jnp.maximum(idx - 1, 0)], 0))
    seg = blocked_cumsum(head.astype(jnp.int32)) - 1
    slot = jnp.where(head & (seg < table_size), seg, table_size)
    hp = jnp.full((table_size + 1,), m, jnp.int32).at[slot].set(idx)
    hp_t = hp[:table_size]
    ok = hp_t < m
    hp_c = jnp.minimum(hp_t, m - 1)
    keys_out = jnp.stack([jnp.where(ok, khi[hp_c], sent),
                          jnp.where(ok, klo[hp_c], sent)], axis=-1)
    counts_out = jnp.where(ok, run_sum[hp_c], 0).astype(jnp.int32)
    n_unique = jnp.sum(head.astype(jnp.int32))
    # Propagate shard-local overflow (dropped pairs) as global overflow.
    overflow = jnp.any(n_uniques > table_size)
    n_unique = jnp.where(overflow,
                         jnp.maximum(n_unique, table_size + 1), n_unique)
    max_count = jnp.max(counts_out)
    return (keys_out, counts_out, n_unique, max_count)


def _f32_sortable(x: jax.Array) -> jax.Array:
    """Monotone map f32 -> int32: int32 ascending == float ascending.

    Total over +/-inf; -0.0 orders just below +0.0 (the one divergence from
    IEEE equality — only visible as tie ORDER between exact +-0.0 scores)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b >= 0, b, (~b) ^ jnp.int32(_I32_MIN))


def top_k_desc(vals: jax.Array, k: int, tiebreak: jax.Array | None = None):
    """Exact per-row top-k of a (P, T) f32 array: (values, indices), values
    descending, ties broken by lowest index — ``jax.lax.top_k`` semantics.

    jax.lax.top_k's TPU emission costs ~9 s to COMPILE at (3, 131k)/k=4096
    (the sync_corpus budget, VERDICT r3 #3); this bisection select compiles
    in ~1 s: 32 rounds of binary search for the k-th value on the sortable-
    int image of the scores (a (P, T) compare+reduce per round), then one
    (P, k) mini-sort of the selected entries. Execution is a few ms — the
    queue rebuild runs once per sync, not per step.

    ``tiebreak``: optional (P, T) int32 — equal values are resolved by the
    SMALLEST tiebreak (unique per row!) instead of the smallest index, via a
    second bisection within the threshold band. The sharded sync uses the
    packed pair key here, which equals sorted-table-position order, so a
    device-partitioned selection reproduces the single-device tie-breaks
    exactly (VERDICT r3 #6).
    """
    p, t = vals.shape
    kk = min(k, t)
    s = _f32_sortable(vals)

    # Binary search (per row) for the largest threshold with
    # count(s >= thr) >= kk. Overflow-free midpoint on int32.
    def body(_, carry):
        lo, hi = carry
        # Ceiling midpoint (overflow-free): with lo=mid on success, a floor
        # midpoint would never test hi and the search sticks at lo.
        mid = (lo >> 1) + (hi >> 1) + ((lo | hi) & 1)
        cnt = jnp.sum((s >= mid[:, None]).astype(jnp.int32), axis=1)
        ge = cnt >= kk
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid - 1)

    lo0 = jnp.full((p,), _I32_MIN, jnp.int32)
    hi0 = jnp.full((p,), 2**31 - 1, jnp.int32)
    thr, _ = jax.lax.fori_loop(0, 34, body, (lo0, hi0))

    # Take all strictly-above plus the (kk - above) entries at the threshold
    # with the smallest tiebreak (default: position order).
    above = s > thr[:, None]
    n_above = jnp.sum(above.astype(jnp.int32), axis=1)
    at = s == thr[:, None]
    if tiebreak is None:
        at_rank = blocked_cumsum_rows(at.astype(jnp.int32)) - 1
        take = above | (at & (at_rank < (kk - n_above)[:, None]))
    else:
        # Second bisection: smallest (kk - n_above) tiebreak values within
        # the threshold band (tiebreaks are unique per row, so the cut is
        # exact without a rank pass).
        need = (kk - n_above)
        tb = jnp.where(at, tiebreak, jnp.int32(2**31 - 1))

        def body2(_, carry):
            lo, hi = carry
            # Floor midpoint (overflow-free): hi=mid on success converges.
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            cnt = jnp.sum((tb <= mid[:, None]).astype(jnp.int32), axis=1)
            le = cnt >= need
            return jnp.where(le, lo, mid + 1), jnp.where(le, mid, hi)

        lo2 = jnp.full((p,), _I32_MIN, jnp.int32)
        hi2 = jnp.full((p,), 2**31 - 1, jnp.int32)
        _, tcut = jax.lax.fori_loop(0, 34, body2, (lo2, hi2))
        # Strict-below plus a position-rank-limited slice AT the cut value:
        # real tiebreaks are unique, but the sentinel padding (all at value
        # IMAX with -inf scores) duplicates — an unguarded tb <= tcut would
        # over-select and positional compaction could then drop real
        # entries past slot kk.
        strictly = at & (tb < tcut[:, None])
        n_strict = jnp.sum(strictly.astype(jnp.int32), axis=1)
        at_eq = at & (tb == tcut[:, None])
        eq_rank = blocked_cumsum_rows(at_eq.astype(jnp.int32)) - 1
        take = above | strictly | (
            at_eq & (eq_rank < (need - n_strict)[:, None]))

    # Compact the selected entries to kk slots (position order), then sort
    # each row by (value desc, index asc) via (~s, idx).
    rank = blocked_cumsum_rows(take.astype(jnp.int32)) - 1
    slot = jnp.where(take, rank, kk)
    idx_t = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (p, t))
    sel_idx = jnp.full((p, kk + 1), t, jnp.int32).at[
        jnp.arange(p)[:, None], slot].set(idx_t, mode="drop")[:, :kk]
    sel_idx_c = jnp.minimum(sel_idx, t - 1)
    sel_s = jnp.where(sel_idx < t,
                      jnp.take_along_axis(s, sel_idx_c, axis=1),
                      jnp.int32(_I32_MIN))
    order_key = jnp.where(sel_idx < t, ~sel_s, jnp.int32(2**31 - 1))
    if tiebreak is None:
        order_tb = sel_idx
    else:
        order_tb = jnp.where(
            sel_idx < t,
            jnp.take_along_axis(tiebreak, sel_idx_c, axis=1),
            jnp.int32(2**31 - 1))
    _, _, out_idx = jax.lax.sort((order_key, order_tb, sel_idx),
                                 dimension=1, num_keys=2)
    out_idx_c = jnp.minimum(out_idx, t - 1)
    out_vals = jnp.where(out_idx < t,
                         jnp.take_along_axis(vals, out_idx_c, axis=1),
                         -jnp.inf)
    if kk < k:
        out_vals = jnp.pad(out_vals, ((0, 0), (0, k - kk)),
                           constant_values=-jnp.inf)
        out_idx = jnp.pad(out_idx, ((0, 0), (0, k - kk)),
                          constant_values=t)
    return out_vals, jnp.minimum(out_idx, t - 1)


def pair_dest(pk: jax.Array, n_buckets: int) -> jax.Array:
    """Hash-partition owner bucket for packed pair keys (Fibonacci mix).

    Single source of truth for the v3 sharded sync's key partition
    (parallel/sharded.py) AND the in-loop hashed table lookup
    (:func:`lookup_pair_counts_hashed`) — the two must agree or the dense
    channel reads the wrong device's slice."""
    h = (pk ^ (pk >> 15)) * jnp.int32(-1640531527)
    return (h & jnp.int32(0x7FFFFFFF)) % n_buckets


def lookup_pair_counts_hashed(q_hi: jax.Array, q_lo: jax.Array,
                              table_keys: jax.Array,
                              table_counts: jax.Array,
                              n_buckets: int) -> jax.Array:
    """Counts for (hi, lo) pairs in a HASH-PARTITIONED table (0 when absent).

    Table layout: the v3 sharded sync's persisted pair table — the
    concatenation of ``n_buckets`` per-owner slices of T/n_buckets rows,
    each slice sorted ascending by packed key with PKEY_SENT padding
    (parallel/sharded._sharded_sync_v3_fn). A query key's owner bucket is
    :func:`pair_dest`; the lookup binary-searches only that slice. Requires
    ids <= PACK_MAX_ID - 1 (the v3 gate enforces it). A slice that
    overflowed its cap (the sync's `overflow` signal / host warning) may
    have dropped keys — lookups then read 0 for the dropped pairs, exactly
    as a clipped lex table drops its tail.
    """
    t = table_keys.shape[0]
    td = t // n_buckets
    pkt = pack_lex(table_keys[:, 0], table_keys[:, 1])
    qpk = pack_lex(q_hi.astype(jnp.int32), q_lo.astype(jnp.int32))

    def one(q):
        dest = pair_dest(q, n_buckets)
        seg_k = jax.lax.dynamic_slice(pkt, (dest * td,), (td,))
        seg_c = jax.lax.dynamic_slice(table_counts, (dest * td,), (td,))
        pos = jnp.minimum(jnp.searchsorted(seg_k, q), td - 1)
        return jnp.where(seg_k[pos] == q, seg_c[pos], 0)

    return jax.vmap(one)(qpk)


def lookup_pair_counts(q_hi: jax.Array, q_lo: jax.Array,
                       table_keys: jax.Array,
                       table_counts: jax.Array) -> jax.Array:
    """Counts for (hi, lo) pair keys in a (T, 2) table (0 when absent)."""
    q_hi = q_hi.astype(jnp.int32)
    q_lo = q_lo.astype(jnp.int32)
    t_hi = table_keys[:, 0]
    t_lo = table_keys[:, 1]
    pos = searchsorted_pairs(t_hi, t_lo, q_hi, q_lo)
    pos = jnp.minimum(pos, t_hi.shape[0] - 1)
    hit = (t_hi[pos] == q_hi) & (t_lo[pos] == q_lo)
    return jnp.where(hit, table_counts[pos], 0)
