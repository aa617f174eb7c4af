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

PAD_ID = jnp.int32(-1)
# Line separator: breaks adjacency (the reference counts pairs per line,
# frequency_aware_…:92-112) but survives compaction, unlike PAD.
SEP_ID = jnp.int32(-2)

# Two 16-bit-prime rolling hashes packed into one uint32 key (x64 is disabled;
# 65520^2 < 2^32 keeps the modular products exact in uint32).
HASH_P1 = 65521
HASH_P2 = 65519
HASH_B1 = 257
HASH_B2 = 263
MAX_HASH_LEN = 4096  # token-length cap for the power tables


def hash_powers(max_len: int = MAX_HASH_LEN):
    """Power tables B^k mod p for both hash primes, shape (2, max_len).

    Computed host-side with numpy (it is constant data; tracing a 4096-step
    scan just to build it costs real compile time).
    """
    import numpy as _np

    def powers(b, p):
        out = _np.empty((max_len,), _np.uint32)
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
    """Pack the two residues into one uint32 lookup key."""
    return (jnp.uint32(h1) * jnp.uint32(65536) + jnp.uint32(h2)).astype(jnp.uint32)


def compose_hash(h_i: jax.Array, h_j: jax.Array, byte_len_j: jax.Array,
                 powers: jax.Array) -> jax.Array:
    """hash(a+b) from hash(a), hash(b), len_bytes(b). Shapes (..., 2)."""
    idx = jnp.minimum(byte_len_j, MAX_HASH_LEN - 1)
    p1 = powers[0, idx]
    p2 = powers[1, idx]
    c1 = (h_i[..., 0] * p1 + h_j[..., 0]) % jnp.uint32(HASH_P1)
    c2 = (h_i[..., 1] * p2 + h_j[..., 1]) % jnp.uint32(HASH_P2)
    return jnp.stack([c1, c2], axis=-1)


def in_sorted_set(keys: jax.Array, table: jax.Array, table_size: jax.Array) -> jax.Array:
    """Membership of uint32 keys in a sorted uint32 table (padded with max)."""
    pos = jnp.searchsorted(table, keys)
    pos = jnp.minimum(pos, table.shape[0] - 1)
    return (table[pos] == keys) & (pos < table_size)


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
    last_start = jax.lax.associative_scan(jnp.maximum, start_idx)
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
    target = jnp.where(nonpad, jnp.cumsum(nonpad.astype(jnp.int32)) - 1, n)
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


def batch_fixpoint_replay(corpus: jax.Array, merges: jax.Array,
                          start, count, n_init: int, max_vocab: int) -> jax.Array:
    """Apply merges [start, start+count) as ONE rule table to fixpoint.

    Each pass matches *all* rules simultaneously (pair-key search in a sorted
    table), resolves overlapping matches with the greedy left-to-right parity
    rule, substitutes, compacts, and repeats until a pass changes nothing —
    the same fixpoint first-match semantics as ``tokenize()``
    (hyperbolic_merge.py:433-445). This is exact, not an approximation:
    within-chunk rule chains resolve across passes, and later rules can never
    enable earlier ones (every rule's operand ids predate every later merge's
    new id), so fixpoint == sequential replay order. O(passes * N log K)
    instead of O(count * N); passes ~= chain depth (typically < 10).
    """
    max_k = merges.shape[0]
    n = corpus.shape[0]
    ks = jnp.arange(max_k, dtype=jnp.int32)
    in_chunk = (ks >= start) & (ks < start + count)
    rule_keys = jnp.where(
        in_chunk,
        merges[:, 0].astype(jnp.uint32) * jnp.uint32(max_vocab)
        + merges[:, 1].astype(jnp.uint32),
        jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(rule_keys)
    rule_keys = rule_keys[order]
    rule_ids = (jnp.asarray(n_init, jnp.int32) + ks)[order]

    def one_pass(c):
        nxt = jnp.roll(c, -1).at[-1].set(PAD_ID)
        valid = (c >= 0) & (nxt >= 0)
        key = jnp.where(
            valid,
            c.astype(jnp.uint32) * jnp.uint32(max_vocab)
            + nxt.astype(jnp.uint32),
            jnp.uint32(0xFFFFFFFF))
        pos = jnp.minimum(jnp.searchsorted(rule_keys, key), max_k - 1)
        m = valid & (rule_keys[pos] == key)
        prev_m = jnp.roll(m, 1).at[0].set(False)
        run_start = m & ~prev_m
        idx = jnp.arange(n, dtype=jnp.int32)
        start_idx = jnp.where(run_start, idx, jnp.int32(-1))
        last_start = jax.lax.associative_scan(jnp.maximum, start_idx)
        applied = m & (((idx - last_start) % 2) == 0)
        applied_prev = jnp.roll(applied, 1).at[0].set(False)
        out = jnp.where(applied, rule_ids[pos], c)
        out = jnp.where(applied_prev, PAD_ID, out)
        return compact_corpus(out), jnp.any(applied)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        c, _ = carry
        return one_pass(c)

    out, _ = jax.lax.while_loop(cond, body, (corpus, count > 0))
    return out


def corpus_token_count(corpus: jax.Array) -> jax.Array:
    return jnp.sum(corpus >= 0).astype(jnp.int32)


# ------------------------------------------------------- pair count snapshot

def build_pair_table(corpus: jax.Array, max_vocab: int, table_size: int):
    """Sorted (pair_key, count) snapshot of adjacent-pair frequencies.

    pair_key = a * max_vocab + b in uint32 (requires max_vocab^2 < 2^32).
    Returns (keys_sorted, counts, n_unique, max_count). Unused slots hold
    key=0xFFFFFFFF / count=0.
    """
    a = corpus
    b = jnp.roll(corpus, -1).at[-1].set(PAD_ID)
    valid = (a >= 0) & (b >= 0)  # excludes PAD and SEP
    key = jnp.where(
        valid,
        a.astype(jnp.uint32) * jnp.uint32(max_vocab) + b.astype(jnp.uint32),
        jnp.uint32(0xFFFFFFFF),
    )
    key = jnp.sort(key)
    # Run heads of the sorted keys (sentinel runs excluded).
    prev = jnp.roll(key, 1)
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_), key[1:] != prev[1:]])
    head = head & (key != jnp.uint32(0xFFFFFFFF))
    # Segment id of each element = index of its run; sentinel/overflow -> slot
    # table_size (dropped).
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg = jnp.where((key == jnp.uint32(0xFFFFFFFF)) | (seg >= table_size),
                    table_size, seg)
    counts = jnp.zeros((table_size + 1,), jnp.int32).at[seg].add(1)
    keys_out = jnp.full((table_size + 1,), jnp.uint32(0xFFFFFFFF))
    keys_out = keys_out.at[jnp.where(head, seg, table_size)].set(key)
    n_unique = jnp.sum(head.astype(jnp.int32))
    max_count = jnp.max(counts[:table_size])
    return (keys_out[:table_size], counts[:table_size],
            jnp.minimum(n_unique, table_size), max_count)


def lookup_pair_counts(keys: jax.Array, table_keys: jax.Array,
                      table_counts: jax.Array) -> jax.Array:
    """Counts for uint32 pair keys (0 when absent)."""
    pos = jnp.searchsorted(table_keys, keys)
    pos = jnp.minimum(pos, table_keys.shape[0] - 1)
    return jnp.where(table_keys[pos] == keys, table_counts[pos], 0)
