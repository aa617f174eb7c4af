"""Unit tests for the device-side scoring primitives."""

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.tokenizer import scoring as S


def test_apply_merge_simple():
    c = jnp.asarray([1, 2, 3, 1, 2, 5], jnp.int32)
    out = np.asarray(S.apply_merge_to_corpus(c, 1, 2, 9))
    np.testing.assert_array_equal(out, [9, -1, 3, 9, -1, 5])


def test_apply_merge_overlapping_run():
    # aaaa with (a,a)->x : greedy left-to-right gives x x (positions 0,2).
    c = jnp.asarray([4, 4, 4, 4], jnp.int32)
    out = np.asarray(S.apply_merge_to_corpus(c, 4, 4, 9))
    np.testing.assert_array_equal(out, [9, -1, 9, -1])
    # aaa -> x a
    c = jnp.asarray([4, 4, 4], jnp.int32)
    out = np.asarray(S.apply_merge_to_corpus(c, 4, 4, 9))
    np.testing.assert_array_equal(out, [9, -1, 4])


def test_compact_corpus():
    c = jnp.asarray([9, -1, 3, -1, -1, 5], jnp.int32)
    out = np.asarray(S.compact_corpus(c))
    np.testing.assert_array_equal(out, [9, 3, 5, -1, -1, -1])


def test_replay_matches_python_tokenizer():
    """Replaying merges on the id corpus == applying rules to the string."""
    from hyptokenizer_tpu.tokenizer.encode import Encoder
    vocab = ["a", "b", "c", "ab", "abc", "<unk>"]
    merges = [("a", "b", "ab"), ("ab", "c", "abc")]
    enc = Encoder(vocab, merges)
    text = "abcabbcaabc"
    # Initial char ids:
    ids0 = [vocab.index(ch) for ch in text]
    corpus = jnp.asarray(ids0 + [-1] * 5, jnp.int32)
    pairs = jnp.asarray([[0, 1], [3, 2]], jnp.int32)
    # merge k creates token id n_init + k with n_init=3 ("ab"=3, "abc"=4)
    out = S.replay_merges_on_corpus(corpus, pairs, 3, jnp.asarray(2))
    got = [int(x) for x in np.asarray(out) if x != -1]
    want = enc.encode_py(text)
    assert got == want


def test_pair_table_counts():
    c = jnp.asarray([1, 2, 1, 2, 2, 1, -1, -1], jnp.int32)
    keys, counts, n_unique, max_count = S.build_pair_table(c, 16)
    # pairs: (1,2) x2, (2,1) x2, (2,2) x1  — (1,-1) invalid
    lk = S.lookup_pair_counts(
        jnp.asarray([1, 2, 2, 3], jnp.int32),
        jnp.asarray([2, 1, 2, 3], jnp.int32), keys, counts)
    np.testing.assert_array_equal(np.asarray(lk), [2, 2, 1, 0])
    assert int(n_unique) == 3
    assert int(max_count) == 2


def test_hash_compose_matches_host():
    powers = S.hash_powers()
    for a, b in [("ab", "cd"), ("x", "yz"), ("hello", "world"), ("", "ab")]:
        ha = S.hash_string(a)
        hb = S.hash_string(b)
        hc = S.hash_string(a + b)
        dev = S.compose_hash(
            jnp.asarray([ha], jnp.int32), jnp.asarray([hb], jnp.int32),
            jnp.asarray([len(b.encode())], jnp.int32), powers)
        assert (int(dev[0, 0]), int(dev[0, 1])) == hc, (a, b)


def test_in_sorted_set():
    from hyptokenizer_tpu.utils.morphology import MorphologyTables
    t = MorphologyTables(morph_set={"ing", "ed", "pre"}, word_set={"dog"})
    mk, ms, wk, ws = t.hash_tables()
    keys = []
    for s in ["ing", "dog", "zzz"]:
        h1, h2 = S.hash_string(s)
        keys.append(h1 * 65536 + h2)
    keys = jnp.asarray(keys, jnp.int32)
    got = np.asarray(S.in_sorted_set(keys, jnp.asarray(mk), jnp.asarray(ms)))
    np.testing.assert_array_equal(got, [True, False, False])
    got_w = np.asarray(S.in_sorted_set(keys, jnp.asarray(wk), jnp.asarray(ws)))
    np.testing.assert_array_equal(got_w, [False, True, False])


def test_match_rules_group_boundaries():
    """Tiled rule matching == naive lookup, across rule-group boundaries."""
    rng = np.random.default_rng(3)
    max_v = 5000
    max_k = 2000
    n_init = 44
    merges = np.full((max_k, 2), -1, np.int32)
    merges[:1600] = rng.integers(0, 60, (1600, 2))
    # Rule window straddles the 512-wide group boundary at 1024.
    start, count = 900, 300
    hi_np = rng.integers(0, 60, 4096).astype(np.int32)
    lo_np = rng.integers(0, 60, 4096).astype(np.int32)
    # Sprinkle keys that actually match in-window rules.
    for k in range(start, start + count, 7):
        p = rng.integers(0, 4096)
        hi_np[p], lo_np[p] = merges[k, 0], merges[k, 1]
    got = np.asarray(S.match_rules(
        jnp.asarray(hi_np), jnp.asarray(lo_np), jnp.asarray(merges),
        jnp.asarray(start), jnp.asarray(count), n_init))
    naive = {}
    for k in range(start, start + count):
        kk = (merges[k, 0], merges[k, 1])
        if kk not in naive:                 # first rule wins is irrelevant:
            naive[kk] = n_init + k          # duplicates can't occur in real
    want = np.asarray([naive.get((h, l), -1)
                       for h, l in zip(hi_np, lo_np)])
    # Where duplicate synthetic rules share a key, match_rules returns the
    # max id; accept either by masking those keys out.
    from collections import Counter
    dup = {kk for kk, c in Counter(
        (merges[k, 0], merges[k, 1])
        for k in range(start, start + count)).items() if c > 1}
    mask = np.asarray([(h, l) not in dup for h, l in zip(hi_np, lo_np)])
    np.testing.assert_array_equal(got[mask], want[mask])
    assert max_v  # id magnitudes no longer bound the key packing


def test_membership_sort_join_matches_binary_search():
    rng = np.random.default_rng(5)
    table = np.unique(rng.integers(0, 1 << 20, 3000).astype(np.int32))
    pad = np.full(4096 - table.shape[0], S.HKEY_SENT, np.int32)
    tbl = jnp.asarray(np.concatenate([table, pad]))
    tsize = jnp.asarray(table.shape[0], jnp.int32)
    queries = np.concatenate([
        rng.choice(table, 2000),                       # hits
        rng.integers(0, 1 << 20, 3000).astype(np.int32),  # mostly misses
        np.asarray([S.HKEY_SENT, 0, table[0], table[-1]], np.int32),
    ])
    q = jnp.asarray(queries)
    got = np.asarray(S._membership_sort_join(q, tbl, tsize))
    pos = np.minimum(np.searchsorted(np.asarray(tbl), queries), 4095)
    want = (np.asarray(tbl)[pos] == queries) & (pos < int(tsize))
    np.testing.assert_array_equal(got, want)


def test_pair_table_matches_counter_random():
    """build_pair_table == collections.Counter on a random corpus."""
    from collections import Counter
    rng = np.random.default_rng(7)
    c = rng.integers(0, 50, 5000).astype(np.int32)
    c[rng.integers(0, 5000, 300)] = -2   # SEP
    c[4200:] = -1                        # PAD tail
    keys, counts, n_unique, max_count = S.build_pair_table(
        jnp.asarray(c), 4096)
    want = Counter((int(a), int(b)) for a, b in zip(c[:-1], c[1:])
                   if a >= 0 and b >= 0)
    got = {}
    for (a, b), n in zip(np.asarray(keys), np.asarray(counts)):
        if int(a) != int(S.PKEY_SENT):
            got[(int(a), int(b))] = int(n)
    assert got == dict(want)
    assert int(n_unique) == len(want)
    assert int(max_count) == max(want.values())


def test_morphology_analysis():
    from hyptokenizer_tpu.utils import morphology
    lines = ["the walking dog was walking quickly",
             "walking dogs walk and walk the walking walk"] * 10
    t = morphology.analyze_corpus(lines, use_wordnet=False)
    assert t.is_potential_morpheme("ing")        # common suffix list
    assert t.is_valid_word("walking")            # frequent word
    assert t.is_valid_word("cat")                # vowel fallback, len>=3
    assert not t.is_valid_word("zz")             # no vowel, short


def test_train_config_roundtrip(tmp_path):
    from hyptokenizer_tpu.utils.config import TrainConfig
    cfg = TrainConfig(embedding_dim=64, alpha=0.5,
                      phase_transition_steps={2: 100, 3: 200})
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    cfg2 = TrainConfig.from_json(path)
    assert cfg2 == cfg
    cfg3 = TrainConfig.from_json(cfg.to_json())
    assert cfg3 == cfg
    kw = cfg.tokenizer_kwargs()
    assert kw["alpha"] == 0.5 and kw["max_vocab_size"] == cfg.max_vocab_size


def test_batch_replay_matches_tokenize_fixpoint_oracle():
    """Chunked batch_fixpoint_replay == the reference's tokenize() fixpoint
    semantics (multi-pass leftmost-first-match with cascade,
    hyperbolic_merge.py:433-445) applied chunk-by-chunk. In particular, when
    matches of different in-chunk rules overlap, the LEFTMOST wins — not the
    earlier merge."""
    import random

    def tokenize_fixpoint(c, rules):
        toks = list(c)
        changed = True
        while changed:
            changed = False
            i = 0
            while i < len(toks) - 1:
                key = (toks[i], toks[i + 1])
                if toks[i] >= 0 and toks[i + 1] >= 0 and key in rules:
                    toks[i] = rules[key]
                    toks.pop(i + 1)
                    changed = True
                else:
                    i += 1
        return toks

    rng = random.Random(0)
    MAXV = 64
    n_init = 8
    for trial in range(15):
        N = rng.randint(10, 120)
        corpus = [rng.randrange(n_init) for _ in range(N)]
        for k in range(0, N, rng.randint(5, 15)):
            corpus[k] = -2
        merges, seen = [], set()
        for k in range(rng.randint(1, 20)):
            a = rng.randrange(n_init + k)
            b = rng.randrange(n_init + k)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            merges.append([a, b])
        K = len(merges)
        pad = 160
        dev = jnp.full((pad,), -1, jnp.int32).at[:N].set(
            jnp.asarray(corpus, jnp.int32))
        mergearr = jnp.full((32, 2), -1, jnp.int32).at[:K].set(
            jnp.asarray(merges, jnp.int32))
        ref = list(corpus)
        start = 0
        while start < K:
            cnt = min(rng.randint(1, 6), K - start)
            rules = {(merges[k][0], merges[k][1]): n_init + k
                     for k in range(start, start + cnt)}
            ref = tokenize_fixpoint(ref, rules)
            dev = S.batch_fixpoint_replay(dev, mergearr, start, cnt,
                                          n_init)
            start += cnt
        got = [int(x) for x in np.asarray(dev) if int(x) != -1]
        assert got == ref, (trial, corpus, merges)


def test_batch_rank_replay_matches_sequential_oracle():
    """batch_rank_replay == applying each merge fully (left-to-right
    non-overlapping) in rank order — the classic BPE trajectory that
    priority-mode encode reproduces."""
    import random

    def seq_apply(c, a, b, nid):
        out = []
        i = 0
        while i < len(c):
            if (i + 1 < len(c) and c[i] == a and c[i + 1] == b
                    and c[i] >= 0 and c[i + 1] >= 0):
                out.append(nid)
                i += 2
            else:
                out.append(c[i])
                i += 1
        return out

    rng = random.Random(1)
    MAXV = 64
    n_init = 8
    for trial in range(15):
        N = rng.randint(10, 120)
        corpus = [rng.randrange(n_init) for _ in range(N)]
        for k in range(0, N, rng.randint(5, 15)):
            corpus[k] = -2
        merges, seen = [], set()
        for k in range(rng.randint(1, 20)):
            a = rng.randrange(n_init + k)
            b = rng.randrange(n_init + k)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            merges.append([a, b])
        K = len(merges)
        ref = list(corpus)
        for k, (a, b) in enumerate(merges):
            ref = seq_apply(ref, a, b, n_init + k)
        pad = 160
        dev = jnp.full((pad,), -1, jnp.int32).at[:N].set(
            jnp.asarray(corpus, jnp.int32))
        mergearr = jnp.full((32, 2), -1, jnp.int32).at[:K].set(
            jnp.asarray(merges, jnp.int32))
        start = 0
        while start < K:
            cnt = min(rng.randint(1, 6), K - start)
            dev = S.batch_rank_replay(dev, mergearr, start, cnt,
                                      n_init)
            start += cnt
        got = [int(x) for x in np.asarray(dev) if int(x) != -1]
        assert got == ref, (trial, corpus, merges)


def test_pair_keys_exact_above_uint16_ids():
    """Regression: ids > 65535 (reference default max_vocab_size=100000).

    The old single-lane packing a*max_vocab+b wrapped in uint32 above 65535
    ids, aliasing distinct pairs. Two pairs chosen to collide under the old
    packing must stay distinct in the two-lane table.
    """
    max_v = 100_000
    a1, b1 = 92_950, 1_000
    a2, b2 = 50_000, 33_704
    # Premise check: these DO alias under the old uint32 packing.
    old1 = np.uint32(np.uint64(a1) * np.uint64(max_v) + np.uint64(b1))
    old2 = np.uint32(np.uint64(a2) * np.uint64(max_v) + np.uint64(b2))
    assert old1 == old2
    c = jnp.asarray([a1, b1, -2, a2, b2, -2, a1, b1, -1, -1], jnp.int32)
    keys, counts, n_unique, max_count = S.build_pair_table(c, 16)
    got = {(int(h), int(l)): int(n)
           for (h, l), n in zip(np.asarray(keys), np.asarray(counts))
           if int(h) != int(S.PKEY_SENT)}
    assert got == {(a1, b1): 2, (a2, b2): 1}
    assert int(n_unique) == 2

    lk = S.lookup_pair_counts(
        jnp.asarray([a1, a2, a1], jnp.int32),
        jnp.asarray([b1, b2, b2], jnp.int32), keys, counts)
    np.testing.assert_array_equal(np.asarray(lk), [2, 1, 0])

    # Replay with high-id rules: (a1, b1) -> 100001-ish new id.
    merges = jnp.full((8, 2), -1, jnp.int32).at[0].set(
        jnp.asarray([a1, b1], jnp.int32))
    n_init = 95_000
    out = S.batch_fixpoint_replay(c, merges, 0, jnp.asarray(1), n_init)
    got = [int(x) for x in np.asarray(out) if int(x) != -1]
    assert got == [n_init, -2, a2, b2, -2, n_init]


def test_searchsorted_pairs_and_membership_oracle():
    rng = np.random.default_rng(11)
    tbl = np.unique(
        rng.integers(0, 1 << 20, (3000, 2)).astype(np.int32), axis=0)
    order = np.lexsort((tbl[:, 1], tbl[:, 0]))
    tbl = tbl[order]
    tsize = tbl.shape[0]
    pad = np.full((4096 - tsize, 2), S.PKEY_SENT, np.int32)
    full = np.concatenate([tbl, pad])
    queries = np.concatenate([
        tbl[rng.integers(0, tsize, 2000)],                # hits
        rng.integers(0, 1 << 20, (3000, 2)).astype(np.int32),  # misses
        np.asarray([[S.PKEY_SENT, S.PKEY_SENT], [0, 0]], np.int32),
        tbl[:1], tbl[-1:],
    ])
    t_hi = jnp.asarray(full[:, 0])
    t_lo = jnp.asarray(full[:, 1])
    q_hi = jnp.asarray(queries[:, 0])
    q_lo = jnp.asarray(queries[:, 1])
    tbl_set = {tuple(r) for r in tbl}
    want = np.asarray([tuple(q) in tbl_set for q in queries])
    # Sort-join path (>= 4096 queries) and binary-search path (small).
    got_big = np.asarray(S.in_sorted_pair_set(
        q_hi, q_lo, t_hi, t_lo, jnp.asarray(tsize, jnp.int32)))
    np.testing.assert_array_equal(got_big, want)
    got_small = np.asarray(S.in_sorted_pair_set(
        q_hi[:100], q_lo[:100], t_hi, t_lo, jnp.asarray(tsize, jnp.int32)))
    np.testing.assert_array_equal(got_small, want[:100])
    # searchsorted positions against numpy's lexicographic oracle.
    pos = np.asarray(S.searchsorted_pairs(t_hi, t_lo, q_hi[:500], q_lo[:500]))
    fullv = full[:, 0].astype(np.uint64) * (1 << 32) + full[:, 1]
    qv = (queries[:500, 0].astype(np.uint64) * (1 << 32)
          + queries[:500, 1])
    np.testing.assert_array_equal(pos, np.searchsorted(fullv, qv))


def test_fast_corpus_encoder_matches_python_oracle():
    """Vectorised encode_corpus_chars == the python reference path, across
    pre-split modes, truncation lengths, empty lines, unknown chars, and
    regex-gap chars ('_')."""
    import random
    from hyptokenizer_tpu.tokenizer import normalize as N
    from hyptokenizer_tpu.utils.data import (
        encode_corpus_chars, encode_corpus_chars_py)

    rng = random.Random(1)
    alphabet = "ab c.,019_é!  \t"
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(set("abc.,019 é!"))
    for trial in range(120):
        texts = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randrange(0, 25)))
                 for _ in range(rng.randrange(0, 6))]
        for ps in (None, N.WHITESPACE, N.WORDS_WITH_SPACE):
            for mt in (8, 64, 512):
                a = encode_corpus_chars(texts, vocab, mt, pre_split=ps)
                b = encode_corpus_chars_py(texts, vocab, mt, pre_split=ps)
                np.testing.assert_array_equal(a, b, err_msg=f"{texts} {ps}")
    # Non-canonical pattern falls back to the python path.
    a = encode_corpus_chars(["ab ab"], vocab, 16, pre_split=r"[a-z]+")
    b = encode_corpus_chars_py(["ab ab"], vocab, 16, pre_split=r"[a-z]+")
    np.testing.assert_array_equal(a, b)


def test_merge_pair_tables_matches_full_build():
    """Sharded pair counting (per-shard build_pair_table + merge_pair_tables)
    is count-exact with the full-corpus build when the table fits, and
    signals overflow identically when it doesn't."""
    rng = np.random.default_rng(7)
    c = rng.integers(0, 12, 4096).astype(np.int32)  # 144 distinct pairs max
    c[rng.integers(0, 4096, 150)] = S.SEP_ID
    for k in range(1, 4):
        c[k * 1024 - 1] = S.SEP_ID  # aligned shard boundaries
    for t_size in (256, 64):  # fits / overflows (at 64 < pair diversity)
        full = S.build_pair_table(jnp.asarray(c), t_size)
        shards = [S.build_pair_table(jnp.asarray(c[k * 1024:(k + 1) * 1024]),
                                     t_size) for k in range(4)]
        merged = S.merge_pair_tables(
            jnp.concatenate([s[0] for s in shards]),
            jnp.concatenate([s[1] for s in shards]),
            jnp.stack([s[2] for s in shards]), t_size)
        np.testing.assert_array_equal(np.asarray(full[0]),
                                      np.asarray(merged[0]))  # keys
        np.testing.assert_array_equal(np.asarray(full[1]),
                                      np.asarray(merged[1]))  # counts
        assert int(full[3]) == int(merged[3])                 # max_count
        if int(full[2]) <= t_size:
            assert int(full[2]) == int(merged[2])
        else:  # overflow: exact value unknowable, signal must still fire
            assert int(merged[2]) > t_size


def test_blocked_scans_match_flat():
    """Two-level blocked scans are bit-exact vs the flat XLA scans (they
    replace them at corpus sizes purely for compile time)."""
    from hyptokenizer_tpu.tokenizer import scoring as S
    rng = np.random.default_rng(0)
    for n in (7, 8192 * 2, 8192 * 2 + 1, 50_001, 8192 * 5 + 137):
        x = jnp.asarray(rng.integers(-1000, 1000, n), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(S.blocked_cumsum(x)), np.cumsum(np.asarray(x)))
        np.testing.assert_array_equal(
            np.asarray(S.blocked_cummax(x)),
            np.maximum.accumulate(np.asarray(x)))
        np.testing.assert_array_equal(
            np.asarray(S.blocked_cummin_reverse(x)),
            np.minimum.accumulate(np.asarray(x)[::-1])[::-1])


def test_packed_pair_table_matches_two_lane():
    """build_pair_table with the order-preserving packed sort (max_id<=65535)
    is bit-identical to the two-lane sort path."""
    from hyptokenizer_tpu.tokenizer import scoring as S
    rng = np.random.default_rng(1)
    corpus = rng.integers(0, 60_000, 5000).astype(np.int32)
    corpus[rng.random(5000) < 0.05] = -1   # PAD
    corpus[rng.random(5000) < 0.05] = -2   # SEP
    c = jnp.asarray(corpus)
    a = S.build_pair_table(c, 4096)
    b = S.build_pair_table(c, 4096, max_id=60_001)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ids beyond the packable bound fall back to the two-lane sort
    c2 = jnp.asarray(np.where(corpus > 0, corpus + 60_000, corpus))
    a2 = S.build_pair_table(c2, 4096)
    b2 = S.build_pair_table(c2, 4096, max_id=200_000)
    for x, y in zip(a2, b2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pack_lex_roundtrip_and_order():
    from hyptokenizer_tpu.tokenizer import scoring as S
    rng = np.random.default_rng(2)
    hi = jnp.asarray(rng.integers(0, 65535, 2000), jnp.int32)
    lo = jnp.asarray(rng.integers(0, 65535, 2000), jnp.int32)
    k = S.pack_lex(hi, lo)
    h2, l2 = S.unpack_lex(k)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(hi))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(lo))
    # int32 order of packed == lex order of (hi, lo)
    order_packed = np.argsort(np.asarray(k), kind="stable")
    order_lex = np.lexsort((np.asarray(lo), np.asarray(hi)))
    kk = np.asarray(k)
    assert (kk[order_packed] == kk[order_lex]).all()


def test_top_k_desc_matches_lax_top_k():
    from hyptokenizer_tpu.tokenizer import scoring as S
    rng = np.random.default_rng(3)
    # Heavy ties + -inf entries (the queue-build regime).
    vals = rng.choice([-np.inf, 0.5, 1.0, 2.0, 3.25], size=(3, 9000),
                      p=[0.4, 0.2, 0.2, 0.1, 0.1]).astype(np.float32)
    v = jnp.asarray(vals)
    for k in (1, 7, 256, 4096):
        tv, ti = jax.lax.top_k(v, k)
        mv, mi = S.top_k_desc(v, k)
        np.testing.assert_array_equal(np.asarray(mv), np.asarray(tv))
        np.testing.assert_array_equal(np.asarray(mi), np.asarray(ti))
    # Dense random values too.
    v2 = jnp.asarray(rng.standard_normal((2, 5000)).astype(np.float32))
    tv, ti = jax.lax.top_k(v2, 100)
    mv, mi = S.top_k_desc(v2, 100)
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(tv))
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(ti))


def test_replayed_corpus_never_contains_historical_pairs():
    """The invariant that lets the live sync skip the consumed-history join
    (enhanced_state._sync_finish): after replay, every historical pair's
    adjacency count is zero — for BOTH replay orders."""
    from hyptokenizer_tpu.tokenizer import scoring as S
    rng = np.random.default_rng(4)
    n_init = 6
    corpus = rng.integers(0, n_init, 400).astype(np.int32)
    corpus[::37] = -2  # SEPs
    for replay in (S.batch_fixpoint_replay, S.batch_rank_replay):
        merges = np.full((32, 2), -1, np.int32)
        c = jnp.asarray(np.concatenate([corpus, -np.ones(100, np.int32)]))
        hist = []
        for k in range(12):
            # Merge the most frequent current pair (classic BPE choice).
            keys, counts, _, _ = S.build_pair_table(c, 512)
            i = int(np.asarray(jnp.argmax(counts)))
            a, b = int(np.asarray(keys)[i, 0]), int(np.asarray(keys)[i, 1])
            if np.asarray(counts)[i] == 0:
                break
            merges[k] = (a, b)
            hist.append((a, b))
            c = replay(c, jnp.asarray(merges), jnp.asarray(k, jnp.int32),
                       jnp.asarray(1, jnp.int32), n_init)
        keys, counts, _, _ = S.build_pair_table(c, 512)
        kn = np.asarray(keys)
        cn = np.asarray(counts)
        table = {(int(h), int(l)): int(ct) for (h, l), ct in zip(kn, cn)}
        for pair in hist:
            assert table.get(pair, 0) == 0, (replay.__name__, pair)


def test_top_k_desc_tiebreak_mode():
    """tiebreak mode resolves equal values by the smallest tiebreak and
    orders output by (value desc, tiebreak asc) — the sharded sync's exact
    global-merge contract."""
    from hyptokenizer_tpu.tokenizer import scoring as S
    rng = np.random.default_rng(7)
    vals = rng.choice([1.0, 2.0, 3.0], size=(2, 600)).astype(np.float32)
    # Unique random tiebreaks (a permutation).
    tb = np.stack([rng.permutation(600), rng.permutation(600)]).astype(
        np.int32)
    for k in (5, 64, 300):
        mv, mi = S.top_k_desc(jnp.asarray(vals), k, tiebreak=jnp.asarray(tb))
        for r in range(2):
            order = sorted(range(600), key=lambda i: (-vals[r, i], tb[r, i]))
            want_idx = order[:k]
            np.testing.assert_array_equal(np.asarray(mi)[r], want_idx)
            np.testing.assert_array_equal(np.asarray(mv)[r],
                                          vals[r, want_idx])
