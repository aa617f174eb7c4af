"""Sharded merge loop: collective correctness on the 8-device CPU mesh.

SURVEY §4: CPU-mesh simulation for multi-chip behavior, plus single-chip vs
N-chip equivalence. Min/argmin reductions and row-partitioned matvecs are
order-independent in the sharded dimension, so the sharded merge sequence must
be *bit-identical* to single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.parallel import make_mesh, run_merges_sharded
from hyptokenizer_tpu.parallel.mesh import pad_vocab_for_mesh, shard_state
from hyptokenizer_tpu.tokenizer import MergeConfig, init_state, run_merges


def build(max_v=64, n=24, d=8, threshold=3.0):
    vocab_lengths = jnp.asarray([1 + i % 3 for i in range(n)], jnp.int32)
    emb = L.random_points(jax.random.PRNGKey(3), n, d, sigma=0.6)
    config = MergeConfig(max_vocab_size=max_v, search_block=16)
    st = init_state(emb, vocab_lengths, curvature=1.0, threshold=threshold,
                    config=config)
    return st, config


def test_mesh_has_8_devices():
    assert jax.device_count() == 8


def test_sharded_equals_single_device():
    st, config = build(max_v=pad_vocab_for_mesh(64, 8))
    single = run_merges(st, config, 15)

    st2, _ = build(max_v=pad_vocab_for_mesh(64, 8))
    mesh = make_mesh()
    sharded = run_merges_sharded(st2, config, 15, mesh)

    assert int(single.num_merges) == int(sharded.num_merges)
    n = int(single.num_merges)
    assert n > 3
    np.testing.assert_array_equal(np.asarray(single.merges[:n]),
                                  np.asarray(sharded.merges[:n]))
    np.testing.assert_allclose(np.asarray(single.emb), np.asarray(sharded.emb),
                               atol=1e-6)
    assert float(single.threshold) == float(sharded.threshold)


def test_sharded_chained_calls():
    st, config = build(max_v=pad_vocab_for_mesh(64, 8))
    mesh = make_mesh()
    s1 = run_merges_sharded(st, config, 5, mesh)
    s2 = run_merges_sharded(s1, config, 5, mesh)
    assert int(s2.step) == 10

    st2, _ = build(max_v=pad_vocab_for_mesh(64, 8))
    ref = run_merges(st2, config, 10)
    assert int(ref.num_merges) == int(s2.num_merges)
    np.testing.assert_array_equal(
        np.asarray(ref.merges[: int(ref.num_merges)]),
        np.asarray(s2.merges[: int(s2.num_merges)]))


def test_state_sharding_layout():
    st, config = build(max_v=pad_vocab_for_mesh(64, 8))
    mesh = make_mesh()
    sh = shard_state(st, mesh)
    # emb rows split 8 ways; scalars replicated.
    assert sh.emb.sharding.num_devices == 8
    shard_shapes = {s.data.shape for s in sh.emb.addressable_shards}
    assert shard_shapes == {(st.emb.shape[0] // 8, st.emb.shape[1])}
    assert sh.threshold.sharding.is_fully_replicated


def test_graft_entry_smoke():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.base.emb)
    assert int(out.base.step) == 1
    mod.dryrun_multichip(8)


def test_enhanced_sharded_equals_single_device():
    """The flagship scored loop is SPMD-shardable with identical results."""
    from hyptokenizer_tpu.parallel.sharded import run_enhanced_sharded
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    corpus = ["abc abd abe fgh", "cde cdf fgh abc"] * 6

    def build_tok():
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
            {ch for l in corpus for ch in l})
        emb = L.random_points(jax.random.PRNGKey(5), len(vocab), 8, sigma=0.6)
        return EnhancedHyperbolicTokenizer(
            vocab, emb, merge_threshold=3.0, max_vocab_size=64,
            search_block=16, corpus_sample=corpus, corpus_max_tokens=256,
            use_hierarchical=False, use_adaptive_curvature=False, seed=3)

    t1 = build_tok()
    s1 = E.run_enhanced(t1.enh_state, t1.enh_config, 10)

    t2 = build_tok()
    mesh = make_mesh()
    s2 = run_enhanced_sharded(t2.enh_state, t2.enh_config, 10, mesh)

    assert int(s1.base.num_merges) == int(s2.base.num_merges)
    n = int(s1.base.num_merges)
    assert n > 2
    np.testing.assert_array_equal(np.asarray(s1.base.merges[:n]),
                                  np.asarray(s2.base.merges[:n]))


def test_enhanced_sharded_priority_replay():
    """Priority-replay (bpe-mode) config is SPMD-shardable with identical
    merge sequences."""
    from hyptokenizer_tpu.parallel.sharded import run_enhanced_sharded
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    from hyptokenizer_tpu.tokenizer.normalize import (
        NormalizerConfig, WHITESPACE)

    corpus = ["abc abd abe fgh", "cde cdf fgh abc"] * 6

    def build_tok():
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
            {ch for l in corpus for ch in l})
        emb = L.random_points(jax.random.PRNGKey(5), len(vocab), 8, sigma=0.6)
        return EnhancedHyperbolicTokenizer(
            vocab, emb, merge_threshold=50.0, max_vocab_size=64,
            search_block=16, corpus_sample=corpus, corpus_max_tokens=256,
            use_hierarchical=False, use_adaptive_curvature=False,
            use_compression_aware=False, use_dense_channel=False,
            min_pair_freq=1, merge_batch=4, seed=3,
            merge_policy="priority",
            normalizer=NormalizerConfig(pre_split=WHITESPACE))

    t1 = build_tok()
    s1 = E.run_enhanced(t1.enh_state, t1.enh_config, 10)

    t2 = build_tok()
    mesh = make_mesh()
    s2 = run_enhanced_sharded(t2.enh_state, t2.enh_config, 10, mesh)

    n = int(s1.base.num_merges)
    assert n == int(s2.base.num_merges) and n > 2
    np.testing.assert_array_equal(np.asarray(s1.base.merges[:n]),
                                  np.asarray(s2.base.merges[:n]))


def test_embed_train_sharded_matches_single():
    """RSGD pretraining under the vocab-sharded mesh == single device (up to
    float reduction order)."""
    from hyptokenizer_tpu.parallel.sharded import run_embed_train_sharded
    from hyptokenizer_tpu.tokenizer.embed_train import train_embeddings

    n, d = 64, 8
    emb0 = L.random_points(jax.random.PRNGKey(0), n, d, sigma=0.3)
    corpus = jnp.asarray(
        [i % 24 for i in range(255)] + [-2], jnp.int32)
    key = jax.random.PRNGKey(1)
    e1, l1 = train_embeddings(emb0, corpus, 24, key, steps=20, batch=32,
                              negatives=4)
    mesh = make_mesh()
    e2, l2 = run_embed_train_sharded(emb0, corpus, 24, key, mesh, steps=20,
                                     batch=32, negatives=4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-4)
    # Result is on the manifold.
    dots = np.asarray(L.minkowski_dot(e2, e2))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_enhanced_sharded_sync_corpus_sharded_path():
    """corpus_shards=8 tokenizers take the per-shard sync (shard_map replay +
    pair counting, replicated combine) and still produce BIT-IDENTICAL merge
    sequences vs the single-device replicated sync."""
    from hyptokenizer_tpu.parallel import sharded as Sh
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    corpus = ["abc abd abe fgh", "cde cdf fgh abc", "bcd ab fg hh"] * 8

    def build_tok(shards):
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
            {ch for l in corpus for ch in l})
        emb = L.random_points(jax.random.PRNGKey(5), len(vocab), 8, sigma=0.6)
        return EnhancedHyperbolicTokenizer(
            vocab, emb, merge_threshold=3.0, max_vocab_size=64,
            search_block=16, corpus_sample=corpus, corpus_max_tokens=512,
            corpus_shards=shards, use_hierarchical=False,
            use_adaptive_curvature=False, seed=3)

    t1 = build_tok(8)
    assert Sh._corpus_shard_aligned(t1.enh_state, 8)
    s1 = E.run_enhanced(t1.enh_state, t1.enh_config, 12)

    t2 = build_tok(8)
    mesh = make_mesh()
    s2 = Sh.run_enhanced_sharded(t2.enh_state, t2.enh_config, 12, mesh)

    assert int(s1.base.num_merges) == int(s2.base.num_merges)
    n = int(s1.base.num_merges)
    assert n > 2
    np.testing.assert_array_equal(np.asarray(s1.base.merges[:n]),
                                  np.asarray(s2.base.merges[:n]))
    # Chained second chunk: the sharded-sync state re-syncs correctly and
    # alignment survives per-shard compaction.
    s1b = E.run_enhanced(s1, t1.enh_config, 8)
    s2b = Sh.run_enhanced_sharded(s2, t2.enh_config, 8, mesh)
    nb = int(s1b.base.num_merges)
    assert nb == int(s2b.base.num_merges) and nb > n
    np.testing.assert_array_equal(np.asarray(s1b.base.merges[:nb]),
                                  np.asarray(s2b.base.merges[:nb]))


def test_unaligned_corpus_falls_back_to_replicated_sync():
    """corpus_shards=1 (unaligned) tokenizers still work on a mesh via the
    replicated sync fallback."""
    from hyptokenizer_tpu.parallel import sharded as Sh
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer

    # 20-token lines: 256/8 = 32-boundaries fall mid-line
    corpus = ["abc abd abe fgh pqr", "cde cdf fgh abc klm"] * 6
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
        {ch for l in corpus for ch in l})
    emb = L.random_points(jax.random.PRNGKey(5), len(vocab), 8, sigma=0.6)
    tok = EnhancedHyperbolicTokenizer(
        vocab, emb, merge_threshold=3.0, max_vocab_size=64,
        search_block=16, corpus_sample=corpus, corpus_max_tokens=256,
        use_hierarchical=False, use_adaptive_curvature=False, seed=3)
    # corpus_shards=1: 256/8-boundaries fall mid-document
    assert not Sh._corpus_shard_aligned(tok.enh_state, 8)
    mesh = make_mesh()
    out = Sh.run_enhanced_sharded(tok.enh_state, tok.enh_config, 6, mesh)
    assert int(out.base.num_merges) > 0


def test_enhanced_sharded_v3_bit_identical():
    """The fully-sharded v3 sync (hash-partitioned combine + owned-key
    scoring + per-device top-k with packed-key tie-breaks) produces merge
    sequences bit-identical to the single-device path (VERDICT r3 #6)."""
    from hyptokenizer_tpu.parallel.sharded import (_sharded_sync_v3_fn,
                                                   run_enhanced_sharded)
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    from hyptokenizer_tpu.tokenizer.normalize import (
        NormalizerConfig, WHITESPACE)

    corpus = ["abc abd abe fgh", "cde cdf fgh abc", "fgh fgi abz qrs"] * 6

    def build_tok():
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
            {ch for l in corpus for ch in l})
        emb = L.random_points(jax.random.PRNGKey(9), len(vocab), 8, sigma=0.6)
        return EnhancedHyperbolicTokenizer(
            vocab, emb, merge_threshold=50.0, max_vocab_size=64,
            search_block=16, corpus_sample=corpus, corpus_max_tokens=512,
            corpus_shards=8,
            use_hierarchical=False, use_adaptive_curvature=False,
            use_compression_aware=False, use_dense_channel=False,
            min_pair_freq=1, merge_batch=4, seed=3,
            merge_policy="priority",
            normalizer=NormalizerConfig(pre_split=WHITESPACE))

    t1 = build_tok()
    s1 = E.run_enhanced(t1.enh_state, t1.enh_config, 12)

    t2 = build_tok()
    mesh = make_mesh()
    # The gate must actually select v3 for this config.
    from hyptokenizer_tpu.parallel.sharded import _corpus_shard_aligned
    assert _corpus_shard_aligned(t2.enh_state, mesh.devices.size)
    assert not t2.enh_config.use_dense_channel
    s2 = run_enhanced_sharded(t2.enh_state, t2.enh_config, 12, mesh)

    n = int(s1.base.num_merges)
    assert n == int(s2.base.num_merges) and n > 4
    np.testing.assert_array_equal(np.asarray(s1.base.merges[:n]),
                                  np.asarray(s2.base.merges[:n]))
    # Queue snapshots agree too (same candidates in the same order).
    np.testing.assert_array_equal(np.asarray(s1.q_i), np.asarray(s2.q_i))
    np.testing.assert_array_equal(np.asarray(s1.q_j), np.asarray(s2.q_j))


def test_enhanced_sharded_v3_allfeatures_bit_identical():
    """The v3 sync extended to DENSE-CHANNEL configs (VERDICT r4 #3): the
    all-features flagship (dense + frequency + hierarchical + compression +
    adaptive curvature) shards through the hash-partitioned sync, with the
    loop's dense frequency lookup reading the hash-partition table layout
    (scoring.lookup_pair_counts_hashed), and stays bit-identical to the
    single-device path."""
    from hyptokenizer_tpu.parallel.sharded import run_enhanced_sharded
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    corpus = ["abc abd abe fgh", "cde cdf fgh abc", "fgh fgi abz qrs"] * 6

    def build_tok():
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
            {ch for l in corpus for ch in l})
        emb = L.random_points(jax.random.PRNGKey(9), len(vocab), 8, sigma=0.6)
        return EnhancedHyperbolicTokenizer(
            vocab, emb, merge_threshold=50.0, max_vocab_size=64,
            search_block=16, corpus_sample=corpus, corpus_max_tokens=512,
            corpus_shards=8, freq_table_size=2048,
            use_frequency_aware=True, use_hierarchical=True,
            use_compression_aware=True, use_adaptive_curvature=True,
            optimize_curvature_freq=4,
            use_dense_channel=True, min_pair_freq=1, merge_batch=4, seed=3)

    t1 = build_tok()
    s1 = E.run_enhanced(t1.enh_state, t1.enh_config, 12)

    t2 = build_tok()
    mesh = make_mesh()
    from hyptokenizer_tpu.parallel.sharded import _corpus_shard_aligned
    from hyptokenizer_tpu.tokenizer import scoring
    # The gate must actually select v3 for this config (dense channel ON).
    assert _corpus_shard_aligned(t2.enh_state, mesh.devices.size)
    assert t2.enh_config.use_dense_channel
    assert t2.enh_config.base.max_vocab_size <= scoring.PACK_MAX_ID
    assert t2.enh_config.freq_table_size % mesh.devices.size == 0
    s2 = run_enhanced_sharded(t2.enh_state, t2.enh_config, 12, mesh)

    n = int(s1.base.num_merges)
    assert n == int(s2.base.num_merges) and n > 4
    np.testing.assert_array_equal(np.asarray(s1.base.merges[:n]),
                                  np.asarray(s2.base.merges[:n]))
    np.testing.assert_array_equal(np.asarray(s1.q_i), np.asarray(s2.q_i))
    np.testing.assert_array_equal(np.asarray(s1.q_j), np.asarray(s2.q_j))
    # Trained curvature followed the same trajectory.
    np.testing.assert_allclose(float(s1.base.curvature),
                               float(s2.base.curvature), rtol=1e-6)


def test_lookup_pair_counts_hashed_matches_lex():
    """The hashed-layout lookup returns the same counts as the lex-table
    lookup for present and absent pairs."""
    from hyptokenizer_tpu.tokenizer import scoring

    rng = np.random.default_rng(0)
    D, TD = 8, 32
    T = D * TD
    pairs = {(int(a), int(b)): int(c) for a, b, c in zip(
        rng.integers(0, 60, 150), rng.integers(0, 60, 150),
        rng.integers(1, 99, 150))}
    # Build the v3 layout: per-owner slices, each sorted by packed key.
    pks = {}
    for (a, b), c in pairs.items():
        pk = int(np.asarray(scoring.pack_lex(jnp.int32(a), jnp.int32(b))))
        pks[pk] = ((a, b), c)
    slices_k = [[] for _ in range(D)]
    slices_c = [[] for _ in range(D)]
    for pk in sorted(pks):
        (a, b), c = pks[pk]
        d = int(np.asarray(scoring.pair_dest(jnp.int32(pk), D)))
        if len(slices_k[d]) < TD:
            slices_k[d].append((a, b))
            slices_c[d].append(c)
    keys = np.full((T, 2), scoring.PKEY_SENT, np.int32)
    counts = np.zeros((T,), np.int32)
    for d in range(D):
        for r, ((a, b), c) in enumerate(zip(slices_k[d], slices_c[d])):
            keys[d * TD + r] = (a, b)
            counts[d * TD + r] = c
    stored = {k: c for d in range(D)
              for k, c in zip(slices_k[d], slices_c[d])}
    q = np.asarray([[a, b] for a in range(0, 64, 3)
                    for b in range(0, 64, 5)], np.int32)
    got = np.asarray(scoring.lookup_pair_counts_hashed(
        jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]),
        jnp.asarray(keys), jnp.asarray(counts), D))
    want = np.asarray([stored.get((int(a), int(b)), 0) for a, b in q])
    np.testing.assert_array_equal(got, want)


def test_enhanced_sharded_frozen_preserves_freqs_and_matches(tmp_path):
    """Sharded continued training of a LOADED (frozen-frequency) tokenizer:
    the v3f sync re-scores the static table per-shard, produces the same
    merges as single-device, and does NOT corrupt the restored pair table
    (the pre-r5 v2 sharded sync rebuilt it from the dummy corpus,
    silently zeroing every restored count)."""
    from hyptokenizer_tpu.parallel.sharded import run_enhanced_sharded
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    corpus = ["abc abd abe fgh", "cde cdf fgh abc", "fgh fgi abz qrs"] * 6
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
        {ch for l in corpus for ch in l})
    emb = L.random_points(jax.random.PRNGKey(9), len(vocab), 8, sigma=0.6)
    tok = EnhancedHyperbolicTokenizer(
        vocab, emb, merge_threshold=50.0, max_vocab_size=64,
        search_block=16, corpus_sample=corpus, corpus_max_tokens=512,
        freq_table_size=2048,
        use_frequency_aware=True, use_hierarchical=False,
        use_compression_aware=False, use_adaptive_curvature=False,
        use_dense_channel=False, min_pair_freq=1, merge_batch=4, seed=3)
    tok.optimize_merges(steps=6, log_every=6)
    p = str(tmp_path / "frozen")
    tok.save(p)

    t1 = EnhancedHyperbolicTokenizer.load(p)
    assert t1.enh_config.frozen_freqs
    s1 = E.run_enhanced(t1.enh_state, t1.enh_config, 6)

    t2 = EnhancedHyperbolicTokenizer.load(p)
    keys_before = np.asarray(t2.enh_state.pair_keys).copy()
    counts_before = np.asarray(t2.enh_state.pair_counts).copy()
    assert counts_before.sum() > 0
    mesh = make_mesh()
    s2 = run_enhanced_sharded(t2.enh_state, t2.enh_config, 6, mesh)

    n = int(s1.base.num_merges)
    assert n == int(s2.base.num_merges) and n > int(tok.state.num_merges)
    np.testing.assert_array_equal(np.asarray(s1.base.merges[:n]),
                                  np.asarray(s2.base.merges[:n]))
    np.testing.assert_array_equal(np.asarray(s1.q_i), np.asarray(s2.q_i))
    # The frozen table survived the sharded run untouched.
    np.testing.assert_array_equal(np.asarray(s2.pair_keys), keys_before)
    np.testing.assert_array_equal(np.asarray(s2.pair_counts), counts_before)
