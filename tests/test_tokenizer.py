"""Tokenizer core tests.

Mirrors the reference's test strategy (tests/test_hyperbolic_tokenizer.py:
ctor state, candidate validity, merge bookkeeping, golden tokenize round-trip,
save/load equality) and adds what the reference never tested (SURVEY §4): the
full optimize_merges loop — checked step-by-step against an independent
brute-force greedy simulator.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import (
    Encoder, HyperbolicTokenizer, MergeConfig, init_state, run_merges,
)
from hyptokenizer_tpu.tokenizer import search


def make_vocab_emb(n=24, d=8, sigma=0.5, seed=0):
    # Token strings of varying lengths (1-3 chars): merge-midpoint weights are
    # length-proportional, so unequal lengths avoid the exactly-equidistant
    # midpoint ties that make greedy order sensitive to fp reduction order.
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"]
    i = 0
    while len(vocab) < n:
        ch = chr(ord("a") + i % 26)
        vocab.append(ch * (1 + i % 3))
        i += 1
    vocab = vocab[:n]
    emb = L.random_points(jax.random.PRNGKey(seed), n, d, sigma=sigma)
    return vocab, emb


# ------------------------------------------------------------------ simulator

def greedy_simulator(emb0, lengths0, threshold, steps, c=1.0):
    """Independent numpy/python greedy merge simulator (ground truth)."""
    emb = [np.asarray(e) for e in np.asarray(emb0)]
    lengths = list(np.asarray(lengths0))
    merged_pairs = set()
    history = []
    thr = threshold
    empty = 0
    for step in range(steps):
        n = len(emb)
        E = np.stack(emb)
        D = np.asarray(L.pairwise_dist(jnp.asarray(E), jnp.asarray(E), c))
        best = None
        for i in range(n):
            for j in range(i + 1, n):
                if (i, j) in merged_pairs:
                    continue
                if best is None or D[i, j] < best[2]:
                    best = (i, j, D[i, j])
        if best is None or best[2] >= thr:
            empty += 1
            if empty >= 6:
                thr *= 1.5
                empty = 0
        else:
            i, j, d = best
            w_j = lengths[j] / (lengths[i] + lengths[j])
            v = L.log_map(jnp.asarray(emb[i]), jnp.asarray(emb[j]), c)
            x_new = L.project_to_hyperboloid(
                L.exp_map(jnp.asarray(emb[i]), w_j * v, c), c)
            emb.append(np.asarray(x_new))
            lengths.append(lengths[i] + lengths[j])
            merged_pairs.add((i, j))
            history.append((i, j, float(d)))
            empty = 0
        if (step + 1) % 1000 == 0:
            thr *= 1.1
    return history


def test_merge_loop_matches_bruteforce_simulator():
    vocab, emb = make_vocab_emb(n=20, d=6, sigma=0.6)
    lengths = jnp.asarray([len(t) for t in vocab], jnp.int32)
    config = MergeConfig(max_vocab_size=64, search_block=16)
    st = init_state(emb, lengths, curvature=1.0, threshold=2.0, config=config)
    st = run_merges(st, config, 25)
    n = int(st.num_merges)
    got_pairs = [tuple(int(x) for x in p) for p in np.asarray(st.merges[:n])]
    got_dists = np.asarray(st.merge_dists[:n])
    want = greedy_simulator(emb, lengths, threshold=2.0, steps=25)
    assert n == len(want)
    # Greedy distance merging intrinsically collapses: each midpoint is closer
    # to its parents than any other pair, so merge distances shrink to the
    # acosh clamp floor where candidates tie at ulp scale and fp reduction
    # order legitimately picks different (equivalent) pairs. Require exact pair
    # agreement above the noise floor and distance agreement below it.
    NOISE = 1e-3
    comparable = len(want)
    for k, (_, _, d) in enumerate(want):
        if d <= NOISE:
            comparable = k
            break
    assert comparable >= 3  # test has teeth above the noise floor
    for k in range(comparable):
        i, j, d = want[k]
        assert got_pairs[k] == (i, j), f"step {k}"
        # acosh conditioning: |dd| ~ ulp(m)/sqrt(m^2-1) ~ 1e-7/d near m=1.
        tol = 1e-5 + 3e-7 / max(d, 1e-4)
        assert abs(float(got_dists[k]) - d) < tol, f"step {k}: {got_dists[k]} vs {d}"


def test_incremental_best_matches_full_pass():
    """After many merges, incrementally-maintained bests == full recompute."""
    vocab, emb = make_vocab_emb(n=16, d=6, sigma=0.6)
    lengths = jnp.asarray([len(t) for t in vocab], jnp.int32)
    config = MergeConfig(max_vocab_size=48, search_block=16)
    st = init_state(emb, lengths, curvature=1.0, threshold=3.0, config=config)
    st = run_merges(st, config, 12)
    bd, bj = search.full_pass_best(st.emb, st.vocab_size, st.curvature,
                                   st.merges, st.num_merges, block=16)
    v = int(st.vocab_size)
    # atol covers the acosh clamp floor (acosh(1+ulp) ~ 4.9e-4): matvec vs
    # matmul reduction order flips the last ulp of the dot for near-identical
    # points (merge-collapse regime).
    np.testing.assert_allclose(np.asarray(st.best_dist[:v]),
                               np.asarray(bd[:v]), atol=1e-3)
    # argmins may differ only where distances tie; require same distance.
    same = np.asarray(st.best_j[:v]) == np.asarray(bj[:v])
    ties = np.isclose(np.asarray(st.best_dist[:v]), np.asarray(bd[:v]),
                      atol=1e-3)
    assert (same | ties).all()


def test_stops_at_max_vocab():
    vocab, emb = make_vocab_emb(n=8, d=4, sigma=0.6)
    lengths = jnp.asarray([len(t) for t in vocab], jnp.int32)
    config = MergeConfig(max_vocab_size=10, search_block=8)
    st = init_state(emb, lengths, curvature=1.0, threshold=10.0, config=config)
    st = run_merges(st, config, 50)
    assert int(st.vocab_size) == 10
    assert bool(st.stopped)


def test_adaptive_threshold_grows_on_empty():
    vocab, emb = make_vocab_emb(n=8, d=4, sigma=0.3)
    lengths = jnp.asarray([len(t) for t in vocab], jnp.int32)
    config = MergeConfig(max_vocab_size=32, search_block=8)
    # Threshold far below any pairwise distance -> empty rounds -> growth.
    st = init_state(emb, lengths, curvature=1.0, threshold=1e-6, config=config)
    # Growth is x1.5 per 6 empty rounds: ~200 steps lift 1e-6 above the
    # smallest pairwise distance.
    st = run_merges(st, config, 250)
    assert float(st.threshold) > 1e-6
    assert int(st.num_merges) > 0  # eventually grows enough to merge


# ------------------------------------------------------------ host-level API

def test_ctor_state():
    vocab, emb = make_vocab_emb()
    tok = HyperbolicTokenizer(vocab, emb, max_vocab_size=64)
    assert tok.current_vocab_size == len(vocab)
    assert tok.token2idx["<pad>"] == 0
    assert tok.embeddings.shape == (len(vocab), 9)


def test_optimize_merges_and_bookkeeping():
    vocab, emb = make_vocab_emb(n=16, d=6, sigma=0.6)
    tok = HyperbolicTokenizer(vocab, emb, merge_threshold=3.0,
                              max_vocab_size=40, search_block=16)
    tok.optimize_merges(steps=10, log_every=5)
    assert len(tok.merge_history) > 0
    a, b, m = tok.merge_history[0]
    assert m == a + b
    assert tok.vocab[16] == m
    assert tok.current_vocab_size == 16 + len(tok.merge_history)


def test_golden_tokenize_encode_decode():
    """Reference test parity: inject merges a+b->ab, c+d->cd
    (tests/test_hyperbolic_tokenizer.py:158-185)."""
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>", "a", "b", "c", "d", "e",
             "ab", "cd"]
    enc = Encoder(vocab, [("a", "b", "ab"), ("c", "d", "cd")])
    assert enc.tokenize("abcde") == ["ab", "cd", "e"]
    ids = enc.encode_py("abcde")
    assert ids == [9, 10, 8]
    assert enc.decode(ids) == "abcde"
    # Unknown chars -> <unk> id.
    assert enc.encode_py("axz") == [4, 3, 3]


def test_tokenize_fixpoint_multipass():
    """Chained merges require multiple scans: a+b->ab then ab+c->abc."""
    vocab = ["a", "b", "c", "ab", "abc", "<unk>"]
    enc = Encoder(vocab, [("a", "b", "ab"), ("ab", "c", "abc")])
    assert enc.tokenize("abc") == ["abc"]
    assert enc.tokenize("abcabc") == ["abc", "abc"]
    # First-match-wins per scan (not priority order).
    enc2 = Encoder(["a", "b", "ab", "ba", "<unk>"],
                   [("a", "b", "ab"), ("b", "a", "ba")])
    assert enc2.tokenize("aba") == ["ab", "a"]
    assert enc2.tokenize("bab") == ["b", "ab"] or enc2.tokenize("bab") == ["ba", "b"]


def test_save_load_roundtrip(tmp_path):
    vocab, emb = make_vocab_emb(n=16, d=6, sigma=0.6)
    tok = HyperbolicTokenizer(vocab, emb, merge_threshold=3.0,
                              max_vocab_size=40, search_block=16)
    tok.optimize_merges(steps=8, log_every=8)
    p = str(tmp_path / "tok")
    tok.save(p)
    for fname in ["vocab.json", "merges.json", "config.json", "embeddings.npy"]:
        assert os.path.exists(os.path.join(p, fname))
    tok2 = HyperbolicTokenizer.load(p)
    assert tok2.vocab == tok.vocab
    assert tok2.merge_history == tok.merge_history
    np.testing.assert_allclose(tok2.embeddings, tok.embeddings, atol=1e-6)
    text = "abcdefg"
    assert tok2.encode(text) == tok.encode(text)


def test_loaded_tokenizer_can_continue_training(tmp_path):
    vocab, emb = make_vocab_emb(n=16, d=6, sigma=0.6)
    tok = HyperbolicTokenizer(vocab, emb, merge_threshold=3.0,
                              max_vocab_size=40, search_block=16)
    tok.optimize_merges(steps=5, log_every=5)
    p = str(tmp_path / "tok")
    tok.save(p)
    tok2 = HyperbolicTokenizer.load(p)
    n_before = len(tok2.merge_history)
    tok2.optimize_merges(steps=5, log_every=5)
    assert len(tok2.merge_history) > n_before


def test_merge_batch_matches_sequential():
    """Batched insertion == sequential merge_pair for the same pair list."""
    from hyptokenizer_tpu.tokenizer.state import merge_batch, merge_pair
    vocab, emb = make_vocab_emb(n=16, d=6, sigma=0.6)
    lengths = jnp.asarray([len(t) for t in vocab], jnp.int32)
    config = MergeConfig(max_vocab_size=48, search_block=16)
    st0 = init_state(emb, lengths, curvature=1.0, threshold=5.0, config=config)

    pairs = [(4, 9), (5, 11), (6, 12), (4, 10)]  # includes a repeated row i=4
    dists = [float(L.distance(emb[i], emb[j])) for i, j in pairs]

    seq = st0
    for (i, j), d in zip(pairs, dists):
        seq = merge_pair(seq, jnp.asarray(i), jnp.asarray(j), jnp.asarray(d))

    bat = merge_batch(
        st0,
        jnp.asarray([p[0] for p in pairs], jnp.int32),
        jnp.asarray([p[1] for p in pairs], jnp.int32),
        jnp.asarray(dists, jnp.float32),
        jnp.ones((len(pairs),), jnp.bool_),
    )

    assert int(bat.num_merges) == int(seq.num_merges) == 4
    np.testing.assert_array_equal(np.asarray(bat.merges[:4]),
                                  np.asarray(seq.merges[:4]))
    np.testing.assert_allclose(np.asarray(bat.emb), np.asarray(seq.emb),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bat.lengths),
                                  np.asarray(seq.lengths))
    v = int(seq.vocab_size)
    np.testing.assert_allclose(np.asarray(bat.best_dist[:v]),
                               np.asarray(seq.best_dist[:v]), atol=1e-5)
    same = np.asarray(bat.best_j[:v]) == np.asarray(seq.best_j[:v])
    ties = np.isclose(np.asarray(bat.best_dist[:v]),
                      np.asarray(seq.best_dist[:v]), atol=1e-5)
    assert (same | ties).all()


def test_merge_batch_respects_capacity_and_validity():
    from hyptokenizer_tpu.tokenizer.state import merge_batch
    vocab, emb = make_vocab_emb(n=8, d=4, sigma=0.6)
    lengths = jnp.asarray([len(t) for t in vocab], jnp.int32)
    config = MergeConfig(max_vocab_size=10, search_block=8)
    st = init_state(emb, lengths, curvature=1.0, threshold=5.0, config=config)
    out = merge_batch(
        st,
        jnp.asarray([0, 1, 2, 3], jnp.int32),
        jnp.asarray([4, 5, 6, 7], jnp.int32),
        jnp.ones((4,), jnp.float32),
        jnp.asarray([True, False, True, True]),  # 3 valid, capacity 2
    )
    assert int(out.num_merges) == 2           # capacity clamp
    np.testing.assert_array_equal(np.asarray(out.merges[:2]),
                                  [[0, 4], [2, 6]])  # invalid entry skipped
    assert int(out.vocab_size) == 10


def test_startup_threshold_controller():
    """Parity with the reference's startup controller
    (fast_hyperbolic_merge.py:487-505): a threshold above the sampled max
    distance is pulled down to 1.5x the mean; degenerate (all-zero-distance)
    geometry drops it to 1e-5; per-chunk distance stats land in
    training_stats."""
    import jax
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer

    vocab = [f"t{i}" for i in range(32)]
    emb = L.random_points(jax.random.PRNGKey(3), 32, 8, sigma=0.5)
    tok = HyperbolicTokenizer(vocab, emb, merge_threshold=1e9,
                              max_vocab_size=64, search_block=32)
    stats = tok.distance_statistics()
    assert stats["max"] > 1e-6
    tok.optimize_merges(steps=2, log_every=2)
    thr0 = tok.training_stats[0]["threshold"]
    # Startup pulled 1e9 down to <= 1.5x mean (then in-loop adaptation may
    # only have grown it by the periodic factor, not back to 1e9).
    assert thr0 <= stats["mean"] * 1.5 * 1.2, (thr0, stats)
    for k in ("min_dist", "max_dist", "mean_dist", "std_dist"):
        assert k in tok.training_stats[0]

    # Degenerate geometry: every token at the same point -> distances 0.
    import numpy as np
    origin = np.zeros((32, 9), np.float32)
    origin[:, 0] = 1.0
    tok2 = HyperbolicTokenizer(vocab, origin, merge_threshold=0.5,
                               max_vocab_size=64, search_block=32)
    tok2.optimize_merges(steps=1, log_every=1)
    assert tok2.training_stats[0]["threshold"] <= 1e-5 * 1.2


def test_threshold_controller_respects_low_threshold():
    """A user threshold already below the sampled max is left alone."""
    import jax
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer

    vocab = [f"t{i}" for i in range(32)]
    emb = L.random_points(jax.random.PRNGKey(3), 32, 8, sigma=0.5)
    tok = HyperbolicTokenizer(vocab, emb, merge_threshold=1e-4,
                              max_vocab_size=64, search_block=32,
                              adaptive_threshold=True)
    tok._startup_threshold_adjust()
    assert float(tok.state.threshold) == pytest.approx(1e-4)
