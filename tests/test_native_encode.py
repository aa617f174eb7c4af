"""Native (C++) encoder vs python reference-semantics path: fuzz conformance."""

import random
import string

import pytest

from hyptokenizer_tpu.tokenizer.encode import Encoder, ensure_native_built

pytestmark = pytest.mark.skipif(not ensure_native_built(),
                                reason="native encoder not built")


def build_random_tokenizer(rng, n_chars=8, n_merges=30):
    chars = list(string.ascii_lowercase[:n_chars]) + [" "]
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
    merges = []
    for _ in range(n_merges):
        a = rng.choice(vocab[4:])
        b = rng.choice(vocab[4:])
        m = a + b
        merges.append((a, b, m))
        vocab.append(m)
    return vocab, merges


def test_fuzz_native_matches_python():
    rng = random.Random(7)
    for trial in range(15):
        vocab, merges = build_random_tokenizer(rng)
        enc = Encoder(vocab, merges, use_native=True)
        assert enc.native_available
        for _ in range(20):
            n = rng.randint(0, 60)
            text = "".join(rng.choice("abcdefgh xyz") for _ in range(n))
            assert enc.encode(text) == enc.encode_py(text), (trial, text)


def test_native_unicode():
    vocab = ["<unk>", "é", "ü", "éü", "a"]
    enc = Encoder(vocab, [("é", "ü", "éü")], use_native=True)
    assert enc.native_available
    assert enc.encode("éüa") == enc.encode_py("éüa") == [3, 4]
    # Unknown multi-byte codepoints -> unk, one per codepoint.
    assert enc.encode("日本") == enc.encode_py("日本") == [0, 0]


def test_native_multipass_semantics():
    """The case where multi-pass differs from single-pass backtracking:
    rules (b,c)->bc, (a,bc)->abc, (bc,d)->bcd on "abcd" must give [a, bcd]."""
    vocab = ["a", "b", "c", "d", "bc", "abc", "bcd", "<unk>"]
    merges = [("b", "c", "bc"), ("a", "bc", "abc"), ("bc", "d", "bcd")]
    enc = Encoder(vocab, merges, use_native=True)
    assert enc.tokenize("abcd") == ["a", "bcd"]
    assert enc.encode("abcd") == enc.encode_py("abcd") == [0, 6]


def test_native_empty_and_long():
    vocab = ["a", "b", "ab", "<unk>"]
    enc = Encoder(vocab, [("a", "b", "ab")], use_native=True)
    assert enc.encode("") == []
    ids = enc.encode("ab" * 50_000)
    assert ids == [2] * 50_000


def test_batch_matches_single():
    rng = random.Random(11)
    vocab, merges = build_random_tokenizer(rng, n_merges=60)
    enc = Encoder(vocab, merges, use_native=True)
    texts = ["".join(rng.choice("abcdefgh xyz")
                     for _ in range(rng.randint(0, 80)))
             for _ in range(200)] + ["", "日本 ab"]
    expect = [enc.encode(t) for t in texts]
    for n_threads in (0, 1, 4):
        assert enc.encode_batch(texts, n_threads=n_threads) == expect
    assert enc.encode_batch([]) == []


def test_batch_with_normalizer():
    from hyptokenizer_tpu.tokenizer.normalize import (
        NormalizerConfig, WHITESPACE)
    vocab, merges = build_random_tokenizer(random.Random(3), n_merges=40)
    cfg = NormalizerConfig(lowercase=True, pre_split=WHITESPACE)
    enc = Encoder(vocab, merges, use_native=True, normalizer=cfg)
    texts = ["AB cd  EF", "", "gh", "  a  "]
    assert enc.encode_batch(texts) == [enc.encode(t) for t in texts]
    assert enc.encode_batch(texts) == [enc.encode_py(t) for t in texts]


def test_native_throughput_exceeds_python():
    import time
    vocab, merges = build_random_tokenizer(random.Random(1), n_merges=100)
    enc = Encoder(vocab, merges, use_native=True)
    text = "".join(random.Random(2).choice("abcdefgh ") for _ in range(200_000))
    t0 = time.perf_counter()
    ids_n = enc.encode(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    ids_p = enc.encode_py(text)
    t_py = time.perf_counter() - t0
    assert ids_n == ids_p
    assert t_native < t_py  # typically 30-100x faster


def test_priority_mode_differs_and_matches_ranks():
    """Priority mode follows merge rank; fixpoint follows the leftmost scan.
    With ranks (' ','t'), ('h','e'), (' t','h'), (' t','he'): the fixpoint
    scan cascades ' t'+'h' -> ' th' and dead-ends at [' th', 'e'], while
    rank order merges 'he' (rank 1) before ' th' (rank 2), reaching
    ' t'+'he' -> ' the'."""
    vocab = [" ", "t", "h", "e", " t", "he", " th", " the", "<unk>"]
    merges = [(" ", "t", " t"), ("h", "e", "he"), (" t", "h", " th"),
              (" t", "he", " the")]
    fix = Encoder(vocab, merges, use_native=True)
    pri = Encoder(vocab, merges, use_native=True, merge_policy="priority")
    assert fix.tokenize(" the") == [" th", "e"]
    assert pri.tokenize(" the") == [" the"]
    assert pri.encode(" the") == pri.encode_py(" the")
    assert fix.encode(" the") == fix.encode_py(" the")


def test_priority_fuzz_native_matches_python():
    rng = random.Random(23)
    for trial in range(8):
        vocab, merges = build_random_tokenizer(rng, n_merges=40)
        enc = Encoder(vocab, merges, use_native=True,
                      merge_policy="priority")
        assert enc.native_available
        for _ in range(25):
            n = rng.randint(0, 60)
            text = "".join(rng.choice("abcdefgh xyz") for _ in range(n))
            assert enc.encode(text) == enc.encode_py(text), (trial, text)


def test_priority_batch_matches_single():
    rng = random.Random(5)
    vocab, merges = build_random_tokenizer(rng, n_merges=50)
    enc = Encoder(vocab, merges, use_native=True, merge_policy="priority")
    texts = ["".join(rng.choice("abcdefgh ")
                     for _ in range(rng.randint(0, 70))) for _ in range(100)]
    assert enc.encode_batch(texts, n_threads=4) == [enc.encode_py(t)
                                                    for t in texts]


def test_native_presplit_matches_python_segments():
    """The native ASCII segmenters (whitespace/words) must agree with the
    python regex patterns through the whole encode path."""
    from hyptokenizer_tpu.tokenizer.normalize import (
        NormalizerConfig, WHITESPACE, WORDS_WITH_SPACE)
    rng = random.Random(17)
    alphabet = "abcDEF 019 ..,!?_-  \t"
    for pattern in (WHITESPACE, WORDS_WITH_SPACE):
        for policy in ("fixpoint", "priority"):
            vocab, merges = build_random_tokenizer(rng, n_merges=40)
            cfg = NormalizerConfig(pre_split=pattern)
            enc = Encoder(vocab, merges, use_native=True, normalizer=cfg,
                          merge_policy=policy)
            assert enc.native_available and enc._native_presplit
            texts = ["".join(rng.choice(alphabet)
                             for _ in range(rng.randint(0, 80)))
                     for _ in range(120)]
            texts += ["", " ", "__", " _a", "a_ b", "  a", "1a,b2  _"]
            got = enc.encode_batch(texts)
            expect = [enc.encode_py(t) for t in texts]
            assert got == expect, (pattern[:12], policy)
            for t in texts[:30]:
                assert enc.encode(t) == enc.encode_py(t), (policy, t)
