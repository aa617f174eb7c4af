"""Unicode normalization + regex pre-split on the encode path.

Covers tokenizer/normalize.py and its Encoder integration: lossless
partitioning, boundary-blocking semantics, parity of the python and native
paths under a normalizer, and artifact round-trip of the config.
"""

import random
import string
import tempfile

import numpy as np
import pytest

from hyptokenizer_tpu.tokenizer import normalize as N
from hyptokenizer_tpu.tokenizer.encode import Encoder
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig
from hyptokenizer_tpu.utils.data import clean_text


def test_segments_lossless_property():
    rng = random.Random(0)
    alphabet = string.ascii_lowercase + "  .,!?0189éé́"
    for pattern in (N.WHITESPACE, N.WORDS_WITH_SPACE, r"[a-z]+", r"x+"):
        for _ in range(50):
            text = "".join(rng.choice(alphabet)
                           for _ in range(rng.randrange(0, 40)))
            segs = list(N.segments(text, pattern))
            assert "".join(segs) == text
            assert all(segs)  # no empty segments


def test_normalize_forms_and_casing():
    cfg = NormalizerConfig(form="NFKC", lowercase=True)
    assert N.normalize("Ｈｅｌｌｏ", cfg) == "hello"
    cfg = NormalizerConfig(strip_accents=True)
    assert N.normalize("café", cfg) == "cafe"
    # composed vs decomposed é both strip to e
    assert N.normalize("café", cfg) == "cafe"
    cfg = NormalizerConfig(clean=True)
    assert N.normalize("  Héllo,   World!42  ", cfg) == \
        clean_text("  Héllo,   World!42  ")


def test_invalid_config_rejected():
    with pytest.raises(ValueError):
        NormalizerConfig(form="NFX")
    with pytest.raises(Exception):
        NormalizerConfig(pre_split="(unclosed")


def _enc(normalizer=None, use_native=None):
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>", "a", "b", " ", "ab", "ab "]
    merges = [("a", "b", "ab"), ("ab", " ", "ab ")]
    return Encoder(vocab, merges, normalizer=normalizer, use_native=use_native)


def test_none_config_is_reference_semantics():
    raw = _enc()
    noop = _enc(normalizer=NormalizerConfig())
    for text in ("abab ab", "a b ab", "", "b a"):
        assert raw.tokenize(text) == noop.tokenize(text)
        assert raw.encode(text) == noop.encode(text)


def test_pre_split_blocks_cross_boundary_merges():
    # Without a pre-split, the (ab, ' ') -> 'ab ' rule crosses the word
    # boundary; with the whitespace pre-split it cannot.
    raw = _enc()
    ws = _enc(normalizer=NormalizerConfig(pre_split=N.WHITESPACE))
    assert raw.tokenize("ab ab") == ["ab ", "ab"]
    assert ws.tokenize("ab ab") == ["ab", " ", "ab"]
    # Lossless: decode reconstructs the input either way.
    assert ws.decode(ws.encode("ab ab")) == "ab ab"


def test_normalizer_native_matches_python():
    cfg = NormalizerConfig(lowercase=True, pre_split=N.WHITESPACE)
    py = _enc(normalizer=cfg, use_native=False)
    nat = _enc(normalizer=cfg)
    if not nat.native_available:
        pytest.skip("native encoder unavailable")
    for text in ("AB ab  aB", "a  b", "", " ab"):
        assert nat.encode(text) == py.encode_py(text)


def _enc_nonascii(pattern, use_native=None):
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>", "c", "a", "f", "é", " ",
             "caf", "café", " café"]
    merges = [("c", "a", "ca"), ("ca", "f", "caf"), ("caf", "é", "café"),
              (" ", "café", " café")]
    cfg = NormalizerConfig(pre_split=pattern)
    return Encoder(vocab, merges, normalizer=cfg, use_native=use_native)


def test_normalizer_native_matches_python_nonascii():
    # Regression: a presplit-configured native handle's ASCII-only segmenter
    # treats bytes >= 0x80 as boundaries, splitting inside multi-byte
    # codepoints/segments. The fallback path must use a presplit-free handle
    # so encode == encode_py on non-ASCII input.
    for pattern in (N.WORDS_WITH_SPACE, N.WHITESPACE):
        nat = _enc_nonascii(pattern)
        if not nat.native_available:
            pytest.skip("native encoder unavailable")
        py = _enc_nonascii(pattern, use_native=False)
        for text in (" café", "café café", "caf é", "  café x"):
            assert nat.encode(text) == py.encode_py(text), (pattern, text)
            assert nat.encode_batch([text, " café", "ascii only"]) == \
                [py.encode_py(text), py.encode_py(" café"),
                 py.encode_py("ascii only")], (pattern, text)


def test_words_with_space_pattern():
    segs = list(N.segments("the cat, 42 dogs!", N.WORDS_WITH_SPACE))
    assert "".join(segs) == "the cat, 42 dogs!"
    assert " cat" in segs and " 42" in segs


def test_normalizer_artifact_roundtrip():
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
    import jax

    vocab = ["<pad>", "<bos>", "<eos>", "<unk>", "a", "b", " "]
    emb = L.random_points(jax.random.PRNGKey(0), len(vocab), 4, sigma=0.3)
    cfg = NormalizerConfig(lowercase=True, pre_split=N.WHITESPACE)
    tok = HyperbolicTokenizer(vocab, emb, max_vocab_size=32, normalizer=cfg)
    with tempfile.TemporaryDirectory() as d:
        tok.save(d)
        tok2 = HyperbolicTokenizer.load(d)
    assert tok2.normalizer == cfg
    assert tok2.tokenize("A b") == tok.tokenize("A b")
