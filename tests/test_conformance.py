"""Conformance: encode/decode and artifact interop vs. the actual reference.

The oracle is the reference implementation itself, imported from
/root/reference and driven on CPU torch (SURVEY §6: "the reference
implementation ... as the conformance oracle for byte-identical token ids").
Training-sequence conformance is not meaningful (the reference's distance
function is broken — DEVIATIONS.md §1/§7); the conformance surface is the
inference path and the on-disk artifact schema.
"""

import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from hyptokenizer_tpu.tokenizer.encode import Encoder  # noqa: E402


def make_reference_tokenizer(vocab, merge_history):
    from tokenizer.hyperbolic_merge import HyperbolicTokenizer as RefTok
    emb = torch.randn(len(vocab), 5)
    ref = RefTok(vocab=list(vocab), embeddings=torch.nn.Parameter(emb),
                 device=torch.device("cpu"), use_approximate_search=False,
                 max_vocab_size=max(64, len(vocab) + 8))
    ref.merge_history = [tuple(m) for m in merge_history]
    return ref


TEXTS = [
    "",
    "a",
    "abcde",
    "aaabbbccc",
    "the quick brown fox jumps over the lazy dog",
    "abababab",
    "aabbaabb",
    "mississippi",
    "banana bandana",
    "xyz unknown chars",
    "a b a b",
]


@pytest.mark.parametrize("merges", [
    [],
    [("a", "b", "ab")],
    [("a", "b", "ab"), ("a", "a", "aa"), ("b", "b", "bb")],
    [("a", "b", "ab"), ("ab", "a", "aba"), ("b", "a", "ba")],
    [("t", "h", "th"), ("th", "e", "the"), ("a", "n", "an"), ("an", "a", "ana")],
    [("s", "s", "ss"), ("i", "ss", "iss"), ("iss", "iss", "ississ")],
])
def test_tokenize_matches_reference(merges):
    base = ["<pad>", "<bos>", "<eos>", "<unk>"] + list("abcdefghijklmnopqrstuvwxyz ")
    vocab = base + [m[2] for m in merges]
    ref = make_reference_tokenizer(vocab, merges)
    mine = Encoder(vocab, merges)
    for text in TEXTS:
        assert mine.tokenize(text) == ref.tokenize(text), (merges, text)
        assert mine.encode_py(text) == ref.encode(text), (merges, text)
        ids = mine.encode_py(text)
        if all(i != mine.unk_id or vocab[i] in text for i in ids):
            assert mine.decode(ids) == ref.decode(ids)


def test_duplicate_merge_rule_overwrite():
    """Later duplicate (a,b) rules overwrite earlier ones, as in the reference
    dict build (hyperbolic_merge.py:425-428)."""
    vocab = ["a", "b", "ab", "AB", "<unk>"]
    merges = [("a", "b", "ab"), ("a", "b", "AB")]
    ref = make_reference_tokenizer(vocab, merges)
    mine = Encoder(vocab, merges)
    assert mine.tokenize("ab") == ref.tokenize("ab") == ["AB"]


def test_artifacts_load_into_reference(tmp_path):
    """Artifacts written by this framework load into the reference's .load()
    and produce identical encodes."""
    import jax
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer

    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + list("abcdef")
    emb = L.random_points(jax.random.PRNGKey(0), len(vocab), 6, sigma=0.6)
    tok = HyperbolicTokenizer(vocab, emb, merge_threshold=5.0,
                              max_vocab_size=32, search_block=16)
    tok.optimize_merges(steps=6, log_every=6)
    p = str(tmp_path / "art")
    tok.save(p)

    from tokenizer.hyperbolic_merge import HyperbolicTokenizer as RefTok
    ref = RefTok.load(p, device=torch.device("cpu"))
    assert ref.vocab == tok.vocab
    assert [tuple(m) for m in ref.merge_history] == tok.merge_history
    for text in TEXTS:
        assert tok.encode(text) == ref.encode(text)


def test_reference_artifacts_load_here(tmp_path):
    """Artifacts in the reference's schema load into this framework."""
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>", "a", "b", "c", "ab", "abc"]
    merges = [["a", "b", "ab"], ["ab", "c", "abc"]]
    emb = np.random.default_rng(0).normal(size=(9, 7)).astype(np.float32)
    p = tmp_path / "refart"
    p.mkdir()
    (p / "vocab.json").write_text(json.dumps(vocab))
    (p / "merges.json").write_text(json.dumps(merges))
    (p / "config.json").write_text(json.dumps({
        "curvature": 1.0, "merge_threshold": 0.1, "embedding_dim": 6,
        "max_vocab_size": 64, "use_approximate_search": True}))
    torch.save(torch.from_numpy(emb), str(p / "embeddings.pt"))

    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
    tok = HyperbolicTokenizer.load(str(p))
    assert tok.vocab == vocab
    assert tok.tokenize("abcab") == ["abc", "ab"]
    assert tok.encode("abcab") == [8, 7]


def test_reference_enhanced_artifacts_load_here(tmp_path):
    """A reference-SAVED enhanced artifact reconstructs through
    EnhancedHyperbolicTokenizer.load (feature flags, weights, frequencies).

    The reference's enhanced save writes no config.json (base keys live in
    enhanced_config.json), its embeddings.pt carries grad, and its module
    has an import bug (poincare_to_lorentz imported from lorentz_model
    where it never existed — it lives in poincare_ball); the shim below
    reproduces what any runnable deployment of the reference must do."""
    import embedding.lorentz_model as lm
    import embedding.poincare_ball as pb
    lm.poincare_to_lorentz = pb.poincare_to_lorentz
    lm.lorentz_to_poincare = pb.lorentz_to_poincare
    from tokenizer.enhanced_fast_hyperbolic_merge import (
        EnhancedFastHyperbolicTokenizer as RefEnh)

    vocab = ["<pad>", "<bos>", "<eos>", "<unk>", "a", "b", "c", "d", " "]
    emb = torch.randn(len(vocab), 9) * 0.1
    emb[:, 0] = torch.sqrt(1 + (emb[:, 1:] ** 2).sum(-1))
    ref = RefEnh(vocab=vocab, embeddings=emb, device=torch.device("cpu"),
                 use_approximate_search=False,
                 use_frequency_aware=True, use_hierarchical=False,
                 use_adaptive_curvature=False, use_compression_aware=False,
                 corpus_path=None, alpha=0.3, beta=0.5, gamma=0.2)
    ref.pair_frequencies = {("a", "b"): 7, ("b", "c"): 3}
    ref.merge_history = []
    path = str(tmp_path / "refenh")
    ref.save(path)

    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    ours = EnhancedHyperbolicTokenizer.load(path)
    cfg = ours.enh_config
    assert cfg.use_frequency and not cfg.use_hierarchical
    assert not cfg.use_adaptive_curvature and not cfg.use_compression
    assert (cfg.alpha, cfg.beta, cfg.gamma) == (0.3, 0.5, 0.2)
    # "|"-separated frequency keys (the reference's format) restore.
    assert ours.pair_frequencies == {("a", "b"): 7, ("b", "c"): 3}
    assert cfg.frozen_freqs
    assert ours.encode("ab") == [4, 5]  # no merges: char ids
