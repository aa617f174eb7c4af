"""Evaluation layer tests: hierarchy distortion, comparison metrics, baselines."""

import os

import jax
import networkx as nx
import numpy as np
import pytest

from hyptokenizer_tpu.evals import (
    compression_efficiency,
    compute_distortion,
    create_node_mapping,
    linguistic_quality,
    measure_throughput,
)
from hyptokenizer_tpu.ops import lorentz as L


def toy_graph():
    g = nx.Graph()
    # Tree: dog.n.01 - animal.n.01 - cat.n.01 ; animal - thing
    g.add_edge("dog.n.01", "animal.n.01")
    g.add_edge("cat.n.01", "animal.n.01")
    g.add_edge("animal.n.01", "thing.n.01")
    return g


def test_node_mapping():
    vocab = ["<pad>", "dog", "cat", "animal", "dog"]
    m = create_node_mapping(toy_graph(), vocab)
    assert m == {"dog.n.01": 1, "cat.n.01": 2, "animal.n.01": 3}


def test_compute_distortion():
    vocab = ["dog", "cat", "animal", "thing"]
    g = toy_graph()
    emb = L.random_points(jax.random.PRNGKey(0), 4, 8, sigma=0.5)
    mapping = create_node_mapping(g, vocab)
    ratios, stats = compute_distortion(g, emb, mapping, num_pairs=50)
    assert stats["num_pairs"] == 50
    assert stats["min"] > 0
    assert stats["mean"] == pytest.approx(float(np.mean(ratios)))
    # Scale-free correlations are reported alongside the (scale-degenerate)
    # ratio metric.
    assert -1.0 <= stats["spearman_r"] <= 1.0
    assert -1.0 <= stats["pearson_r"] <= 1.0


def test_distortion_on_reference_wordnet_graph():
    """Integration: the reference repo's actual WordNet pickle loads and
    evaluates against a vocabulary containing common nouns."""
    from hyptokenizer_tpu.evals import load_wordnet_graph
    import os
    path = "/root/reference/data/processed/wordnet_graph.pkl"
    if not os.path.exists(path):
        pytest.skip("wordnet graph fixture unavailable")
    g = load_wordnet_graph(path)
    vocab = ["dog", "cat", "animal", "entity", "object", "tree", "car",
             "house", "water", "fish", "bird", "person"]
    mapping = create_node_mapping(g, vocab)
    assert len(mapping) >= 5
    emb = L.random_points(jax.random.PRNGKey(1), len(vocab), 10, sigma=0.5)
    ratios, stats = compute_distortion(g, emb, mapping, num_pairs=100)
    assert stats["num_pairs"] == 100
    assert np.isfinite(ratios).all()


def test_comparison_metrics():
    def tokenize(text):
        return text.split()

    texts = ["the walking dog", "a cat sitting quietly"]
    th = measure_throughput(tokenize, texts, runs=2)
    assert th["total_tokens"] == 7
    q = linguistic_quality(tokenize, texts)
    assert q["word_boundary_ratio"] == 1.0
    assert 0 <= q["morpheme_ratio"] <= 1
    c = compression_efficiency(tokenize, texts)
    assert c["chars_per_token"] > 1


def test_baseline_tokenizers(tmp_path):
    pytest.importorskip("tokenizers")
    from hyptokenizer_tpu.evals.baselines import train_all_baselines
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(
        ["the quick brown fox jumps over the lazy dog",
         "walking dogs walk quickly through the park"] * 50))
    res = train_all_baselines([str(corpus)], str(tmp_path / "out"),
                              vocab_sizes=(200,), kinds=("bpe", "wordpiece",
                                                         "char"))
    assert "bpe_200" in res and "char" in res
    assert res["bpe_200"]["vocab_size"] > 5
    import os
    assert os.path.exists(res["bpe_200"]["path"])


def test_sentencepiece_gated_wrapper():
    """SP baseline is import-gated (VERDICT r1 #10): absent package degrades
    gracefully; present package round-trips a trained model."""
    from hyptokenizer_tpu.evals import baselines as B
    if not B.sentencepiece_available():
        # Graceful degradation path: trainer returns None, wrapper untested.
        assert B.train_sentencepiece(["/dev/null"], 100, "/tmp/spx") is None
        return
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        corpus = os.path.join(d, "c.txt")
        with open(corpus, "w") as f:
            f.write("the cat sat on the mat\nthe dog sat on the log\n" * 50)
        model = B.train_sentencepiece([corpus], 60, d)
        assert model and os.path.exists(model)
        sp = B.SentencePieceWrapper(model)
        ids = sp.encode("the cat sat")
        assert ids and sp.decode(ids) == "the cat sat"
        assert sp.get_vocab_size() == 60
        assert sp.tokenize("the cat")
