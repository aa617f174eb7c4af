"""Mid-training checkpoint/resume (capability the reference lacks)."""

import jax
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import (
    EnhancedHyperbolicTokenizer, HyperbolicTokenizer,
)
from hyptokenizer_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def build(cls=HyperbolicTokenizer, **kw):
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + list("abcdefgh")
    emb = L.random_points(jax.random.PRNGKey(0), len(vocab), 8, sigma=0.6)
    kw.setdefault("merge_threshold", 3.0)
    kw.setdefault("max_vocab_size", 64)
    kw.setdefault("search_block", 16)
    return cls(vocab, emb, **kw)


def test_base_checkpoint_roundtrip(tmp_path):
    tok = build()
    tok.optimize_merges(steps=6, log_every=6)
    save_checkpoint(str(tmp_path / "ck"), tok)
    state_at_save = int(tok.state.step)

    tok2 = build()
    restore_checkpoint(str(tmp_path / "ck"), tok2)
    assert int(tok2.state.step) == state_at_save
    assert tok2.vocab == tok.vocab
    assert tok2.merge_history == tok.merge_history
    np.testing.assert_allclose(np.asarray(tok2.state.emb),
                               np.asarray(tok.state.emb))

    # Resumed training continues identically to uninterrupted training.
    tok.optimize_merges(steps=6, log_every=6)
    tok2.optimize_merges(steps=6, log_every=6)
    assert tok.merge_history == tok2.merge_history


def test_enhanced_checkpoint_roundtrip(tmp_path):
    corpus = ["abc abd abe", "cde cdf"] * 5
    tok = build(EnhancedHyperbolicTokenizer, corpus_sample=corpus,
                corpus_max_tokens=256, use_hierarchical=False,
                use_adaptive_curvature=False)
    tok.optimize_merges(steps=5, log_every=5)
    save_checkpoint(str(tmp_path / "ck"), tok)

    tok2 = build(EnhancedHyperbolicTokenizer, corpus_sample=corpus,
                 corpus_max_tokens=256, use_hierarchical=False,
                 use_adaptive_curvature=False)
    restore_checkpoint(str(tmp_path / "ck"), tok2)
    assert tok2.merge_history == tok.merge_history
    tok.optimize_merges(steps=5, log_every=5)
    tok2.optimize_merges(steps=5, log_every=5)
    assert tok.merge_history == tok2.merge_history


def test_checkpoint_restores_shrunk_corpus(tmp_path):
    """Mid-training checkpoints survive corpus-buffer shrinking."""
    import jax
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.utils.checkpoint import (restore_checkpoint,
                                                   save_checkpoint)

    corpus = ["aa bb cc dd", "bb cc dd aa"] * 6

    def build():
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + sorted(
            {c for l in corpus for c in l})
        emb = L.random_points(jax.random.PRNGKey(2), len(vocab), 8, sigma=0.5)
        tok = EnhancedHyperbolicTokenizer(
            vocab, emb, merge_threshold=50.0, max_vocab_size=64,
            search_block=32, corpus_sample=corpus, corpus_max_tokens=256,
            use_hierarchical=False, use_adaptive_curvature=False,
            use_compression_aware=False, use_dense_channel=False,
            min_pair_freq=1, merge_batch=4, seed=1, corpus_shrink=True)
        tok.MIN_CORPUS_BUFFER = 16
        return tok

    tok = build()
    tok.optimize_merges(steps=12, log_every=4)
    assert tok.enh_state.corpus.shape[0] < 256  # shrank
    n = len(tok.merge_history)
    save_checkpoint(str(tmp_path / "ck"), tok)

    tok2 = build()
    restore_checkpoint(str(tmp_path / "ck"), tok2)
    assert len(tok2.merge_history) == n
    assert tok2.enh_state.corpus.shape == tok.enh_state.corpus.shape
    tok2.optimize_merges(steps=8, log_every=4)  # training continues
