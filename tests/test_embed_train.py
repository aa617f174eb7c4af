"""RSGD embedding training: loss decreases, co-occurring tokens get closer."""

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer.embed_train import train_embeddings
from hyptokenizer_tpu.utils import data


def test_cooccurring_tokens_get_closer():
    # Synthetic corpus: tokens 0-1 always adjacent, 2-3 always adjacent,
    # cross pairs never.
    rng = np.random.default_rng(0)
    blocks = []
    for _ in range(500):
        blocks.extend([0, 1] if rng.random() < 0.5 else [2, 3])
        blocks.append(-2)
    corpus = jnp.asarray(np.asarray(blocks, np.int32))
    emb0 = L.random_points(jax.random.PRNGKey(1), 4, 8, sigma=0.5)

    emb, losses = train_embeddings(emb0, corpus, 4, jax.random.PRNGKey(2),
                                   steps=300, batch=128, negatives=3, lr=0.3)
    # On manifold.
    np.testing.assert_allclose(np.asarray(L.minkowski_dot(emb, emb)), 1.0,
                               atol=1e-4)
    # Loss decreased.
    assert float(losses[-20:].mean()) < float(losses[:20].mean())
    d01 = float(L.distance(emb[0], emb[1]))
    d23 = float(L.distance(emb[2], emb[3]))
    d02 = float(L.distance(emb[0], emb[2]))
    d13 = float(L.distance(emb[1], emb[3]))
    assert d01 < d02 and d01 < d13
    assert d23 < d02 and d23 < d13


def test_separator_and_pad_ignored():
    corpus = jnp.asarray(np.asarray([0, -2, 1, -1, -1, -1], np.int32))
    emb0 = L.random_points(jax.random.PRNGKey(0), 2, 6, sigma=0.5)
    emb, losses = train_embeddings(emb0, corpus, 2, jax.random.PRNGKey(1),
                                   steps=20, batch=16, negatives=2)
    assert np.isfinite(np.asarray(emb)).all()


def test_encode_corpus_chars():
    arr = data.encode_corpus_chars(["ab", "ba"], ["a", "b"], max_tokens=8,
                                   unk_id=99)
    np.testing.assert_array_equal(arr, [0, 1, -2, 1, 0, -2, -1, -1])
