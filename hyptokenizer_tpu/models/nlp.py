"""Downstream NLP evaluation: BERT MLM + sequence classification (flax).

Capability parity with ``scripts/train_nlp_tasks.py:58-493``: a tokenizer
adapter unifying hyperbolic/baseline tokenizers behind one interface, export
of hyperbolic embeddings into the transformer's input embedding table, and
small-BERT MLM / classification training.

TPU-first: transformers' *Flax* BERT with a fresh config (pretrained downloads
need network; the reference also trains from scratch, :213-351), optax AdamW,
jitted train steps with static shapes (pad-to-max batches).

Deviation (DEVIATIONS.md context): the reference exports embeddings by calling
the Poincaré-ball ``log_map_zero`` on raw Lorentz coordinates
(train_nlp_tasks.py:160-173) — dimensionally a category error that happens to
run. Here the export is the actual Euclidean chart: the Lorentz log map at the
origin, spatial components (V, d).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L


class TokenizerAdapter:
    """Unified surface over this framework's and baseline tokenizers.

    Parity: SimpleTokenizer (train_nlp_tasks.py:58-173) — ``tokenize``,
    ``encode`` (truncation + attention mask), ``batch_encode``,
    ``get_vocab_size``, ``get_embeddings``.
    """

    def __init__(self, method: str, model_path: str, vocab_size: int = 0):
        self.method = method
        if method == "hyperbolic":
            from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
            self.tokenizer = HyperbolicTokenizer.load(model_path)
        elif method == "sentencepiece":
            # Gated external baseline (reference train_nlp_tasks.py:82-84).
            from hyptokenizer_tpu.evals.baselines import SentencePieceWrapper
            self.sp = SentencePieceWrapper(model_path)
        elif method in ("bpe", "bytelevel", "wordpiece", "unigram", "char"):
            from tokenizers import Tokenizer
            self.hf = Tokenizer.from_file(model_path)
        else:
            raise ValueError(f"unknown method {method}")

    def tokenize(self, text: str) -> List[str]:
        if self.method == "hyperbolic":
            return self.tokenizer.tokenize(text)
        if self.method == "sentencepiece":
            return self.sp.tokenize(text)
        return self.hf.encode(text).tokens

    def encode(self, text: str, max_length: int = 128) -> Dict:
        if self.method == "hyperbolic":
            ids = self.tokenizer.encode(text)
        elif self.method == "sentencepiece":
            ids = self.sp.encode(text)
        else:
            ids = self.hf.encode(text).ids
        ids = ids[:max_length]
        return {"input_ids": ids, "attention_mask": [1] * len(ids)}

    def batch_encode(self, texts: List[str], max_length: int = 128) -> Dict:
        if self.method == "hyperbolic":
            all_ids = self.tokenizer.encode_batch(texts)
        elif self.method == "sentencepiece":
            all_ids = [self.sp.encode(t) for t in texts]
        else:
            all_ids = [e.ids for e in self.hf.encode_batch(texts)]
        out = {"input_ids": [], "attention_mask": []}
        for ids in all_ids:
            ids = ids[:max_length]
            out["input_ids"].append(ids)
            out["attention_mask"].append([1] * len(ids))
        return out

    def get_vocab_size(self) -> int:
        if self.method == "hyperbolic":
            return len(self.tokenizer.vocab)
        if self.method == "sentencepiece":
            return self.sp.get_vocab_size()
        return self.hf.get_vocab_size()

    def get_embeddings(self) -> Optional[np.ndarray]:
        if self.method == "hyperbolic":
            return export_euclidean_embeddings(self.tokenizer.embeddings)
        return None


def export_euclidean_embeddings(lorentz_emb) -> np.ndarray:
    """Lorentz points -> tangent space at the origin, spatial part (V, d)."""
    emb = jnp.asarray(np.asarray(lorentz_emb), jnp.float32)
    o = jnp.broadcast_to(L.origin(emb.shape[1] - 1), emb.shape)
    tangent = L.log_map(o, emb)
    return np.asarray(tangent[:, 1:])


def _fit_embedding_table(table: np.ndarray, vocab_size: int,
                         hidden: int, inject_scale: str = "raw") -> np.ndarray:
    """Fit an exported (V, d) table into a (vocab_size, hidden) BERT table:
    zero-pad / truncate dims.

    ``inject_scale``: "raw" copies values unscaled (the reference's
    behavior, train_nlp_tasks.py:249-253) — but the exported tangent
    vectors measure std ~0.24, 12x BERT's 0.02 init std, so injected rows
    dominate the word+pos+type sum and the optimizer must unlearn the
    scale first (the round-3 classification regression, VERDICT r3 #5).
    "matched" rescales the table to the 0.02 init std, preserving
    directions (see RESULTS.md round-4 injection study)."""
    out = 0.02 * np.random.default_rng(0).standard_normal(
        (vocab_size, hidden)).astype(np.float32)
    v = min(vocab_size, table.shape[0])
    d = min(hidden, table.shape[1])
    src = table[:v, :d]
    if inject_scale == "matched":
        src = src * (0.02 / max(float(src.std()), 1e-8))
    out[:v, :d] = src
    return out


def build_bert_mlm(vocab_size: int, hidden: int = 256, layers: int = 4,
                   heads: int = 4, max_pos: int = 512, seed: int = 0,
                   embeddings: Optional[np.ndarray] = None,
                   inject_scale: str = "raw"):
    """Fresh FlaxBertForMaskedLM (+ optional hyperbolic embedding injection)."""
    from transformers import BertConfig, FlaxBertForMaskedLM
    config = BertConfig(
        vocab_size=vocab_size, hidden_size=hidden,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=hidden * 4, max_position_embeddings=max_pos,
    )
    model = FlaxBertForMaskedLM(config, seed=seed)
    if embeddings is not None:
        params = model.params
        tbl = _fit_embedding_table(embeddings, vocab_size, hidden,
                                   inject_scale)
        params["bert"]["embeddings"]["word_embeddings"]["embedding"] = \
            jnp.asarray(tbl)
        model.params = params
    return model


def build_bert_classifier(vocab_size: int, num_labels: int, hidden: int = 256,
                          layers: int = 4, heads: int = 4, max_pos: int = 512,
                          seed: int = 0,
                          embeddings: Optional[np.ndarray] = None,
                          inject_scale: str = "raw"):
    from transformers import BertConfig, FlaxBertForSequenceClassification
    config = BertConfig(
        vocab_size=vocab_size, hidden_size=hidden,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=hidden * 4, max_position_embeddings=max_pos,
        num_labels=num_labels,
    )
    model = FlaxBertForSequenceClassification(config, seed=seed)
    if embeddings is not None:
        params = model.params
        tbl = _fit_embedding_table(embeddings, vocab_size, hidden,
                                   inject_scale)
        params["bert"]["embeddings"]["word_embeddings"]["embedding"] = \
            jnp.asarray(tbl)
        model.params = params
    return model


def make_batches(encoded: Dict, batch_size: int, max_length: int,
                 pad_id: int = 0, seed: int = 0):
    """Static-shape (B, L) batches from ragged encodings."""
    rng = np.random.default_rng(seed)
    n = len(encoded["input_ids"])
    order = rng.permutation(n)
    for start in range(0, n - batch_size + 1, batch_size):
        idx = order[start:start + batch_size]
        ids = np.full((batch_size, max_length), pad_id, np.int32)
        mask = np.zeros((batch_size, max_length), np.int32)
        for r, k in enumerate(idx):
            seq = encoded["input_ids"][k][:max_length]
            ids[r, :len(seq)] = seq
            mask[r, :len(seq)] = 1
        yield ids, mask


def mlm_eval(model, params, encoded: Dict, *, batch_size: int = 16,
             max_length: int = 128, mask_id: int = 3, mlm_prob: float = 0.15,
             seed: int = 1234) -> float:
    """Held-out masked-LM perplexity."""
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def batch_loss(params, key, ids, mask):
        key, sub = jax.random.split(key)
        rand = jax.random.uniform(sub, ids.shape)
        is_masked = (rand < mlm_prob) & (mask == 1)
        inputs = jnp.where(is_masked, mask_id, ids)
        logits = model(input_ids=inputs, attention_mask=mask,
                       params=params, train=False).logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_ll = jnp.take_along_axis(logp, ids[..., None], axis=-1)[..., 0]
        w = is_masked.astype(jnp.float32)
        return key, jnp.sum(tok_ll * w), jnp.sum(w)

    total_ll = 0.0
    total_w = 0.0
    for ids, mask in make_batches(encoded, batch_size, max_length, seed=seed):
        key, ll, w = batch_loss(params, key, jnp.asarray(ids),
                                jnp.asarray(mask))
        total_ll += float(ll)
        total_w += float(w)
    if total_w == 0:
        return float("inf")
    return math.exp(min(20.0, -total_ll / total_w))


def mlm_train(model, encoded: Dict, *, epochs: int = 1, batch_size: int = 16,
              max_length: int = 128, lr: float = 5e-4, mask_id: int = 3,
              mlm_prob: float = 0.15, seed: int = 0, log=print,
              eval_encoded: Optional[Dict] = None):
    """MLM training loop (mlm_probability 0.15, train_nlp_tasks.py:213-351).

    Returns (params, perplexity) — held-out perplexity when ``eval_encoded``
    is given, else a train-loss estimate.
    """
    import optax
    tx = optax.adamw(lr)
    params = model.params
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(params, opt_state, key, ids, mask):
        key, sub = jax.random.split(key)
        mask_f = mask.astype(jnp.float32)
        rand = jax.random.uniform(sub, ids.shape)
        is_masked = (rand < mlm_prob) & (mask == 1)
        inputs = jnp.where(is_masked, mask_id, ids)

        def loss_fn(p):
            logits = model(input_ids=inputs, attention_mask=mask,
                           params=p, train=False).logits
            logp = jax.nn.log_softmax(logits, axis=-1)
            tok_ll = jnp.take_along_axis(logp, ids[..., None],
                                         axis=-1)[..., 0]
            w = is_masked.astype(jnp.float32)
            return -jnp.sum(tok_ll * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    losses = []
    for epoch in range(epochs):
        for ids, mask in make_batches(encoded, batch_size, max_length,
                                      seed=seed + epoch):
            params, opt_state, key, loss = step(
                params, opt_state, key, jnp.asarray(ids), jnp.asarray(mask))
            losses.append(float(loss))
        log(f"epoch {epoch}: mlm loss {np.mean(losses[-50:]):.4f}")
    if eval_encoded is not None:
        ppl = mlm_eval(model, params, eval_encoded, batch_size=batch_size,
                       max_length=max_length, mask_id=mask_id,
                       mlm_prob=mlm_prob)
    else:
        ppl = math.exp(min(20.0, float(np.mean(losses[-50:])))) if losses \
            else float("inf")
    return params, ppl


def classification_train(model, encoded: Dict, labels: List[int], *,
                         epochs: int = 1, batch_size: int = 16,
                         max_length: int = 128, lr: float = 5e-4,
                         seed: int = 0, log=print,
                         eval_encoded: Optional[Dict] = None,
                         eval_labels: Optional[List[int]] = None):
    """Sequence-classification loop; returns (params, accuracy).

    The returned accuracy is held-out accuracy when ``eval_encoded``/
    ``eval_labels`` are given, else the running train accuracy (the
    reference's Trainer reports eval metrics when an eval set exists,
    train_nlp_tasks.py:213-351)."""
    import optax
    tx = optax.adamw(lr)
    params = model.params
    opt_state = tx.init(params)
    labels_arr = np.asarray(labels, np.int32)

    @jax.jit
    def step(params, opt_state, ids, mask, y):
        def loss_fn(p):
            logits = model(input_ids=ids, attention_mask=mask,
                           params=p, train=False).logits
            onehot = jax.nn.one_hot(y, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot,
                                     axis=-1))
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    accs = []
    n = len(encoded["input_ids"])
    for epoch in range(epochs):
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            ids = np.zeros((batch_size, max_length), np.int32)
            mask = np.zeros((batch_size, max_length), np.int32)
            for r, k in enumerate(idx):
                seq = encoded["input_ids"][k][:max_length]
                ids[r, :len(seq)] = seq
                mask[r, :len(seq)] = 1
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(labels_arr[idx]))
            accs.append(float(acc))
        log(f"epoch {epoch}: cls loss {float(loss):.4f} acc {np.mean(accs[-20:]):.3f}")
    train_acc = float(np.mean(accs[-20:])) if accs else 0.0
    if eval_encoded is None or eval_labels is None:
        return params, train_acc

    @jax.jit
    def logits_fn(params, ids, mask):
        return model(input_ids=ids, attention_mask=mask, params=params,
                     train=False).logits

    m = len(eval_encoded["input_ids"])
    correct = 0
    for start in range(0, m, batch_size):
        idx = list(range(start, min(start + batch_size, m)))
        ids = np.zeros((batch_size, max_length), np.int32)
        mask = np.zeros((batch_size, max_length), np.int32)
        for r, k in enumerate(idx):
            seq = eval_encoded["input_ids"][k][:max_length]
            ids[r, :len(seq)] = seq
            mask[r, :len(seq)] = 1
        pred = np.asarray(jnp.argmax(
            logits_fn(params, jnp.asarray(ids), jnp.asarray(mask)), -1))
        for r, k in enumerate(idx):
            correct += int(pred[r] == eval_labels[k])
    val_acc = correct / max(m, 1)
    log(f"val accuracy: {val_acc:.3f} (train {train_acc:.3f})")
    return params, val_acc
