"""Riemannian SGD training of token embeddings from corpus co-occurrence.

The reference *declares* an RSGD optimizer but never runs an embedding
gradient step — embeddings stay at their random initialisation for the whole
merge training (SURVEY §2.5 "ghost features"), which makes its
distance-guided merges geometric noise. This module is the real capability:
a hyperbolic skip-gram (Nickel & Kiela 2017-style) trained with RSGD
(ops/lorentz.rsgd_step) on adjacent-token co-occurrence, so that tokens which
co-occur sit close on the hyperboloid and the merge loop's distance signal is
linguistically meaningful.

Objective per positive pair (u, v) with negatives n_1..n_K:

    L = -log  exp(-d(u,v)) / (exp(-d(u,v)) + sum_k exp(-d(u, n_k)))

Fully jitted: one ``lax.scan`` over steps; each step samples B corpus
positions and K negatives, computes the batched loss, and retracts with
``rsgd_step`` (burn-in with reduced lr for the first 10% of steps, as in
Nickel & Kiela).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hyptokenizer_tpu.ops import lorentz as L

GRAD_EPS = 1e-6


def _loss(emb, u_idx, v_idx, neg_idx, c):
    u = emb[u_idx]                       # (B, d+1)
    v = emb[v_idx]                       # (B, d+1)
    n = emb[neg_idx]                     # (B, K, d+1)
    d_pos = L.distance(u, v, c, eps=GRAD_EPS)                    # (B,)
    d_neg = L.distance(u[:, None, :], n, c, eps=GRAD_EPS)        # (B, K)
    logits = jnp.concatenate([-d_pos[:, None], -d_neg], axis=1)  # (B, 1+K)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


@functools.partial(jax.jit,
                   static_argnames=("steps", "batch", "negatives", "burn_in"))
def train_embeddings(emb0: jax.Array, corpus: jax.Array, vocab_size,
                     key: jax.Array, steps: int = 2000, batch: int = 1024,
                     negatives: int = 10, lr: float = 0.3,
                     c: float = 1.0, burn_in: int = 0) -> jax.Array:
    """RSGD-train embeddings on adjacent co-occurrence in ``corpus``.

    Args:
      emb0: (max_V, d+1) initial hyperboloid points (only rows < vocab_size
        are trained/used).
      corpus: (N,) int32 token ids; negatives (PAD/SEP) break adjacency.
      vocab_size: active vocab size (negatives sampled below it).
    Returns: (trained embeddings on the manifold, per-step loss trace).
    """
    n = corpus.shape[0]
    burn_in = burn_in or max(1, steps // 10)
    vocab_size = jnp.asarray(vocab_size, jnp.int32)

    def step(carry, k):
        emb, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        pos = jax.random.randint(k1, (batch,), 0, n - 1)
        u_idx = corpus[pos]
        v_idx = corpus[pos + 1]
        valid = (u_idx >= 0) & (v_idx >= 0)
        # Invalid positions degrade to self-pairs on token 0 with zero weight
        # via masking inside the loss: replace with 0 and mask by reweighting.
        u_idx = jnp.where(valid, u_idx, 0)
        v_idx = jnp.where(valid, v_idx, 0)
        neg_idx = jax.random.randint(k2, (batch, negatives), 0,
                                     jnp.maximum(vocab_size, 1))

        def masked_loss(e):
            u = e[u_idx]
            v = e[v_idx]
            ng = e[neg_idx]
            d_pos = L.distance(u, v, c, eps=GRAD_EPS)
            d_neg = L.distance(u[:, None, :], ng, c, eps=GRAD_EPS)
            logits = jnp.concatenate([-d_pos[:, None], -d_neg], axis=1)
            nll = -jax.nn.log_softmax(logits, axis=1)[:, 0]
            w = valid.astype(jnp.float32)
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, g = jax.value_and_grad(masked_loss)(emb)
        step_lr = jnp.where(k < burn_in, lr / 10.0, lr)
        emb = L.rsgd_step(emb, g, step_lr, c)
        return (emb, key), loss

    (emb, _), losses = jax.lax.scan(step, (emb0, key),
                                    jnp.arange(steps, dtype=jnp.int32))
    return L.project_to_hyperboloid(emb, c), losses
