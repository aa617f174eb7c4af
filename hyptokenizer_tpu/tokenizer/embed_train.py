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


@functools.partial(jax.jit,
                   static_argnames=("steps", "batch", "negatives", "burn_in"))
def train_embeddings_pairs(emb0: jax.Array, pairs: jax.Array,
                           weights: jax.Array, neg_pool: jax.Array,
                           key: jax.Array, steps: int = 2000,
                           batch: int = 1024, negatives: int = 10,
                           lr: float = 0.3, c: float = 1.0,
                           burn_in: int = 0):
    """RSGD-train embeddings on an explicit positive-pair list.

    Hierarchy-aware supervision (VERDICT r2 #7): ``pairs`` are (u, v) id
    pairs that should sit CLOSE on the hyperboloid — WordNet hypernym-path
    pairs (Nickel & Kiela's task, which the reference's eval_hierarchy.py
    measures but whose embeddings are never trained), or the tokenizer's own
    merge-tree edges (child, parent) with depth weighting. Same ranking NLL
    as :func:`train_embeddings`; ``weights`` scale each pair's sampling
    probability via weighted index sampling; negatives are drawn from
    ``neg_pool`` (e.g. the graph-mapped vocab ids) so the contrast stays on
    the supervised submanifold.
    """
    n_pairs = pairs.shape[0]
    burn_in = burn_in or max(1, steps // 10)
    # Weighted sampling via the inverse-CDF trick on the cumulative weights.
    cw = jnp.cumsum(jnp.maximum(weights, 0.0))
    total = cw[-1]

    def step(carry, k):
        emb, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        u01 = jax.random.uniform(k1, (batch,)) * total
        idx = jnp.clip(jnp.searchsorted(cw, u01), 0, n_pairs - 1)
        u_idx = pairs[idx, 0]
        v_idx = pairs[idx, 1]
        neg_idx = neg_pool[jax.random.randint(
            k2, (batch, negatives), 0, neg_pool.shape[0])]

        def loss_fn(e):
            u = e[u_idx]
            v = e[v_idx]
            ng = e[neg_idx]
            d_pos = L.distance(u, v, c, eps=GRAD_EPS)
            d_neg = L.distance(u[:, None, :], ng, c, eps=GRAD_EPS)
            logits = jnp.concatenate([-d_pos[:, None], -d_neg], axis=1)
            return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])

        loss, g = jax.value_and_grad(loss_fn)(emb)
        step_lr = jnp.where(k < burn_in, lr / 10.0, lr)
        emb = L.rsgd_step(emb, g, step_lr, c)
        return (emb, key), loss

    (emb, _), losses = jax.lax.scan(step, (emb0, key),
                                    jnp.arange(steps, dtype=jnp.int32))
    return L.project_to_hyperboloid(emb, c), losses


def merge_tree_pairs(merge_history, n_init: int, max_vocab: int):
    """(child, parent) pairs + depth weights from the tokenizer's own merge
    tree — hierarchy supervision that needs no external graph.

    Merge k creates parent id ``n_init + k`` from (i, j): both children get
    an edge to the parent. Weight = 1/(1+depth) with depth = merge-tree
    height of the parent, so near-leaf structure (morpheme-like units)
    dominates over late agglomerations.
    """
    import numpy as np

    depth = np.zeros((max_vocab,), np.int32)
    pairs = []
    weights = []
    for k, (i, j) in enumerate(merge_history):
        p = n_init + k
        depth[p] = 1 + max(depth[i], depth[j])
        for ch in (i, j):
            pairs.append((ch, p))
            weights.append(1.0 / (1.0 + depth[p]))
    if not pairs:
        return (np.zeros((0, 2), np.int32), np.zeros((0,), np.float32))
    return (np.asarray(pairs, np.int32), np.asarray(weights, np.float32))


@functools.partial(jax.jit, static_argnames=("steps", "batch", "burn_in"))
def train_embeddings_stress(emb0: jax.Array, pairs: jax.Array,
                            targets: jax.Array, key: jax.Array,
                            steps: int = 2000, batch: int = 2048,
                            lr: float = 0.1, c: float = 1.0,
                            burn_in: int = 0):
    """RSGD metric-stress training: fit embedding distances to graph distances.

    Scale-free stress: per batch, the optimal global scale s* = <d_e, d_g> /
    <d_g, d_g> is substituted in closed form, so the loss only penalises
    SHAPE disagreement — exactly what eval_hierarchy's correlation measures
    (distance ratio constancy), not an arbitrary unit. Loss =
    mean((d_e - s* d_g)^2 / d_g^2) (relative, so short-range structure is
    not drowned out by the long tail).
    """
    n_pairs = pairs.shape[0]
    burn_in = burn_in or max(1, steps // 10)

    def step(carry, k):
        emb, key = carry
        key, k1 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch,), 0, n_pairs)
        u_idx = pairs[idx, 0]
        v_idx = pairs[idx, 1]
        tg = targets[idx]

        def loss_fn(e):
            d = L.distance(e[u_idx], e[v_idx], c, eps=GRAD_EPS)
            s = jnp.sum(d * tg) / jnp.maximum(jnp.sum(tg * tg), 1e-9)
            s = jax.lax.stop_gradient(s)
            return jnp.mean(((d - s * tg) / jnp.maximum(tg, 1e-6)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(emb)
        step_lr = jnp.where(k < burn_in, lr / 10.0, lr)
        emb = L.rsgd_step(emb, g, step_lr, c)
        return (emb, key), loss

    (emb, _), losses = jax.lax.scan(step, (emb0, key),
                                    jnp.arange(steps, dtype=jnp.int32))
    return L.project_to_hyperboloid(emb, c), losses


@functools.partial(jax.jit, static_argnames=("steps", "batch", "burn_in"))
def train_embeddings_ordinal(emb0: jax.Array, pairs: jax.Array,
                             targets: jax.Array, key: jax.Array,
                             steps: int = 2000, batch: int = 2048,
                             lr: float = 0.1, c: float = 1.0,
                             margin: float = 0.05, burn_in: int = 0):
    """RSGD ordinal-consistency training: rank-order embedding distances by
    graph distances.

    Per step, sample two supervised pairs p, q; when d_graph(p) < d_graph(q),
    penalise softplus(d_emb(p) - d_emb(q) + margin). This directly optimizes
    the pairwise order statistic eval_hierarchy's spearman_r measures —
    anchored neither to a global scale (stress) nor to random negatives
    (ranking NLL), only to the relation's order.
    """
    n_pairs = pairs.shape[0]
    burn_in = burn_in or max(1, steps // 10)

    def step(carry, k):
        emb, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        ip = jax.random.randint(k1, (batch,), 0, n_pairs)
        iq = jax.random.randint(k2, (batch,), 0, n_pairs)
        tp, tq = targets[ip], targets[iq]
        # Orient so p is the graph-closer pair; skip equal-distance draws.
        swap = tp > tq
        a = jnp.where(swap, iq, ip)
        b = jnp.where(swap, ip, iq)
        w = (tp != tq).astype(jnp.float32)

        def loss_fn(e):
            dp = L.distance(e[pairs[a, 0]], e[pairs[a, 1]], c, eps=GRAD_EPS)
            dq = L.distance(e[pairs[b, 0]], e[pairs[b, 1]], c, eps=GRAD_EPS)
            viol = jax.nn.softplus(dp - dq + margin)
            return jnp.sum(viol * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, g = jax.value_and_grad(loss_fn)(emb)
        step_lr = jnp.where(k < burn_in, lr / 10.0, lr)
        emb = L.rsgd_step(emb, g, step_lr, c)
        return (emb, key), loss

    (emb, _), losses = jax.lax.scan(step, (emb0, key),
                                    jnp.arange(steps, dtype=jnp.int32))
    return L.project_to_hyperboloid(emb, c), losses
