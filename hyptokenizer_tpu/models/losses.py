"""Hyperbolic contrastive losses and retrieval metrics.

Capability parity with ``multimodal/contrastive_loss.py:17-129`` and the
Recall@K evaluator (``scripts/train_retrieval.py:176-229``), vectorised: the
reference builds its (B, B) distance matrix with a python row loop
(contrastive_loss.py:38-45) and computes Recall@K with a nested scalar-distance
loop; here both are single MXU matmuls via ``ops.lorentz.pairwise_dist``.

Gradient note: the pairwise distance uses the grad-safe acosh clamp
(eps=1e-6) because the diagonal contains matched pairs whose distance
approaches 0 — with the reference's 1e-8 clamp the gradient is NaN at the
clamp point (DEVIATIONS.md; ops/lorentz.py docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hyptokenizer_tpu.ops import lorentz as L

GRAD_EPS = 1e-6


def hyperbolic_contrastive_loss(z1: jax.Array, z2: jax.Array,
                                temperature: float = 0.07,
                                c: float = 1.0) -> jax.Array:
    """Symmetric InfoNCE over pairwise hyperbolic distances.

    Parity: contrastive_loss.py:17-60 — similarities = -distance/temperature,
    cross-entropy in both directions, averaged.
    """
    dist = L.pairwise_dist(z1, z2, c, eps=GRAD_EPS)      # (B, B)
    sims = -dist / temperature
    labels = jnp.arange(z1.shape[0])
    loss_12 = -jnp.mean(
        jax.nn.log_softmax(sims, axis=1)[labels, labels])
    loss_21 = -jnp.mean(
        jax.nn.log_softmax(sims.T, axis=1)[labels, labels])
    return 0.5 * (loss_12 + loss_21)


def hyperbolic_triplet_loss(anchor: jax.Array, positive: jax.Array,
                            negative: jax.Array, margin: float = 0.1,
                            c: float = 1.0) -> jax.Array:
    """``relu(d(a, p) - d(a, n) + margin)`` averaged.

    Parity: contrastive_loss.py:63-96.
    """
    d_pos = L.distance(anchor, positive, c, eps=GRAD_EPS)
    d_neg = L.distance(anchor, negative, c, eps=GRAD_EPS)
    return jnp.mean(jax.nn.relu(d_pos - d_neg + margin))


class HyperbolicInfoNCE:
    """Callable wrapper (parity with the nn.Module at contrastive_loss.py:99-129)."""

    def __init__(self, temperature: float = 0.07, curvature: float = 1.0):
        self.temperature = temperature
        self.curvature = curvature

    def __call__(self, z1: jax.Array, z2: jax.Array) -> jax.Array:
        return hyperbolic_contrastive_loss(z1, z2, self.temperature,
                                           self.curvature)


def recall_at_k(query: jax.Array, gallery: jax.Array,
                ks=(1, 5, 10), c: float = 1.0) -> dict:
    """Recall@K both directions from one distance matrix.

    Parity: train_retrieval.py:176-229 (which recomputes scalar distances in a
    double loop per K per direction).
    """
    dist = L.pairwise_dist(query, gallery, c)            # (B, B)
    labels = jnp.arange(query.shape[0])
    order_q = jnp.argsort(dist, axis=1)                  # query -> gallery
    order_g = jnp.argsort(dist.T, axis=1)                # gallery -> query
    out = {}
    for k in ks:
        hit_q = jnp.any(order_q[:, :k] == labels[:, None], axis=1)
        hit_g = jnp.any(order_g[:, :k] == labels[:, None], axis=1)
        out[f"text_to_image_r@{k}"] = jnp.mean(hit_q)
        out[f"image_to_text_r@{k}"] = jnp.mean(hit_g)
    return out
