"""Two-tower multimodal model with hyperbolic projection heads (flax).

Capability parity with ``MultimodalHyperbolicModel``
(multimodal/contrastive_loss.py:132-248): text and image encoders feed 2-layer
MLP projectors into ``projection_dim + 1`` coordinates, re-projected onto the
hyperboloid by recomputing the time coordinate (:181-186).

Differences by design (TPU-first, zero-egress):
  * towers are pluggable flax modules. The reference hardcodes pretrained HF
    ``bert-base-uncased`` / ``vit-base-patch16-224`` (encoder dim 768,
    :176-179) — unavailable without network. Built-in ``TransformerTower`` /
    ``ViTTower`` train from scratch at any size; HF Flax towers drop in when
    local weights exist (scripts/train_retrieval.py shows the adapter).
  * everything is jit/pjit-compatible pure-functional flax; batch-parallel
    across a mesh via sharded batches.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hyptokenizer_tpu.ops import lorentz as L


class MLPProjector(nn.Module):
    """hidden -> hidden -> projection_dim+1 (contrastive_loss.py:158-171)."""

    hidden_dim: int
    projection_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.projection_dim + 1, dtype=self.dtype)(x)
        return x


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class TransformerTower(nn.Module):
    """From-scratch text encoder: embeddings + blocks + CLS pooling."""

    vocab_size: int
    dim: int = 256
    depth: int = 4
    heads: int = 4
    max_len: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids, attention_mask=None):
        b, s = ids.shape
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)(ids)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_len, self.dim))
        x = x + pos[None, :s, :]
        attn_mask = None
        if attention_mask is not None:
            attn_mask = attention_mask[:, None, None, :].astype(bool)
        for _ in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, dtype=self.dtype)(
                x, mask=attn_mask)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        if attention_mask is not None:
            m = attention_mask[..., None].astype(x.dtype)
            return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)
        return x[:, 0]


class ViTTower(nn.Module):
    """From-scratch image encoder: patch embed + blocks + CLS token."""

    image_size: int = 64
    patch_size: int = 8
    dim: int = 256
    depth: int = 4
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        b = images.shape[0]
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype)(images)
        x = x.reshape(b, -1, self.dim)
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1)
        n = x.shape[1]
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (n, self.dim))
        x = x + pos[None]
        for _ in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return x[:, 0]


class MultimodalHyperbolicModel(nn.Module):
    """Two towers -> MLP projectors -> hyperboloid (contrastive_loss.py:132-248)."""

    text_encoder: nn.Module
    image_encoder: nn.Module
    projection_dim: int = 128
    hidden_dim: int = 512
    curvature: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.text_projector = MLPProjector(self.hidden_dim,
                                           self.projection_dim, self.dtype)
        self.image_projector = MLPProjector(self.hidden_dim,
                                            self.projection_dim, self.dtype)

    def _to_hyperboloid(self, x):
        # Recompute the time coordinate (contrastive_loss.py:181-186).
        return L.project_to_hyperboloid(x, self.curvature)

    def encode_text(self, ids, attention_mask=None):
        pooled = self.text_encoder(ids, attention_mask)
        return self._to_hyperboloid(self.text_projector(pooled))

    def encode_image(self, images):
        pooled = self.image_encoder(images)
        return self._to_hyperboloid(self.image_projector(pooled))

    def __call__(self, ids, images, attention_mask=None):
        return (self.encode_text(ids, attention_mask),
                self.encode_image(images))
