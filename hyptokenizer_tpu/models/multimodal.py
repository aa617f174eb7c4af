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


class HFFlaxTextTower(nn.Module):
    """Adapter: a HuggingFace Flax text model as the text tower.

    Pass the HF model's inner flax module (``FlaxBertModel(cfg).module``);
    graft its pretrained ``.params`` into the initialized variables with
    :func:`graft_pretrained_params`. Mirrors the reference's hardcoded
    ``bert-base-uncased`` tower (multimodal/contrastive_loss.py:176-179) but
    accepts any HF Flax text model at any size.
    """

    hf_module: Any

    @nn.compact
    def __call__(self, ids, attention_mask=None):
        if attention_mask is None:
            attention_mask = jnp.ones_like(ids)
        out = self.hf_module(input_ids=ids, attention_mask=attention_mask,
                             deterministic=True)
        pooled = getattr(out, "pooler_output", None)
        if pooled is None:
            pooled = out.last_hidden_state[:, 0]
        return pooled


class HFFlaxImageTower(nn.Module):
    """Adapter: a HuggingFace Flax vision model (e.g. FlaxViTModel) as the
    image tower. HF Flax vision models take channel-LAST pixel values
    (NHWC) — the same layout the built-in ViTTower uses; channel-first
    input is transposed."""

    hf_module: Any

    @nn.compact
    def __call__(self, images):
        if images.ndim == 4 and images.shape[1] in (1, 3) \
                and images.shape[-1] not in (1, 3):
            images = jnp.transpose(images, (0, 2, 3, 1))
        out = self.hf_module(pixel_values=images, deterministic=True)
        pooled = getattr(out, "pooler_output", None)
        if pooled is None:
            pooled = out.last_hidden_state[:, 0]
        return pooled


def graft_pretrained_params(params, text_params=None, image_params=None):
    """Insert HF ``model.params`` trees into an initialized
    ``MultimodalHyperbolicModel`` param tree.

    The HF submodule lives at ``{text,image}_encoder/hf_module`` (flax names
    submodules by attribute); initialization gives it random weights, this
    swaps in the pretrained ones. Raises KeyError when the model was not
    built with the HF tower adapters.
    """
    import flax

    p = flax.core.unfreeze(params)
    if text_params is not None:
        p["text_encoder"]["hf_module"] = text_params
    if image_params is not None:
        p["image_encoder"]["hf_module"] = image_params
    return p


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
