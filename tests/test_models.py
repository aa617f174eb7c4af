"""Losses + multimodal model tests (the reference has zero coverage here)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyptokenizer_tpu.models import (
    HyperbolicInfoNCE,
    MultimodalHyperbolicModel,
    TransformerTower,
    ViTTower,
    hyperbolic_contrastive_loss,
    hyperbolic_triplet_loss,
    recall_at_k,
)
from hyptokenizer_tpu.ops import lorentz as L


def test_contrastive_loss_prefers_aligned():
    key = jax.random.PRNGKey(0)
    z = L.random_points(key, 16, 12, sigma=0.5)
    aligned = hyperbolic_contrastive_loss(z, z)
    shuffled = hyperbolic_contrastive_loss(z, jnp.roll(z, 4, axis=0))
    assert float(aligned) < float(shuffled)


def test_contrastive_loss_matches_reference_formula():
    """Reproduce the loss with an explicit per-row loop (the reference's
    structure, contrastive_loss.py:38-60)."""
    key = jax.random.PRNGKey(1)
    z1 = L.random_points(key, 6, 8, sigma=0.5)
    z2 = L.random_points(jax.random.PRNGKey(2), 6, 8, sigma=0.5)
    got = float(hyperbolic_contrastive_loss(z1, z2, temperature=0.07))
    dist = np.zeros((6, 6), np.float32)
    for i in range(6):
        dist[i] = np.asarray(L.distance(
            jnp.broadcast_to(z1[i], z2.shape), z2, eps=1e-6))
    sims = -dist / 0.07
    def ce(s):
        p = s - np.log(np.exp(s - s.max(1, keepdims=True)).sum(1, keepdims=True)) - s.max(1, keepdims=True)
        return -np.mean(np.diag(p))
    want = 0.5 * (ce(sims) + ce(sims.T))
    assert abs(got - want) < 1e-4


def test_contrastive_loss_has_finite_grads():
    key = jax.random.PRNGKey(0)
    z1 = L.random_points(key, 8, 12, sigma=0.5)
    g = jax.grad(lambda a: hyperbolic_contrastive_loss(a, z1))(z1)
    assert np.isfinite(np.asarray(g)).all()


def test_triplet_loss():
    key = jax.random.PRNGKey(3)
    a = L.random_points(key, 8, 10, sigma=0.5)
    # positive == anchor, negative far -> zero loss
    far = L.random_points(jax.random.PRNGKey(4), 8, 10, sigma=2.0)
    loss = hyperbolic_triplet_loss(a, a, far, margin=0.1)
    assert float(loss) < 0.12
    # negative == anchor, positive far -> large loss
    loss2 = hyperbolic_triplet_loss(a, far, a, margin=0.1)
    assert float(loss2) > float(loss)


def test_recall_at_k_perfect_and_random():
    key = jax.random.PRNGKey(5)
    z = L.random_points(key, 20, 16, sigma=0.8)
    r = recall_at_k(z, z)
    assert float(r["text_to_image_r@1"]) == 1.0
    assert float(r["image_to_text_r@10"]) == 1.0


def test_multimodal_forward_and_training_step():
    model = MultimodalHyperbolicModel(
        text_encoder=TransformerTower(vocab_size=50, dim=32, depth=1, heads=2,
                                      max_len=16),
        image_encoder=ViTTower(image_size=16, patch_size=8, dim=32, depth=1,
                               heads=2),
        projection_dim=8, hidden_dim=32)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (4, 16), 0, 50)
    mask = jnp.ones((4, 16), jnp.int32)
    images = jax.random.normal(key, (4, 16, 16, 3))
    params = model.init(key, ids, images, mask)
    zt, zi = model.apply(params, ids, images, mask)
    assert zt.shape == (4, 9) and zi.shape == (4, 9)
    # On-manifold check.
    np.testing.assert_allclose(np.asarray(L.minkowski_dot(zt, zt)), 1.0,
                               atol=1e-4)

    # One AdamW step reduces loss on a fixed batch after a few iterations.
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            zt, zi = model.apply(p, ids, images, mask)
            return hyperbolic_contrastive_loss(zt, zi)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params2, opt_state, l0 = step(params, opt_state)
    for _ in range(5):
        params2, opt_state, l1 = step(params2, opt_state)
    assert float(l1) < float(l0)
    assert np.isfinite(float(l1))


def test_infonce_wrapper():
    key = jax.random.PRNGKey(0)
    z = L.random_points(key, 8, 10, sigma=0.5)
    loss_fn = HyperbolicInfoNCE(temperature=0.1)
    assert np.isfinite(float(loss_fn(z, z)))


def test_hf_flax_tower_adapter():
    """Pretrained-tower adapter (VERDICT r1 #10): HF Flax BERT/ViT modules
    drop into MultimodalHyperbolicModel; pretrained params graft into the
    initialized tree and change the outputs. Mocked weights (tiny local
    configs) — no network."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest
    pytest.importorskip("transformers")
    from transformers import BertConfig, ViTConfig
    from transformers import FlaxBertModel, FlaxViTModel
    from hyptokenizer_tpu.models.multimodal import (
        HFFlaxImageTower, HFFlaxTextTower, MultimodalHyperbolicModel,
        graft_pretrained_params)
    from hyptokenizer_tpu.ops import lorentz as L

    bert = FlaxBertModel(
        BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=32), seed=0)
    vit = FlaxViTModel(
        ViTConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                  intermediate_size=64, image_size=16, patch_size=8,
                  num_channels=3), seed=0)
    model = MultimodalHyperbolicModel(
        text_encoder=HFFlaxTextTower(bert.module),
        image_encoder=HFFlaxImageTower(vit.module),
        projection_dim=8, hidden_dim=16)
    ids = jnp.ones((2, 8), jnp.int32)
    images = jnp.ones((2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, images)
    zt, zi = model.apply(variables, ids, images)
    assert zt.shape == (2, 9) and zi.shape == (2, 9)
    # On the hyperboloid: <x, x>_L == 1.
    mink = np.asarray(L.minkowski_dot(zt, zt))
    np.testing.assert_allclose(mink, 1.0, atol=1e-4)

    # Graft the "pretrained" HF weights (here: the HF models' own params,
    # which differ from model.init's random tower weights).
    params2 = graft_pretrained_params(variables["params"],
                                      text_params=bert.params,
                                      image_params=vit.params)
    zt2, zi2 = model.apply({"params": params2}, ids, images)
    assert zt2.shape == (2, 9)
    assert not np.allclose(np.asarray(zt), np.asarray(zt2))
