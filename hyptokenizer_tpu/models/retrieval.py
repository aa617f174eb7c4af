"""Image-text retrieval training with the hyperbolic two-tower model.

Capability parity with ``scripts/train_retrieval.py:232-475``: AdamW epoch
loop over caption/image pairs with the hyperbolic contrastive loss,
best-checkpoint-on-R@1 tracking and a final Recall@{1,5,10} evaluation — but
as jitted static-shape steps (the reference evaluates Recall with a python
double loop of scalar distances, :176-229; here it is one distance matmul).

Data is any iterable of (image_array, caption_ids, caption_mask); the COCO
loader of the reference needs the locally-downloaded dataset (zero egress) —
``synthetic_batches`` provides a correlated toy task for smoke/e2e runs.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.models.losses import (
    hyperbolic_contrastive_loss, recall_at_k,
)


def synthetic_batches(n_batches: int, batch_size: int, image_size: int,
                      seq_len: int, vocab_size: int, seed: int = 0):
    """Correlated image/caption pairs: caption ids drive image patterns, so a
    working model can actually learn alignment."""
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        ids = rng.integers(4, vocab_size, (batch_size, seq_len)).astype(np.int32)
        mask = np.ones((batch_size, seq_len), np.int32)
        # Images: low-frequency pattern keyed on the first two caption ids.
        xx, yy = np.meshgrid(np.linspace(0, 1, image_size),
                             np.linspace(0, 1, image_size))
        images = np.zeros((batch_size, image_size, image_size, 3), np.float32)
        for b in range(batch_size):
            f1 = 1 + (ids[b, 0] % 5)
            f2 = 1 + (ids[b, 1] % 5)
            images[b, :, :, 0] = np.sin(2 * np.pi * f1 * xx)
            images[b, :, :, 1] = np.cos(2 * np.pi * f2 * yy)
            images[b, :, :, 2] = 0.1 * rng.standard_normal((image_size,
                                                            image_size))
        yield images, ids, mask


def train_retrieval(model, batches_fn, *, epochs: int = 1, lr: float = 1e-4,
                    temperature: float = 0.07, seed: int = 0,
                    eval_batch: Optional[Tuple] = None, log=print) -> Dict:
    """AdamW training with best-R@1 tracking (train_retrieval.py:232-475)."""
    import optax
    tx = optax.adamw(lr)
    first = next(iter(batches_fn()))
    images0, ids0, mask0 = first
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(ids0),
                        jnp.asarray(images0), jnp.asarray(mask0))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids, images, mask):
        def loss_fn(p):
            zt, zi = model.apply(p, ids, images, mask)
            return hyperbolic_contrastive_loss(zt, zi, temperature)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def embed(params, ids, images, mask):
        return model.apply(params, ids, images, mask)

    best = {"r1": -1.0, "params": params}
    history = []
    for epoch in range(epochs):
        losses = []
        for images, ids, mask in batches_fn():
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(images),
                jnp.asarray(mask))
            losses.append(float(loss))
        metrics = {}
        if eval_batch is not None:
            ev_images, ev_ids, ev_mask = eval_batch
            zt, zi = embed(params, jnp.asarray(ev_ids),
                           jnp.asarray(ev_images), jnp.asarray(ev_mask))
            metrics = {k: float(v) for k, v in recall_at_k(zt, zi).items()}
            r1 = metrics["text_to_image_r@1"]
            if r1 > best["r1"]:
                best = {"r1": r1, "params": params}
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        **metrics})
        log(f"epoch {epoch}: loss {np.mean(losses):.4f} "
            + " ".join(f"{k}={v:.3f}" for k, v in metrics.items()))
    return {"params": params, "best": best, "history": history}
