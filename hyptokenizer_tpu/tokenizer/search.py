"""Candidate search: exact per-row best-merge tracking.

Replaces the reference's three-regime candidate search (python double loop /
full V x V matrix / FAISS HNSW with Klein-model approximation, staleness
protocol and CPU round-trips — tokenizer/hyperbolic_merge.py:192-291,
tokenizer/fast_hyperbolic_merge.py:253-377) with a single exact formulation:

  For every row i keep ``(best_dist[i], best_j[i])`` — the closest *unmerged*
  partner j > i. A full pass costs O(V^2 d) as tiled MXU matmuls; each merge
  step then only needs O(V d) incremental updates (see state.py), because
  merging never removes tokens (reference hyperbolic_merge.py:342-355 appends
  only), so existing row minima stay valid.

The full pass here is the XLA fallback; ``ops/pallas/pairwise.py`` provides the
fused Pallas kernel with the same contract for TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hyptokenizer_tpu.ops import lorentz as L

INF = jnp.inf


def _row_block_best(emb: jax.Array, row_start: jax.Array, block: int,
                    vocab_size: jax.Array, c: jax.Array,
                    merges: jax.Array, num_merges: jax.Array,
                    lengths: jax.Array | None = None,
                    max_token_len: int = 0):
    """Best candidate per row for rows [row_start, row_start+block).

    Masks: j > i (upper triangle), j < vocab_size, (i, j) not already
    merged (merge history is canonicalised with i < j), and — when
    ``max_token_len`` > 0 and ``lengths`` is given — pairs whose merged
    token would exceed the length cap (MergeConfig.max_token_len), so a
    rebuilt candidate structure matches the training folds' structural gate.
    """
    max_v = emb.shape[0]
    rows = jax.lax.dynamic_slice_in_dim(emb, row_start, block, axis=0)
    dists = L.pairwise_dist(rows, emb, c)  # (block, max_V)

    row_ids = row_start + jax.lax.broadcasted_iota(jnp.int32, (block, max_v), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block, max_v), 1)
    mask = (col_ids > row_ids) & (col_ids < vocab_size) & (row_ids < vocab_size)
    if max_token_len > 0 and lengths is not None:
        row_len = jax.lax.dynamic_slice_in_dim(lengths, row_start, block)
        mask &= (row_len[:, None] + lengths[None, :]) <= max_token_len
    dists = jnp.where(mask, dists, INF)

    # Mask already-merged pairs: for each history entry (a, b), row a loses b.
    hist_i = merges[:, 0]
    hist_j = merges[:, 1]
    valid = jax.lax.broadcasted_iota(jnp.int32, hist_i.shape, 0) < num_merges
    in_block = valid & (hist_i >= row_start) & (hist_i < row_start + block)
    flat_idx = jnp.where(in_block, (hist_i - row_start) * max_v + hist_j, 0)
    updates = jnp.where(in_block, INF, 0.0).astype(dists.dtype)
    dists = dists.reshape(-1).at[flat_idx].max(updates).reshape(block, max_v)

    best_dist = jnp.min(dists, axis=1)
    best_j = jnp.argmin(dists, axis=1).astype(jnp.int32)
    return best_dist, best_j


@functools.partial(jax.jit, static_argnames=("block", "max_token_len"))
def full_pass_best(emb: jax.Array, vocab_size: jax.Array, c: jax.Array,
                   merges: jax.Array, num_merges: jax.Array,
                   block: int = 512, lengths: jax.Array | None = None,
                   max_token_len: int = 0):
    """Compute ``(best_dist, best_j)`` for every row, tiled over row blocks.

    Memory bound: ``block * max_V`` floats live at once (the reference's
    no-FAISS path materialises the full V x V matrix,
    fast_hyperbolic_merge.py:335-355).
    """
    max_v = emb.shape[0]
    block = min(block, max_v)
    n_blocks = -(-max_v // block)
    pad_v = n_blocks * block

    if pad_v != max_v:
        emb_p = jnp.pad(emb, ((0, pad_v - max_v), (0, 0)))
        lengths_p = (None if lengths is None
                     else jnp.pad(lengths, (0, pad_v - max_v)))
    else:
        emb_p = emb
        lengths_p = lengths

    def one_block(b):
        bd, bj = _row_block_best(emb_p, b * block, block, vocab_size, c,
                                 merges, num_merges, lengths_p,
                                 max_token_len)
        return bd, bj

    bd, bj = jax.lax.map(one_block, jnp.arange(n_blocks, dtype=jnp.int32))
    return bd.reshape(-1)[:max_v], bj.reshape(-1)[:max_v]


def row_best(emb: jax.Array, i: jax.Array, vocab_size: jax.Array, c: jax.Array,
             merges: jax.Array, num_merges: jax.Array):
    """Recompute the best candidate of a single row ``i`` (O(V d)).

    Used after row ``i`` wins a merge: its previous best partner is now in the
    merged set, so its next-best must be found among the remaining j > i.
    """
    max_v = emb.shape[0]
    x = jax.lax.dynamic_index_in_dim(emb, i, axis=0, keepdims=True)  # (1, d+1)
    dists = L.pairwise_dist(x, emb, c)[0]  # (max_V,)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (max_v, 1), 0)[:, 0]
    mask = (col_ids > i) & (col_ids < vocab_size)
    dists = jnp.where(mask, dists, INF)

    hist_i = merges[:, 0]
    hist_j = merges[:, 1]
    valid = jax.lax.broadcasted_iota(jnp.int32, hist_i.shape, 0) < num_merges
    hit = valid & (hist_i == i)
    idx = jnp.where(hit, hist_j, 0)
    upd = jnp.where(hit, INF, 0.0).astype(dists.dtype)
    dists = dists.at[idx].max(upd)

    return jnp.min(dists), jnp.argmin(dists).astype(jnp.int32)


def column_update(emb: jax.Array, new_idx: jax.Array, c: jax.Array,
                  best_dist: jax.Array, best_j: jax.Array):
    """Fold the newly-inserted token (column ``new_idx``) into every row's best.

    Every row r < new_idx gains the candidate pair (r, new_idx); rows improve
    where ``dist(r, new) < best_dist[r]``. O(V d): one matvec.
    """
    max_v = emb.shape[0]
    x = jax.lax.dynamic_index_in_dim(emb, new_idx, axis=0, keepdims=True)
    dists = L.pairwise_dist(emb, x, c)[:, 0]  # (max_V,)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (max_v, 1), 0)[:, 0]
    applies = row_ids < new_idx
    dists = jnp.where(applies, dists, INF)

    improved = dists < best_dist
    return (
        jnp.where(improved, dists, best_dist),
        jnp.where(improved, new_idx.astype(jnp.int32), best_j),
    )
