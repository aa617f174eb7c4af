"""Mesh construction and sharding specs for the merge training state."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyptokenizer_tpu.tokenizer.state import MergeState

# Single mesh axis: the vocabulary/row dimension of every large array. On a
# multi-host pod this axis spans all chips (ICI within host, DCN across);
# scalars and the small merge table are replicated.
VOCAB_AXIS = "vocab"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over ``VOCAB_AXIS``. Defaults to all visible devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VOCAB_AXIS,))


def state_shardings(mesh: Mesh) -> MergeState:
    """A MergeState-shaped pytree of NamedShardings.

    Row-partitioned: embeddings, lengths and the per-row candidate arrays.
    Replicated: scalars and the merge table (small, consumed by the host every
    sync and needed whole for history masking).
    """
    row = NamedSharding(mesh, P(VOCAB_AXIS))
    rep = NamedSharding(mesh, P())
    return MergeState(
        emb=NamedSharding(mesh, P(VOCAB_AXIS, None)),
        lengths=row,
        best_dist=row,
        best_j=row,
        merges=rep,
        merge_dists=rep,
        vocab_size=rep,
        num_merges=rep,
        step=rep,
        threshold=rep,
        curvature=rep,
        empty_rounds=rep,
        stopped=rep,
    )


def enhanced_state_shardings(mesh: Mesh, st):
    """EnhancedState-shaped pytree of NamedShardings.

    Row-partitioned: everything aligned with the vocabulary axis (embeddings,
    candidate arrays, token features) and the corpus stream. Replicated: the
    pair/morphology tables (sub-MB, read-mostly) and scalars.
    """
    from hyptokenizer_tpu.tokenizer.enhanced_state import EnhancedState

    row = NamedSharding(mesh, P(VOCAB_AXIS))
    rep = NamedSharding(mesh, P())
    return EnhancedState(
        base=state_shardings(mesh),
        key=rep,
        phase=rep,
        corpus=row,
        corpus_synced=rep,
        corpus_tokens=rep,
        pair_keys=rep,
        pair_counts=rep,
        max_pair_count=rep,
        pair_unique=rep,
        q_i=rep,
        q_j=rep,
        q_dist=rep,
        q_score=rep,
        q_valid_total=rep,
        needs_resync=rep,
        coh_samples=rep,
        token_hash=NamedSharding(mesh, P(VOCAB_AXIS, None)),
        byte_lengths=row,
        has_vowel=row,
        hash_powers=rep,
        morph_table=rep,
        morph_size=rep,
        word_table=rep,
        word_size=rep,
        curv_m=rep,
        curv_v=rep,
        curv_t=rep,
        curv_last=rep,
    )


def shard_enhanced_state(st, mesh: Mesh):
    shardings = enhanced_state_shardings(mesh, st)
    return jax.tree.map(jax.device_put, st, shardings)


def shard_state(state: MergeState, mesh: Mesh) -> MergeState:
    """Place an existing state onto the mesh with the canonical shardings.

    Requires ``max_vocab_size`` divisible by the mesh size (constructors round
    up via ``pad_vocab_for_mesh``).
    """
    shardings = state_shardings(mesh)
    return jax.tree.map(jax.device_put, state, shardings)


def pad_vocab_for_mesh(max_vocab_size: int, n_devices: int, block: int = 1) -> int:
    """Round max_vocab_size up to a multiple of n_devices * block."""
    q = n_devices * block
    return ((max_vocab_size + q - 1) // q) * q
