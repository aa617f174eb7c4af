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
