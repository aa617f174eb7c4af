"""Sharded merge training step.

The step function is the same pure ``merge_step`` as single-chip (state.py);
SPMD partitioning comes entirely from sharding annotations: XLA partitions the
row-dimension matvecs across the mesh and inserts the global-argmin collectives
(all-gather of per-shard minima — O(mesh) bytes, negligible), keeping the
embedding matrix distributed. This is the jax-native replacement for the
NCCL/torch.distributed layer the reference never had (SURVEY §2.6).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh

from hyptokenizer_tpu.parallel.mesh import shard_state, state_shardings
from hyptokenizer_tpu.tokenizer import state as state_lib
from hyptokenizer_tpu.tokenizer.state import MergeConfig, MergeState


@functools.partial(jax.jit, static_argnames=("config", "n_steps"),
                   donate_argnames=("state",))
def _run(state: MergeState, config: MergeConfig, n_steps: int) -> MergeState:
    start = state.step

    def cond(s):
        return (~s.stopped) & (s.step - start < n_steps)

    return jax.lax.while_loop(cond, lambda s: state_lib.merge_step(s, config), state)


@functools.partial(jax.jit, static_argnames=("config", "n_steps"),
                   donate_argnames=("st",))
def _run_enhanced(st, config, n_steps: int):
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    st = E.sync_corpus(st, config)
    return _enhanced_loop_body(st, config, n_steps)


def _enhanced_loop_body(st, config, n_steps: int):
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    start_merges = st.base.num_merges
    start_step = st.base.step
    attempt_cap = n_steps + 1024

    def cond(s):
        return ((~s.base.stopped) & (~s.needs_resync)
                & (s.base.num_merges - start_merges < n_steps)
                & (s.base.step - start_step < attempt_cap))

    return jax.lax.while_loop(cond, lambda s: E.enhanced_step(s, config), st)


@functools.lru_cache(maxsize=16)
def _sharded_sync_fn(mesh: Mesh, config):
    """Jitted corpus-sharded sync for (mesh, config): per-shard merge replay
    and pair-table build via shard_map (each device sorts its own N/S corpus
    slice instead of every device sorting the full array — the replicated
    serialization VERDICT r2 #5 measured at 78% of the chunk cycle), then a
    tiny replicated combine (scoring.merge_pair_tables) and the shared
    scoring/queue tail (enhanced_state._sync_finish)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from hyptokenizer_tpu.parallel.mesh import VOCAB_AXIS
    from hyptokenizer_tpu.tokenizer import enhanced_state as E
    from hyptokenizer_tpu.tokenizer import scoring

    replay = (scoring.batch_rank_replay if config.priority_replay
              else scoring.batch_fixpoint_replay)

    def local(corpus_shard, merges, synced, num_merges):
        c = replay(corpus_shard, merges, synced, num_merges - synced,
                   config.n_init)
        k, cnt, nu, mx = scoring.build_pair_table(
            c, config.freq_table_size, max_id=config.base.max_vocab_size)
        return c, k, cnt, nu[None], mx[None]

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P(VOCAB_AXIS), P(), P(), P()),
        out_specs=(P(VOCAB_AXIS), P(VOCAB_AXIS, None), P(VOCAB_AXIS),
                   P(VOCAB_AXIS), P(VOCAB_AXIS)),
        check_rep=False)

    @jax.jit
    def sync(st):
        corpus, keys, counts, nus, mxs = sm(
            st.corpus, st.base.merges, st.corpus_synced, st.base.num_merges)
        keys, counts, n_unique, max_count = scoring.merge_pair_tables(
            keys, counts, nus, config.freq_table_size,
            max_id=config.base.max_vocab_size)
        return E._sync_finish(st, config, corpus, keys, counts, n_unique,
                              max_count)

    return sync


def _corpus_shard_aligned(st, n_dev: int) -> bool:
    """True when every corpus shard boundary lands on PAD/SEP (so per-shard
    pair counting is exact). One tiny device gather; see
    utils/data.shard_align_corpus."""
    import jax.numpy as jnp

    n = st.corpus.shape[0]
    if n_dev <= 1:
        return True
    if n % n_dev != 0:
        return False
    import numpy as np
    idx = jnp.asarray([k * (n // n_dev) - 1 for k in range(1, n_dev)])
    vals = np.asarray(st.corpus[idx])
    return bool(np.all(vals < 0))


def run_enhanced_sharded(st, config, n_steps: int, mesh: Mesh):
    """Sharded chunk of the enhanced scored loop (flagship multi-chip path).

    The corpus-dimension sync work (merge replay + pair counting) runs
    per-shard via shard_map when the corpus layout is shard-aligned
    (EnhancedHyperbolicTokenizer(corpus_shards=N)); otherwise it falls back
    to the replicated sync, which is correct but serializes ~80% of the
    chunk cycle (tools/profile_sync_fraction.py).
    """
    from hyptokenizer_tpu.parallel.mesh import shard_enhanced_state
    if st.base.emb.shape[0] % mesh.devices.size != 0:
        raise ValueError("max_vocab_size not divisible by mesh size")
    sharded_sync = (config.needs_corpus
                    and _corpus_shard_aligned(st, mesh.devices.size))
    st = shard_enhanced_state(st, mesh)
    # Same (sync -> merge -> resync) pacing as the single-device
    # enhanced_state.run_enhanced: queue exhaustion mid-chunk triggers a
    # fresh sync here, so the two paths' chunk accounting and merge
    # sequences stay identical.
    remaining = n_steps
    before = int(st.base.num_merges)
    with mesh:
        while True:
            if sharded_sync:
                st = _sharded_sync_fn(mesh, config)(st)
                st = _enhanced_loop_jit(st, config, remaining)
            else:
                st = _run_enhanced(st, config, remaining)
            now = int(st.base.num_merges)
            remaining -= now - before
            before = now
            if remaining <= 0 or bool(st.base.stopped):
                break
            if not bool(st.needs_resync):
                break  # candidate drought / attempt cap: caller decides
    return shard_enhanced_state(st, mesh)


@functools.partial(jax.jit, static_argnames=("config", "n_steps"),
                   donate_argnames=("st",))
def _enhanced_loop_jit(st, config, n_steps: int):
    return _enhanced_loop_body(st, config, n_steps)


def run_embed_train_sharded(emb0, corpus, vocab_size, key, mesh: Mesh,
                            **kw):
    """RSGD embedding pretraining with the table and corpus row-sharded.

    Same jitted scan as tokenizer/embed_train.py; XLA partitions the batched
    gathers/scatter-adds across the mesh (the gradient all-reduce rides the
    collectives XLA inserts). BASELINE config 5: 'Riemannian embedding
    updates + count psum across N>=2 hosts'.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hyptokenizer_tpu.parallel.mesh import VOCAB_AXIS
    from hyptokenizer_tpu.tokenizer.embed_train import train_embeddings

    row2d = NamedSharding(mesh, P(VOCAB_AXIS, None))
    row1d = NamedSharding(mesh, P(VOCAB_AXIS))
    emb0 = jax.device_put(jnp.asarray(emb0), row2d)
    corpus = jax.device_put(jnp.asarray(corpus), row1d)
    with mesh:
        return train_embeddings(emb0, corpus, vocab_size, key, **kw)


def run_merges_sharded(state: MergeState, config: MergeConfig, n_steps: int,
                       mesh: Mesh) -> MergeState:
    """Run ``n_steps`` merge steps with the state sharded over ``mesh``.

    The input state may be unsharded (it will be placed); the output keeps the
    mesh shardings, so chained calls don't re-shard.
    """
    if state.emb.shape[0] % mesh.devices.size != 0:
        raise ValueError(
            f"max_vocab_size {state.emb.shape[0]} not divisible by mesh size "
            f"{mesh.devices.size}; use parallel.mesh.pad_vocab_for_mesh")
    state = shard_state(state, mesh)
    with mesh:
        out = _run(state, config, n_steps)
    # jit propagates input shardings; re-assert canonical placement so chained
    # calls and host reads see the expected layout (no-op when already there).
    return shard_state(out, mesh)
