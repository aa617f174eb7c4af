"""The merge loop as a jitted state machine.

The reference's training loop (tokenizer/hyperbolic_merge.py:357-412,
tokenizer/fast_hyperbolic_merge.py:467-576) is a host-bound python loop that
re-searches candidates every step. Here the whole loop is device-resident:

  state = (embeddings buffer, per-row best-candidate arrays, merge table,
           threshold, counters)
  one step = global argmin  ->  tangent-space midpoint insert  ->
             O(V d) incremental candidate updates

All shapes are static (pre-allocated ``max_vocab_size`` buffers with an active
prefix, the same trick the reference uses at hyperbolic_merge.py:144-153), so a
``lax.while_loop`` of steps compiles once and runs at device speed. The host
owns only the vocabulary *strings*, reconstructed from the integer merge table
afterwards.

Semantics parity notes:
  * greedy selection = global min distance, ties -> lowest (i, j): identical to
    the reference's stable sort over (i-major, j-minor) enumeration
    (hyperbolic_merge.py:377-396).
  * midpoint = exp_map(x_i, w_j * log_map(x_i, x_j)) with length-proportional
    w_j, then re-projection (hyperbolic_merge.py:320-340).
  * adaptive threshold: x1.5 after 6 consecutive empty rounds, stop after 10
    empty rounds when non-adaptive (fast_hyperbolic_merge.py:529-541); x1.1
    every 1000 steps (:572-576).
  * unlike the reference, an already-merged pair is never selected again (the
    reference re-merges pairs once its candidate cache refills — a quirk, not a
    feature; we track the merged set exactly).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import search

INF = jnp.inf
# Adaptive threshold growth cap: beyond this every finite distance passes,
# so further growth only degrades logs/coherence terms.
THRESHOLD_CAP = 1e6


@struct.dataclass
class MergeConfig:
    """Static configuration of the merge loop (hashable, jit-static)."""

    max_vocab_size: int = struct.field(pytree_node=False, default=100_000)
    adaptive_threshold: bool = struct.field(pytree_node=False, default=True)
    threshold_growth_every: int = struct.field(pytree_node=False, default=1000)
    threshold_growth: float = struct.field(pytree_node=False, default=1.1)
    empty_growth_after: int = struct.field(pytree_node=False, default=6)
    empty_growth: float = struct.field(pytree_node=False, default=1.5)
    empty_stop_after: int = struct.field(pytree_node=False, default=10)
    search_block: int = struct.field(pytree_node=False, default=512)
    # Full-pass backend: None = auto (Pallas on TPU, XLA elsewhere).
    use_pallas: bool | None = struct.field(pytree_node=False, default=None)
    # False: skip the O(V0^2 d) initial candidate pass and POISON
    # best_dist/best_j (-inf/-1) instead. Set by corpus-only (bpe-mode)
    # enhanced training, where no path reads the dense-candidate arrays: the
    # poison makes any accidental read fail loudly (VERDICT r3 #7) and the
    # init skips a full 50k^2 pairwise pass whose result would be dead.
    # -inf, not NaN: real best_dist values are nonnegative (or +inf for
    # "no candidate"), so -inf is unambiguous — and unlike NaN it survives
    # jax.distributed's cross-process device_put equality check.
    init_candidates: bool = struct.field(pytree_node=False, default=True)
    # Maximum CHAR length of a merged token (0 = unlimited). Realises the
    # validity gate the reference declares but never implements
    # (_is_valid_merge always True — hyperbolic_merge.py:293-307, SURVEY
    # §2.5): without it the geometric channel chain-collapses (each merge's
    # midpoint lands closer to its parents than any other pair, so the
    # lineage wins the argmin forever and token strings grow like Fibonacci
    # concatenation — measured >31 GB of host vocab strings at 50k vocab).
    # Enforced STRUCTURALLY in the candidate folds: overlong combinations
    # never enter best_dist/best_j, so the argmin stays live instead of
    # stalling on a blocked pair. A gated fold can leave an invalidated row
    # at +inf although ungated partners exist (conservative misses; the row
    # is re-claimed by later folds) — the exact-exclusion invariant of
    # merge_pair is preserved for every allowed pair. Default 0 here (the
    # distance-only loop keeps reference semantics and its Pallas-kernel
    # lockstep); the enhanced tokenizer defaults it to 512.
    max_token_len: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class MergeState:
    """Device-side merge training state (a pytree; donate-friendly)."""

    emb: jax.Array          # (max_V, d+1) f32 hyperboloid points
    lengths: jax.Array      # (max_V,) i32 token string lengths
    best_dist: jax.Array    # (max_V,) f32 closest-unmerged-partner distance
    best_j: jax.Array       # (max_V,) i32 partner index
    merges: jax.Array       # (max_V, 2) i32 merge history (i, j), -1 padded
    merge_dists: jax.Array  # (max_V,) f32 distance at merge time (stats)
    vocab_size: jax.Array   # i32 scalar — active prefix length
    num_merges: jax.Array   # i32 scalar
    step: jax.Array         # i32 scalar — optimisation step counter
    threshold: jax.Array    # f32 scalar
    curvature: jax.Array    # f32 scalar
    empty_rounds: jax.Array  # i32 scalar — consecutive candidate-free rounds
    stopped: jax.Array      # bool scalar


@functools.partial(jax.jit, static_argnames=("max_v",))
def _assemble_buffers(emb0: jax.Array, lengths0: jax.Array,
                      thr_curv: jax.Array, max_v: int):
    """Pad the initial-vocab arrays into the ``max_v`` training buffers.

    One jitted device-side assembly (a single cacheable compile): only the
    small (n0, d+1) initial arrays and a (2,) [threshold, curvature] float
    vector cross host->device. Building the padded buffers host-side and
    uploading them costs tens of seconds through a remote-device transport
    at max_v=50k (~21 MB); likewise, EVERY state scalar is produced here
    rather than as its own ``jnp.asarray`` — the tunneled transport defers
    per-op work into the ctor's flush fetch, so dispatch count is ctor
    wall time (BENCH round 5: 59 s of ctor flush in bad tunnel weather).
    """
    n0, d1 = emb0.shape
    emb = jnp.zeros((max_v, d1), jnp.float32).at[:n0].set(emb0)
    lengths = jnp.zeros((max_v,), jnp.int32).at[:n0].set(lengths0)
    merges = jnp.full((max_v, 2), -1, jnp.int32)
    merge_dists = jnp.zeros((max_v,), jnp.float32)
    scalars = dict(
        vocab_size=jnp.asarray(n0, jnp.int32),
        num_merges=jnp.asarray(0, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        threshold=thr_curv[0],
        curvature=thr_curv[1],
        empty_rounds=jnp.asarray(0, jnp.int32),
        stopped=jnp.asarray(False, jnp.bool_),
    )
    poison_bd = jnp.full((max_v,), -jnp.inf, jnp.float32)
    poison_bj = jnp.full((max_v,), -1, jnp.int32)
    return emb, lengths, merges, merge_dists, scalars, poison_bd, poison_bj


def init_state(emb0: jax.Array, lengths0: jax.Array, *, curvature: float = 1.0,
               threshold: float = 0.1, config: MergeConfig) -> MergeState:
    """Build the initial state and run the one-time O(V0^2 d) candidate pass."""
    import numpy as np

    max_v = config.max_vocab_size
    n0 = emb0.shape[0]
    if n0 > max_v:
        raise ValueError(f"initial vocab {n0} exceeds max_vocab_size {max_v}")

    # jnp.asarray on an existing jax.Array is a device-side cast; routing it
    # through np.asarray would be a device->host round-trip, which costs
    # ~29 s PER PULL on the remote-tunnel TPU transport (profiled: 86 s of
    # the flagship bench ctor). Only non-jax inputs go through numpy.
    def _dev(x, dt):
        if isinstance(x, jax.Array):
            return x.astype(dt)
        return jnp.asarray(np.asarray(x), dt)

    thr_curv = jnp.asarray(np.asarray([threshold, curvature], np.float32))
    (emb, lengths, merges, merge_dists, scalars,
     poison_bd, poison_bj) = _assemble_buffers(
        _dev(emb0, jnp.float32), _dev(lengths0, jnp.int32), thr_curv, max_v)
    vocab_size = scalars["vocab_size"]
    num_merges = scalars["num_merges"]
    c = scalars["curvature"]

    use_pallas = config.use_pallas
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if not config.init_candidates:
        # Dense channel unused (corpus-only enhanced mode): poison instead
        # of computing (see MergeConfig.init_candidates).
        best_dist = poison_bd
        best_j = poison_bj
    elif use_pallas:
        # History is empty at init: the fused kernel applies directly.
        from hyptokenizer_tpu.ops.pallas import pairwise_min_best
        best_dist, best_j = pairwise_min_best(emb, vocab_size, c)
    else:
        best_dist, best_j = search.full_pass_best(
            emb, vocab_size, c, merges, num_merges, block=config.search_block
        )
    return MergeState(
        emb=emb, lengths=lengths, best_dist=best_dist, best_j=best_j,
        merges=merges, merge_dists=merge_dists, vocab_size=vocab_size,
        num_merges=num_merges, step=scalars["step"],
        threshold=scalars["threshold"], curvature=c,
        empty_rounds=scalars["empty_rounds"],
        stopped=scalars["stopped"],
    )


@functools.partial(jax.jit, static_argnames=("sample_size",))
def distance_statistics(emb: jax.Array, vocab_size: jax.Array,
                        curvature: jax.Array, key: jax.Array,
                        sample_size: int = 1000):
    """min/max/mean/std of sampled pairwise distances.

    Parity: the reference's ``_compute_distance_statistics``
    (fast_hyperbolic_merge.py:433-465) — it draws ``sample_size`` distinct
    pairs host-side one ``.item()`` at a time; here one vectorised draw with
    replacement (statistically equivalent diagnostics, ~1000x fewer device
    round-trips).
    """
    k1, k2 = jax.random.split(key)
    n = jnp.maximum(vocab_size, 2)
    i = jax.random.randint(k1, (sample_size,), 0, n)
    j = jax.random.randint(k2, (sample_size,), 0, n - 1)
    j = jnp.where(j >= i, j + 1, j)  # uniform over j != i
    d = L.distance(emb[i], emb[j], curvature)
    return jnp.stack([jnp.min(d), jnp.max(d), jnp.mean(d), jnp.std(d)])


def midpoint_insert(emb: jax.Array, lengths: jax.Array, i: jax.Array,
                    j: jax.Array, new_idx: jax.Array, c: jax.Array):
    """Weighted tangent-space midpoint of tokens i and j, written at new_idx.

    Parity: reference _merge_tokens (hyperbolic_merge.py:309-355) — weights are
    proportional to operand string lengths; midpoint is exp_map at x_i of the
    w_j-scaled log of x_j, re-projected onto the sheet.
    """
    xi = jax.lax.dynamic_index_in_dim(emb, i, axis=0, keepdims=False)
    xj = jax.lax.dynamic_index_in_dim(emb, j, axis=0, keepdims=False)
    len_i = jax.lax.dynamic_index_in_dim(lengths, i, axis=0, keepdims=False)
    len_j = jax.lax.dynamic_index_in_dim(lengths, j, axis=0, keepdims=False)
    w_j = len_j.astype(jnp.float32) / (len_i + len_j).astype(jnp.float32)

    # geodesic_point == exp_map(xi, w_j * log_map(xi, xj)) exactly, in the
    # cancellation-free evaluation (see its docstring).
    x_new = L.project_to_hyperboloid(L.geodesic_point(xi, xj, w_j, c), c)

    emb = emb.at[new_idx].set(x_new)
    lengths = lengths.at[new_idx].set(len_i + len_j)
    return emb, lengths


def _do_merge(state: MergeState, config: MergeConfig) -> MergeState:
    """Apply the current best merge and incrementally update candidates."""
    i = jnp.argmin(state.best_dist).astype(jnp.int32)
    d = state.best_dist[i]
    j = state.best_j[i]
    return merge_pair(state, i, j, d, config.max_token_len)


def merge_pair(state: MergeState, i: jax.Array, j: jax.Array,
               d: jax.Array, max_token_len: int = 0) -> MergeState:
    """Merge the chosen pair (i, j) (distance ``d``) and update candidates.

    Shared by the distance-only loop (which picks the global argmin) and the
    enhanced scored loop (which picks by combined feature score).

    Candidate maintenance is ONE column fold (a single O(V d) HBM pass) —
    there is no row re-scan and no history consultation. Structural-exclusion
    invariant: ``best_j[r]`` always points at an *unconsumed* column, because

      * when the consumed pair was row i's tracked best, that best was the
        true minimum over unconsumed columns, so every other unconsumed q has
        d(i, q) >= d(i, j); the new midpoint satisfies
        d(i, m) = w_j * d(i, j) <= d(i, j) (w_j < 1), hence folding m's
        column after invalidating row i re-establishes the true minimum;
      * when the consumed pair was NOT the tracked best (enhanced sparse-
        channel merges), the tracked best is untouched and stays unconsumed;
      * folds only ever point rows at freshly-inserted (unconsumed) columns.

    Consumed pairs therefore can never be re-selected, with no exclusion
    machinery in the loop. (A full re-scan — load-resume in core.py — still
    masks the recorded history explicitly.) On exact fp ties (the acosh clamp
    floor) the tracked partner may differ from a full re-scan's lowest-index
    tie-break; the tracked *distance* is identical.
    """
    new_idx = state.vocab_size
    emb, lengths = midpoint_insert(state.emb, state.lengths, i, j, new_idx,
                                   state.curvature)
    merges = state.merges.at[state.num_merges].set(
        jnp.stack([i, j]).astype(jnp.int32))
    merge_dists = state.merge_dists.at[state.num_merges].set(d)
    num_merges = state.num_merges + 1
    vocab_size = state.vocab_size + 1
    max_v = emb.shape[0]

    x_new = jax.lax.dynamic_index_in_dim(emb, new_idx, axis=0, keepdims=True)
    d_new = L.pairwise_dist(emb, x_new, state.curvature)[:, 0]  # (max_V,)
    ids = jax.lax.broadcasted_iota(jnp.int32, (max_v, 1), 0)[:, 0]
    d_new = jnp.where(ids < new_idx, d_new, INF)
    if max_token_len > 0:
        # Structural length gate: rows that could not legally merge with the
        # new token never point at it (MergeConfig.max_token_len).
        new_len = jax.lax.dynamic_index_in_dim(lengths, new_idx, axis=0,
                                               keepdims=False)
        d_new = jnp.where(lengths + new_len <= max_token_len, d_new, INF)

    # Invalidate row i iff its tracked best was just consumed; the fold below
    # then claims it with (d(i, m), new_idx), the new true minimum.
    tracked = state.best_j[i] == j
    best_dist = state.best_dist.at[i].set(
        jnp.where(tracked, INF, state.best_dist[i]))
    improved = d_new < best_dist
    best_dist = jnp.where(improved, d_new, best_dist)
    best_j = jnp.where(improved, new_idx.astype(jnp.int32), state.best_j)

    return state.replace(
        emb=emb, lengths=lengths, best_dist=best_dist, best_j=best_j,
        merges=merges, merge_dists=merge_dists, vocab_size=vocab_size,
        num_merges=num_merges, empty_rounds=jnp.asarray(0, jnp.int32),
    )


def _no_candidate(state: MergeState, config: MergeConfig) -> MergeState:
    """Adaptive-threshold escape hatch (fast_hyperbolic_merge.py:529-541)."""
    empty = state.empty_rounds + 1
    if config.adaptive_threshold:
        grow = empty >= config.empty_growth_after
        threshold = jnp.minimum(
            jnp.where(grow, state.threshold * config.empty_growth,
                      state.threshold), THRESHOLD_CAP)
        empty = jnp.where(grow, 0, empty)
        return state.replace(threshold=threshold, empty_rounds=empty)
    stopped = empty >= config.empty_stop_after
    return state.replace(empty_rounds=empty, stopped=stopped)


def merge_step(state: MergeState, config: MergeConfig) -> MergeState:
    """One optimisation step: merge the best candidate, or adapt the threshold."""
    best = jnp.min(state.best_dist)
    has_candidate = (best < state.threshold) & (state.vocab_size < config.max_vocab_size)

    state = jax.lax.cond(
        has_candidate,
        lambda s: _do_merge(s, config),
        lambda s: _no_candidate(s, config),
        state,
    )
    step = state.step + 1
    # Periodic threshold growth (fast_hyperbolic_merge.py:572-576).
    if config.adaptive_threshold and config.threshold_growth_every > 0:
        grow = (step % config.threshold_growth_every) == 0
        threshold = jnp.minimum(
            jnp.where(grow, state.threshold * config.threshold_growth,
                      state.threshold), THRESHOLD_CAP)
    else:
        threshold = state.threshold
    full = state.vocab_size >= config.max_vocab_size
    return state.replace(step=step, threshold=threshold,
                         stopped=state.stopped | full)


def merge_batch(state: MergeState, ii: jax.Array, jj: jax.Array,
                dd: jax.Array, valid: jax.Array,
                max_token_len: int = 0) -> MergeState:
    """Merge up to B candidate pairs in one vectorised step.

    All midpoints are computed from the pre-batch embeddings (merges never
    modify existing rows, so this equals sequential insertion of the same
    pairs). Candidate-structure maintenance is one batched (max_V, B) column
    fold after invalidating rows whose tracked best was consumed — the
    structural-exclusion invariant of ``merge_pair`` (see its docstring)
    makes any row re-scan or history masking unnecessary. Semantics parity:
    the reference consumes up to 100 cached candidates per search round
    without re-scoring (fast_hyperbolic_merge.py:263-265, 63-133).
    """
    max_v = state.emb.shape[0]
    b = ii.shape[0]
    c = state.curvature

    # Cap by remaining capacity, preserving order (earlier = higher priority).
    capacity = jnp.maximum(config_capacity(state), 0)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    valid = valid & (rank < capacity)
    rank = jnp.where(valid, rank, 0)
    nb = jnp.sum(valid.astype(jnp.int32))
    slot = jnp.where(valid, state.vocab_size + rank, max_v)  # max_v = dropped

    xi = state.emb[ii]
    xj = state.emb[jj]
    len_i = state.lengths[ii]
    len_j = state.lengths[jj]
    w_j = len_j.astype(jnp.float32) / jnp.maximum(
        len_i + len_j, 1).astype(jnp.float32)
    x_new = L.project_to_hyperboloid(L.geodesic_point(xi, xj, w_j, c), c)

    emb = state.emb.at[slot].set(x_new, mode="drop")
    lengths = state.lengths.at[slot].set(len_i + len_j, mode="drop")
    hist_slot = jnp.where(valid, state.num_merges + rank, max_v)
    merges = state.merges.at[hist_slot].set(
        jnp.stack([ii, jj], axis=-1).astype(jnp.int32), mode="drop")
    merge_dists = state.merge_dists.at[hist_slot].set(dd, mode="drop")
    num_merges = state.num_merges + nb
    vocab_size = state.vocab_size + nb

    # Invalidate rows whose tracked best was consumed by this batch. At most
    # one applied pair per row can match the pre-batch ``best_j`` (it is a
    # single value), so batched invalidation equals sequential processing.
    ids = jax.lax.broadcasted_iota(jnp.int32, (max_v, 1), 0)[:, 0]
    inval = jnp.any((ii[None, :] == ids[:, None])
                    & (jj[None, :] == state.best_j[:, None])
                    & valid[None, :], axis=1)
    best_dist0 = jnp.where(inval, INF, state.best_dist)

    # Column fold: candidates (r, slot_k) for r < slot_k (includes pairs
    # between the new tokens themselves, since emb is already updated). An
    # invalidated row a always regains a finite best here: its own midpoint
    # column satisfies d(a, m) = w * d(a, b) <= d(a, q) for all unconsumed q
    # (structural-exclusion invariant, see merge_pair).
    g = L.pairwise_dist(emb, x_new, c)                     # (max_V, B)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (max_v, b), 0)
    ok = valid[None, :] & (row_ids < slot[None, :]) & (row_ids < vocab_size)
    if max_token_len > 0:
        # Structural length gate (see MergeConfig.max_token_len).
        ok &= lengths[:, None] + (len_i + len_j)[None, :] <= max_token_len
    g = jnp.where(ok, g, INF)
    col_min = jnp.min(g, axis=1)
    col_arg = slot[jnp.argmin(g, axis=1)].astype(jnp.int32)
    improved = col_min < best_dist0
    bd = jnp.where(improved, col_min, best_dist0)
    bj = jnp.where(improved, col_arg, state.best_j)

    return state.replace(
        emb=emb, lengths=lengths, best_dist=bd, best_j=bj, merges=merges,
        merge_dists=merge_dists, vocab_size=vocab_size, num_merges=num_merges,
        empty_rounds=jnp.asarray(0, jnp.int32),
    )


def config_capacity(state: MergeState) -> jax.Array:
    """Remaining vocab slots."""
    return state.emb.shape[0] - state.vocab_size


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("state",))
def _run_merges_xla(state: MergeState, config: MergeConfig,
                    n_steps) -> MergeState:
    """Run up to ``n_steps`` merge steps in one compiled while-loop
    (``n_steps`` traced: one executable for every chunk size)."""
    start = state.step

    def cond(s):
        return (~s.stopped) & (s.step - start < n_steps)

    def body(s):
        return merge_step(s, config)

    return jax.lax.while_loop(cond, body, state)


def run_merges(state: MergeState, config: MergeConfig, n_steps: int) -> MergeState:
    """Run up to ``n_steps`` merge steps in one device dispatch.

    Backend dispatch: on TPU the whole chunk runs as ONE Pallas kernel launch
    (ops/pallas/merge_loop.py — per-step cost is the O(V d) HBM pass, and
    kernel-launch latency amortises across the chunk: ~25k steps/s at V=50k
    d=100 vs ~13.6k for the while-loop path on a quiet chip, and ~10x better
    when the chip is contended). Elsewhere (or when shapes don't satisfy the
    kernel's 128-alignment), the jitted ``lax.while_loop``. Merge sequences
    agree except on exact fp ties at the acosh clamp floor (see the kernel's
    module docstring).
    """
    use_pallas = config.use_pallas
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        from hyptokenizer_tpu.ops.pallas import merge_loop
        if merge_loop.supports(state):
            return merge_loop.run_merges_chunk(state, config, n_steps)
    return _run_merges_xla(state, config, n_steps)
