"""The whole strict-greedy merge loop as ONE Pallas kernel launch.

Motivation (BASELINE.md): this environment time-shares the TPU at kernel
granularity, so the XLA ``lax.while_loop`` step — a dozen small kernels —
pays per-launch latency every merge (4.7 us/iter in quiet periods, ~300 us
when the chip is contended). This kernel runs an entire chunk of merge steps
inside a single ``pallas_call``: the only per-step costs are one streamed
pass over the embedding buffer (the O(V d) HBM roofline of the algorithm)
and VMEM-resident scalar work. Contended-chip launches amortise across the
chunk.

Semantics: exactly ``state.merge_step`` (structural-exclusion candidate
maintenance — see ``state.merge_pair``): per grid step,

  argmin over best_dist -> threshold test ->
    merge: tangent-midpoint insert (reference hyperbolic_merge.py:309-355
           formulas via ops/lorentz constants), bookkeeping, invalidate the
           winning row, fold the new token's column into every row's best
    else:  adaptive-threshold escape hatch (fast_hyperbolic_merge.py:529-541)
  step += 1; periodic threshold growth (fast_…py:572-576).

Layout: the embedding stays row-major ``(max_V, 128)`` in HBM (padded
feature dim; ``input_output_aliases`` makes updates in-place) and is streamed
in double-buffered tiles. All per-token state lives VMEM-resident across the
grid as ``(max_V/128, 128)`` arrays (flat id = row*128 + lane). The fold
computes Minkowski grams as a lane-axis reduction over a
``(G, 128, 128)``-reshaped tile — output lands lane-major, aligned with the
state layout, so no transposes or relayouts appear anywhere.

Numerics note: gram reductions here are lane-tree reductions; the XLA path
uses MXU matmul reductions. Values agree to float32 reduction-order noise
(identical formulas and clamp constants), so merge *sequences* can differ
from the XLA path only at exact-tie boundaries (the acosh clamp floor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyptokenizer_tpu.ops.lorentz import ACOSH_EPS, EPS_NORM, EXP_ZERO_TOL

INF = jnp.inf
IMAX = 2**31 - 1  # python int: jnp scalars would be captured as constants
LANES = 128


def _acosh(x):
    """acosh via log(x + sqrt(x^2-1)) — Mosaic has no acosh primitive.

    Inputs are pre-clamped to >= 1 + ACOSH_EPS, so the sqrt argument is
    positive. Matches jnp.arccosh to fp32 rounding (differences are confined
    to the clamp floor, where merge order is tie-arbitrary anyway).
    """
    return jnp.log(x + jnp.sqrt(x * x - 1.0))


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)


def _get(ref, idx):
    """Scalar read of flat element ``idx`` from an (N8, 128) ref."""
    row = ref[pl.ds(idx // LANES, 1), :]
    return jnp.sum(jnp.where(_lane_iota() == idx % LANES, row,
                             jnp.zeros_like(row)))


def _set(ref, idx, val):
    """Scalar write of flat element ``idx`` into an (N8, 128) ref."""
    r = idx // LANES
    row = ref[pl.ds(r, 1), :]
    ref[pl.ds(r, 1), :] = jnp.where(_lane_iota() == idx % LANES,
                                    jnp.full_like(row, val), row)


def _kernel(emb_in, bd_in, bj_in, ln_in, hi_in, hj_in, md_in, si_in, sf_in,
            emb, bd, bj, ln, hi, hj, md, si, sf,
            buf, vec, sems,
            *, max_v, d1, n8, g, adaptive, growth_every, growth,
            empty_after, empty_growth, empty_stop, thr_cap):
    del emb_in  # aliased with emb (same HBM buffer)
    s = pl.program_id(0)
    tile = g * LANES
    n_tiles = n8 // g

    @pl.when(s == 0)
    def _():
        bd[:] = bd_in[:]
        bj[:] = bj_in[:]
        ln[:] = ln_in[:]
        hi[:] = hi_in[:]
        hj[:] = hj_in[:]
        md[:] = md_in[:]
        for k in range(8):
            si[k, 0] = si_in[k, 0]
        for k in range(4):
            sf[k, 0] = sf_in[k, 0]

    @pl.when(si[4, 0] == 0)
    def _step():
        vocab = si[0, 0]
        thr = sf[0, 0]
        c = sf[1, 0]
        best = jnp.min(bd[:])
        has = (best < thr) & (vocab < max_v)

        @pl.when(has)
        def _merge():
            nm = si[1, 0]
            row_i = jax.lax.broadcasted_iota(jnp.int32, (n8, LANES), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32, (n8, LANES), 1)
            flat = row_i * LANES + col_i
            i = jnp.min(jnp.where(bd[:] == best, flat, IMAX))
            j = _get(bj, i)
            li = _get(ln, i)
            lj = _get(ln, j)

            cp_i = pltpu.make_async_copy(emb.at[pl.ds(i, 1), :],
                                         vec.at[pl.ds(0, 1), :], sems.at[0])
            cp_j = pltpu.make_async_copy(emb.at[pl.ds(j, 1), :],
                                         vec.at[pl.ds(1, 1), :], sems.at[1])
            cp_i.start()
            cp_j.start()
            cp_i.wait()
            cp_j.wait()
            xi = vec[pl.ds(0, 1), :]                       # (1, 128)
            xj = vec[pl.ds(1, 1), :]

            lane = _lane_iota()
            sig = jnp.where(lane == 0, 1.0,
                            jnp.where(lane < d1, -1.0, 0.0))  # metric+pad mask

            # Weighted geodesic midpoint — ops/lorentz.geodesic_point, the
            # cancellation-free evaluation of exp_map(xi, w * log_map(xi,
            # xj)); see its docstring for the large-distance conditioning.
            m_raw = jnp.sum(sig * xi * xj)
            m_c = jnp.maximum(m_raw, 1.0 + ACOSH_EPS)
            dd = _acosh(m_c)
            w = lj.astype(jnp.float32) / (li + lj).astype(jnp.float32)
            a_ = (1.0 - w) * dd
            b_ = w * dd
            num_x = jnp.exp(-b_) * (1.0 - jnp.exp(-2.0 * a_))
            num_y = jnp.exp(-a_) * (1.0 - jnp.exp(-2.0 * b_))
            den = jnp.maximum(1.0 - jnp.exp(-2.0 * dd), EPS_NORM)
            x_new = (num_x * xi + num_y * xj) / den
            x_new = jnp.where(dd < EXP_ZERO_TOL, xi, x_new)
            # Re-projection: x0 = sqrt(1 + c * ||spatial||^2).
            x0n = jnp.sum(jnp.where(lane == 0, x_new, 0.0))
            sp_sq = jnp.sum(x_new * x_new) - x0n * x0n
            x_new = jnp.where(lane == 0,
                              jnp.sqrt(1.0 + c * sp_sq), x_new)

            vec[pl.ds(2, 1), :] = x_new
            cp_w = pltpu.make_async_copy(vec.at[pl.ds(2, 1), :],
                                         emb.at[pl.ds(vocab, 1), :],
                                         sems.at[2])
            cp_w.start()
            cp_w.wait()

            _set(hi, nm, i)
            _set(hj, nm, j)
            _set(md, nm, best)
            _set(ln, vocab, li + lj)
            _set(bd, i, INF)  # invalidated; the fold below re-claims row i

            # Fold the new column: one double-buffered pass over emb.
            sig_x = sig * x_new                            # (1, 128)
            sig_x3 = sig_x.reshape(1, 1, LANES)
            inv_sqrt_c = 1.0 / jnp.sqrt(c)

            def dma(slot, t):
                return pltpu.make_async_copy(
                    emb.at[pl.ds(t * tile, tile), :],
                    buf.at[slot], sems.at[slot])

            dma(0, 0).start()

            def tile_body(t, _):
                slot = t % 2

                @pl.when(t + 1 < n_tiles)
                def _():
                    dma((t + 1) % 2, t + 1).start()

                dma(slot, t).wait()
                b3 = buf[slot].reshape(g, LANES, LANES)    # (G, tok, d)
                gram = jnp.sum(b3 * sig_x3, axis=-1)       # (G, 128) lane-major
                mc = jnp.maximum(gram, 1.0 + ACOSH_EPS)
                dcol = _acosh(mc) * inv_sqrt_c
                ids = (t * tile
                       + jax.lax.broadcasted_iota(jnp.int32, (g, LANES), 0)
                       * LANES
                       + jax.lax.broadcasted_iota(jnp.int32, (g, LANES), 1))
                dcol = jnp.where(ids < vocab, dcol, INF)
                bds = bd[pl.ds(t * g, g), :]
                imp = dcol < bds
                bd[pl.ds(t * g, g), :] = jnp.where(imp, dcol, bds)
                bjs = bj[pl.ds(t * g, g), :]
                bj[pl.ds(t * g, g), :] = jnp.where(imp, vocab, bjs)
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

            si[0, 0] = vocab + 1
            si[1, 0] = nm + 1
            si[3, 0] = 0  # empty_rounds

        @pl.when(~has)
        def _adapt():
            empty = si[3, 0] + 1
            if adaptive:
                grow = empty >= empty_after
                sf[0, 0] = jnp.minimum(
                    jnp.where(grow, thr * empty_growth, thr), thr_cap)
                si[3, 0] = jnp.where(grow, 0, empty)
            else:
                si[3, 0] = empty
                si[4, 0] = (empty >= empty_stop).astype(jnp.int32)

        step = si[2, 0] + 1
        si[2, 0] = step
        if adaptive and growth_every > 0:
            thr2 = sf[0, 0]
            sf[0, 0] = jnp.minimum(
                jnp.where(step % growth_every == 0, thr2 * growth, thr2),
                thr_cap)
        full = (si[0, 0] >= max_v).astype(jnp.int32)
        si[4, 0] = si[4, 0] | full


def _pick_group(n8: int) -> int:
    for g in range(min(32, n8), 0, -1):
        if n8 % g == 0:
            return g
    return 1


@functools.partial(jax.jit,
                   static_argnames=("config", "n_steps", "interpret"))
def _run_chunk(emb, best_dist, best_j, lengths, merges, merge_dists,
               vocab_size, num_merges, step, empty_rounds, stopped,
               threshold, curvature, config, n_steps, interpret=False):
    max_v, d1 = emb.shape
    assert d1 <= LANES
    # Pad the vocab axis to 128 alignment; ``max_v`` stays the true capacity
    # (stop condition), padded rows are inert (best_dist = INF).
    pad_v = -(-max_v // LANES) * LANES
    pv = pad_v - max_v
    if pv:
        emb = jnp.pad(emb, ((0, pv), (0, 0)))
        best_dist = jnp.pad(best_dist, (0, pv), constant_values=INF)
        best_j = jnp.pad(best_j, (0, pv))
        lengths = jnp.pad(lengths, (0, pv))
        merges = jnp.pad(merges, ((0, pv), (0, 0)), constant_values=-1)
        merge_dists = jnp.pad(merge_dists, (0, pv))
    n8 = pad_v // LANES
    g = _pick_group(n8)

    emb_p = jnp.pad(emb, ((0, 0), (0, LANES - d1)))
    si = jnp.stack([vocab_size, num_merges, step, empty_rounds,
                    stopped.astype(jnp.int32),
                    jnp.zeros_like(vocab_size), jnp.zeros_like(vocab_size),
                    jnp.zeros_like(vocab_size)]).reshape(8, 1)
    sf = jnp.stack([threshold, curvature,
                    jnp.zeros_like(threshold),
                    jnp.zeros_like(threshold)]).reshape(4, 1)

    n2 = (n8, LANES)
    kern = functools.partial(
        _kernel, max_v=max_v, d1=d1, n8=n8, g=g,
        adaptive=config.adaptive_threshold,
        growth_every=config.threshold_growth_every,
        growth=config.threshold_growth,
        empty_after=config.empty_growth_after,
        empty_growth=config.empty_growth,
        empty_stop=config.empty_stop_after,
        thr_cap=1e6)

    vmem2 = lambda: pl.BlockSpec(n2, lambda s: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # emb (HBM)
            vmem2(), vmem2(), vmem2(), vmem2(), vmem2(), vmem2(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vmem2(), vmem2(), vmem2(), vmem2(), vmem2(), vmem2(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_v, LANES), jnp.float32),
            jax.ShapeDtypeStruct(n2, jnp.float32),
            jax.ShapeDtypeStruct(n2, jnp.int32),
            jax.ShapeDtypeStruct(n2, jnp.int32),
            jax.ShapeDtypeStruct(n2, jnp.int32),
            jax.ShapeDtypeStruct(n2, jnp.int32),
            jax.ShapeDtypeStruct(n2, jnp.float32),
            jax.ShapeDtypeStruct((8, 1), jnp.int32),
            jax.ShapeDtypeStruct((4, 1), jnp.float32),
        ],
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((2, g * LANES, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(emb_p,
      best_dist.reshape(n2), best_j.reshape(n2), lengths.reshape(n2),
      merges[:, 0].reshape(n2), merges[:, 1].reshape(n2),
      merge_dists.reshape(n2), si, sf)

    (emb_o, bd_o, bj_o, ln_o, hi_o, hj_o, md_o, si_o, sf_o) = out
    return dict(
        emb=emb_o[:max_v, :d1],
        best_dist=bd_o.reshape(pad_v)[:max_v],
        best_j=bj_o.reshape(pad_v)[:max_v],
        lengths=ln_o.reshape(pad_v)[:max_v],
        merges=jnp.stack([hi_o.reshape(pad_v)[:max_v],
                          hj_o.reshape(pad_v)[:max_v]], axis=-1),
        merge_dists=md_o.reshape(pad_v)[:max_v],
        vocab_size=si_o[0, 0], num_merges=si_o[1, 0], step=si_o[2, 0],
        empty_rounds=si_o[3, 0], stopped=si_o[4, 0].astype(jnp.bool_),
        threshold=sf_o[0, 0],
    )


def supports(state) -> bool:
    """Shape preconditions for the fused loop kernel.

    Any vocab size works (the wrapper pads to 128 alignment); only the
    feature dim is bounded by one lane tile.
    """
    return state.emb.shape[1] <= LANES


def run_merges_chunk(state, config, n_steps: int, interpret: bool = False):
    """Run ``n_steps`` strict-greedy merge steps in one kernel launch.

    Same contract as ``state.run_merges`` (the XLA while_loop); see module
    docstring for the numerics caveat on exact ties.
    """
    upd = _run_chunk(
        state.emb, state.best_dist, state.best_j, state.lengths,
        state.merges, state.merge_dists, state.vocab_size, state.num_merges,
        state.step, state.empty_rounds, state.stopped, state.threshold,
        state.curvature, config, n_steps, interpret)
    return state.replace(**upd)
