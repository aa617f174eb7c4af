"""Fused pairwise-Minkowski-distance + per-row min/argmin Pallas kernel.

The centerpiece kernel (SURVEY §7.2): replaces the reference's FAISS/
brute-force candidate search (tokenizer/hyperbolic_merge.py:192-291,
fast_hyperbolic_merge.py:195-377) with a tiled V x V sweep that:

  * computes each (TM, TN) tile of the Minkowski Gram matrix on the MXU
    (one dot_general; the metric signature is pre-folded into the lhs),
  * applies the upper-triangular + active-prefix mask in-register,
  * maintains a running per-row (min, argmin) across column tiles in the
    revisited output block,
  * never writes the distance matrix to HBM (the XLA fallback in
    tokenizer/search.py materialises block x V tiles).

Zero transcendentals inside the loop: ``acosh`` is monotone, so the reduction
runs on the clamped Gram value ``mc = max(<x_i,x_j>_L, 1+eps)``; the distance
is recovered with one O(V) ``acosh`` outside. Tie-breaking matches
``jnp.argmin`` on the clamped distance exactly (lowest column index among
floor-clamped ties), so results are interchangeable with the XLA path.

Merged-pair exclusion is NOT handled here (the scatter is hostile to tiling);
callers use this kernel for history-free passes (initialisation, curvature
re-projection sweeps run through the top-k + fixup path instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyptokenizer_tpu.ops.lorentz import ACOSH_EPS

NEG_SIG_PAD = 0.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(vs_ref, xs_ref, ys_ref, min_ref, arg_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tm = xs_ref.shape[0]
    tn = ys_ref.shape[0]

    # Outputs are whole-array VMEM-resident blocks (index map constant);
    # row tile i owns slice [i, :], accumulated across column tiles j.
    @pl.when(j == 0)
    def _():
        min_ref[i, :] = jnp.full((tm,), jnp.inf, jnp.float32)
        arg_ref[i, :] = jnp.zeros((tm,), jnp.int32)

    # Tiles entirely below the diagonal (max col <= min row) have no valid
    # (j > i) element: skip the matmul + reduction outright — ~half the grid.
    @pl.when(j * tn + (tn - 1) > i * tm)
    def _():
        m = jax.lax.dot_general(
            xs_ref[:], ys_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (TM, TN) Minkowski Gram tile — HIGHEST: a default-precision MXU
        # dot is a single bf16 pass (~2^-9 relative), which erases the
        # resolution of acosh near 1 (short distances); see lorentz.DOT_PREC.
        mc = jnp.maximum(m, 1.0 + ACOSH_EPS)

        vocab_size = vs_ref[0]
        row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        col_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        valid = (col_ids > row_ids) & (col_ids < vocab_size)
        mc = jnp.where(valid, mc, jnp.inf)

        tile_min = jnp.min(mc, axis=1)                       # (TM,)
        tile_arg = (j * tn + jnp.argmin(mc, axis=1)).astype(jnp.int32)

        prev = min_ref[i, :]
        better = tile_min < prev  # strict: earlier (lower) col wins ties
        min_ref[i, :] = jnp.where(better, tile_min, prev)
        arg_ref[i, :] = jnp.where(better, tile_arg, arg_ref[i, :])


@functools.partial(jax.jit,
                   static_argnames=("tile_m", "tile_n", "interpret"))
def pairwise_min_best(emb: jax.Array, vocab_size: jax.Array, c: jax.Array,
                      tile_m: int = 2048, tile_n: int = 4096,
                      interpret: bool = False):
    """Per-row best merge candidate over the upper triangle, fused on TPU.

    Args:
      emb: (max_V, d+1) hyperboloid points (rows past ``vocab_size`` ignored).
      vocab_size: active-prefix length (traced scalar).
      c: curvature (distance scaling only).
    Returns:
      (best_dist, best_j): (max_V,) f32 / i32 — same contract as
      ``tokenizer.search.full_pass_best`` with empty history.
    """
    max_v, d1 = emb.shape
    # Shrink tiles for small buffers so padding stays bounded; the large
    # defaults are tuned for the 50k-vocab workload (v5e: ~6.6 ms full pass,
    # fp32-MXU-bound; small tiles pay ~2 us/grid-step sequencing overhead).
    eff = _round_up(max_v, 256)
    tile_m = min(tile_m, eff)
    tile_n = min(tile_n, eff)
    pad_v = _round_up(max_v, max(tile_m, tile_n))
    pad_d = _round_up(d1, 128)

    signature = jnp.concatenate(
        [jnp.ones((1,), emb.dtype), -jnp.ones((d1 - 1,), emb.dtype)])
    xs = jnp.pad(emb * signature, ((0, pad_v - max_v), (0, pad_d - d1)))
    ys = jnp.pad(emb, ((0, pad_v - max_v), (0, pad_d - d1)))

    n_i = pad_v // tile_m
    n_j = pad_v // tile_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((tile_m, pad_d), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, pad_d), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_i, tile_m), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_i, tile_m), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    best_m, best_j = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_i, tile_m), jnp.float32),
            jax.ShapeDtypeStruct((n_i, tile_m), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # Upper-triangle tiles only (below-diagonal tiles are skipped).
            flops=pad_v * pad_v * pad_d,
            bytes_accessed=(n_j * pad_v * pad_d * 4) + pad_v * pad_d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([vocab_size], jnp.int32), xs, ys)

    best_m = best_m.reshape(-1)[:max_v]
    best_j = best_j.reshape(-1)[:max_v]
    # Recover distances: monotone transform of the reduced Gram values.
    best_dist = jnp.where(
        jnp.isfinite(best_m),
        jnp.arccosh(jnp.maximum(best_m, 1.0 + ACOSH_EPS))
        / jnp.sqrt(jnp.asarray(c, jnp.float32)),
        jnp.inf,
    )
    return best_dist, best_j
