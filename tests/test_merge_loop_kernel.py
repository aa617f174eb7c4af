"""Fused merge-loop Pallas kernel vs the XLA while-loop (interpret mode).

Merge sequences are compared only above the acosh clamp floor (~5e-4): below
it all distances saturate to the same clamped value, ties are ubiquitous, and
the two backends' fp reduction orders legitimately pick different (equally
minimal) pairs — the same caveat as tests/test_tokenizer.py's golden test.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.ops.pallas.merge_loop import run_merges_chunk, supports
from hyptokenizer_tpu.tokenizer.state import (
    MergeConfig, init_state, _run_merges_xla,
)

NOISE = 1e-3


def _fresh(n0=40, d=7, max_v=256, threshold=2.5, sigma=0.6, seed=0,
           **cfg_kw):
    emb0 = L.random_points(jax.random.PRNGKey(seed), n0, d, sigma=sigma)
    config = MergeConfig(max_vocab_size=max_v, search_block=64,
                         use_pallas=False, **cfg_kw)
    st = init_state(emb0, jnp.ones((n0,), jnp.int32), curvature=1.0,
                    threshold=threshold, config=config)
    return st, config


def test_supports():
    st, _ = _fresh()
    assert supports(st)


def test_matches_xla_above_clamp_floor():
    st_a, config = _fresh()
    st_b, _ = _fresh()
    a = _run_merges_xla(st_a, config, 60)
    b = run_merges_chunk(st_b, config, 60, interpret=True)

    assert int(a.num_merges) == int(b.num_merges)
    assert int(a.vocab_size) == int(b.vocab_size)
    assert int(a.step) == int(b.step)
    np.testing.assert_allclose(float(a.threshold), float(b.threshold),
                               rtol=1e-6)

    n = int(a.num_merges)
    da = np.asarray(a.merge_dists[:n])
    db = np.asarray(b.merge_dists[:n])
    # Identical pair sequence while distances are above the tie floor.
    comparable = n
    for k in range(n):
        if da[k] <= NOISE:
            comparable = k
            break
    assert comparable >= 5  # the test has teeth
    ma = np.asarray(a.merges[:comparable])
    mb = np.asarray(b.merges[:comparable])
    np.testing.assert_array_equal(ma, mb)
    # acosh amplifies gram rounding by 1/d near the clamp floor
    # (d = acosh(1+e) ~ sqrt(2e), so a gram ulp delta ~1e-6 moves d by
    # ~1e-6/d): tolerate that, not a flat atol.
    tol = 1e-4 + 4e-6 / np.maximum(da[:comparable], 1e-5)
    assert np.all(np.abs(da[:comparable] - db[:comparable]) <= tol), (
        da[:comparable], db[:comparable])

    # Embeddings of the matching prefix tokens agree (n0 = 40 initial).
    v_cmp = 40 + comparable
    np.testing.assert_allclose(np.asarray(a.emb[:v_cmp]),
                               np.asarray(b.emb[:v_cmp]), atol=1e-4)


def test_chunked_equals_single_run():
    st_a, config = _fresh()
    st_b, _ = _fresh()
    a = run_merges_chunk(st_a, config, 40, interpret=True)
    b = run_merges_chunk(st_b, config, 25, interpret=True)
    b = run_merges_chunk(b, config, 15, interpret=True)
    assert int(a.num_merges) == int(b.num_merges)
    assert int(a.step) == int(b.step)
    np.testing.assert_array_equal(np.asarray(a.merges), np.asarray(b.merges))
    np.testing.assert_allclose(np.asarray(a.best_dist),
                               np.asarray(b.best_dist), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.emb), np.asarray(b.emb),
                               atol=1e-6)


def test_threshold_adaptation_matches():
    # Impossible threshold: only adaptive growth rounds run.
    st_a, config = _fresh(threshold=1e-6)
    st_b, _ = _fresh(threshold=1e-6)
    a = _run_merges_xla(st_a, config, 20)
    b = run_merges_chunk(st_b, config, 20, interpret=True)
    assert int(a.step) == int(b.step) == 20
    assert int(a.num_merges) == int(b.num_merges)
    np.testing.assert_allclose(float(a.threshold), float(b.threshold),
                               rtol=1e-6)
    assert int(a.empty_rounds) == int(b.empty_rounds)


def test_non_adaptive_stops():
    st_a, config = _fresh(threshold=1e-6, adaptive_threshold=False)
    st_b, _ = _fresh(threshold=1e-6, adaptive_threshold=False)
    a = _run_merges_xla(st_a, config, 30)
    b = run_merges_chunk(st_b, config, 30, interpret=True)
    assert bool(a.stopped) and bool(b.stopped)
    assert int(a.step) == int(b.step)
    assert int(a.num_merges) == int(b.num_merges) == 0


def test_unaligned_max_vocab():
    # max_v not a multiple of 128: wrapper pads, cap semantics preserved.
    st_a, config = _fresh(n0=40, max_v=200, threshold=50.0)
    st_b, _ = _fresh(n0=40, max_v=200, threshold=50.0)
    a = _run_merges_xla(st_a, config, 300)
    b = run_merges_chunk(st_b, config, 300, interpret=True)
    assert int(b.vocab_size) == 200
    assert bool(b.stopped)
    assert int(a.num_merges) == int(b.num_merges) == 160


def test_stops_at_max_vocab():
    st, config = _fresh(n0=40, max_v=128, threshold=50.0)
    config = MergeConfig(max_vocab_size=128, search_block=64,
                         use_pallas=False)
    b = run_merges_chunk(st, config, 200, interpret=True)
    assert int(b.vocab_size) == 128
    assert bool(b.stopped)
    assert int(b.num_merges) == 88
