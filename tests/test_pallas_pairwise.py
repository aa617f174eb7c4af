"""Pallas pairwise-min kernel vs the XLA fallback (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.ops.pallas.pairwise import pairwise_min_best
from hyptokenizer_tpu.tokenizer import search


def _compare(max_v, n_active, d, tile_m=8, tile_n=128, seed=0):
    emb = jnp.zeros((max_v, d + 1), jnp.float32).at[:n_active].set(
        L.random_points(jax.random.PRNGKey(seed), n_active, d, sigma=0.6))
    vs = jnp.asarray(n_active, jnp.int32)
    c = jnp.asarray(1.0, jnp.float32)
    merges = jnp.full((max_v, 2), -1, jnp.int32)
    bd_ref, bj_ref = search.full_pass_best(emb, vs, c, merges,
                                           jnp.asarray(0, jnp.int32), block=32)
    bd, bj = pairwise_min_best(emb, vs, c, tile_m=tile_m, tile_n=tile_n,
                               interpret=True)
    bd_ref, bj_ref = np.asarray(bd_ref), np.asarray(bj_ref)
    bd, bj = np.asarray(bd), np.asarray(bj)
    np.testing.assert_allclose(bd, bd_ref, atol=1e-5)
    # argmin may differ only on distance ties.
    same = bj == bj_ref
    ties = np.isclose(bd, bd_ref, atol=1e-5)
    assert (same | (ties & np.isfinite(bd))).all() or (same | ~np.isfinite(bd)).all()


def test_kernel_matches_fallback_small():
    _compare(max_v=128, n_active=50, d=7)


def test_kernel_matches_fallback_nondivisible_active():
    _compare(max_v=256, n_active=130, d=15, tile_m=16, tile_n=128)


def test_kernel_matches_fallback_full_buffer():
    _compare(max_v=128, n_active=128, d=31)


def test_kernel_inactive_rows_inf():
    emb = jnp.zeros((128, 8), jnp.float32).at[:40].set(
        L.random_points(jax.random.PRNGKey(1), 40, 7, sigma=0.5))
    bd, _ = pairwise_min_best(emb, jnp.asarray(40, jnp.int32),
                              jnp.asarray(1.0, jnp.float32),
                              tile_m=8, tile_n=128, interpret=True)
    bd = np.asarray(bd)
    assert np.isfinite(bd[:39]).all()
    assert not np.isfinite(bd[39])  # last active row has no j > i
    assert not np.isfinite(bd[40:]).any()


def test_kernel_curvature_scaling():
    emb = jnp.zeros((64, 8), jnp.float32).at[:32].set(
        L.random_points(jax.random.PRNGKey(2), 32, 7, sigma=0.5))
    vs = jnp.asarray(32, jnp.int32)
    bd1, _ = pairwise_min_best(emb, vs, jnp.asarray(1.0, jnp.float32),
                               tile_m=8, tile_n=64, interpret=True)
    bd4, _ = pairwise_min_best(emb, vs, jnp.asarray(4.0, jnp.float32),
                               tile_m=8, tile_n=64, interpret=True)
    np.testing.assert_allclose(np.asarray(bd1[:31]) / 2.0,
                               np.asarray(bd4[:31]), rtol=1e-5)
