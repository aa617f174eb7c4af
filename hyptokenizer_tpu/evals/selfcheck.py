"""On-device kernel self-checks: Pallas vs XLA merge-sequence equivalence.

The Pallas kernels' CI coverage is interpret-mode (tests/); this module is
the REAL-hardware assertion, run by bench.py every round and by
``cli.test_tpu --kernel-check`` on demand (VERDICT r1 #9).

Each kernel's check runs in its own try-scope and the dict ALWAYS carries a
verdict per kernel — "pass", "FAIL", or "error: ..." (VERDICT r2 #3: round 2
lost the base-kernel verdict because the enhanced check raised inside a
shared try-scope in the caller).

Equivalence protocol — lockstep with oracle resync. Exact merge-sequence
equality over a long run is not a property two different f32 execution paths
can guarantee on real hardware: XLA and Mosaic contract at different layouts
(unpadded (…, d+1) vs 128-lane tiles), which differ at the ulp even at
HIGHEST precision (tools/diag_dot_layout.py), and one flipped fp near-tie
changes every merge after it. So the check runs both backends CHUNK by chunk
from the SAME state, compares the chunk's merges, and always continues from
the XLA state (the oracle), so noise cannot cascade:

  * identical chunk          -> clean
  * same merges, new order   -> "reorder" (fp near-tie among the chunk's
                                picks; counted, allowed)
  * different merge sets     -> allowed only if every differing pick's
                                recorded merge distance is within RTOL of the
                                other path's pick at the same position —
                                i.e. a verified distance near-tie; otherwise
                                FAIL (the kernel disagrees with the oracle by
                                more than fp noise).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# fp-tie tolerance, in GRAM space: the selection key is the Minkowski gram
# (distance = acosh(gram)/sqrt(c) is monotone in it), and fp noise between
# the two paths is ~1 ulp of the gram (~1e-6 at gram ~ 1). Comparing
# distances directly would mis-scale near the acosh clamp floor, where a
# 1-ulp gram difference moves d by ~1e-3 (d ~ sqrt(2(gram-1))).
GRAM_ATOL = 1e-5


def _compare_chunks(mk, dk, mx, dx, stats) -> bool:
    """Classify one chunk divergence; update stats; return ok?"""
    if mk.shape == mx.shape and np.array_equal(mk, mx):
        return True
    sk = {tuple(r) for r in mk.tolist()}
    sx = {tuple(r) for r in mx.tolist()}
    if sk == sx:
        stats["reorders"] = stats.get("reorders", 0) + 1
        return True
    # Set difference: verify each position where they differ is a gram tie.
    n = min(len(mk), len(mx))
    for t in range(n):
        if tuple(mk[t]) == tuple(mx[t]):
            continue
        gk, gx = float(np.cosh(dk[t])), float(np.cosh(dx[t]))
        if abs(gk - gx) > GRAM_ATOL * max(1.0, abs(gx)):
            stats["first_bad"] = {
                "pos": t, "kernel": mk[t].tolist(), "xla": mx[t].tolist(),
                "d_kernel": float(dk[t]), "d_xla": float(dx[t]),
                "gram_gap": abs(gk - gx)}
            return False
    if len(mk) != len(mx):
        stats["first_bad"] = {"len_kernel": len(mk), "len_xla": len(mx)}
        return False
    stats["dist_ties"] = stats.get("dist_ties", 0) + 1
    return True


def _check_base_kernel(out: Dict) -> None:
    """Distance-only fused loop (ops/pallas/merge_loop.py) vs XLA while-loop."""
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import MergeConfig, init_state, run_merges

    key = jax.random.PRNGKey(7)
    emb0 = L.random_points(key, 512, 100, sigma=0.5)
    lengths0 = jnp.ones((512,), jnp.int32)
    cfg_k = MergeConfig(max_vocab_size=1024, search_block=256,
                        use_pallas=True)
    cfg_x = MergeConfig(max_vocab_size=1024, search_block=256,
                        use_pallas=False)
    st = init_state(emb0, lengths0, curvature=1.0, threshold=5.0,
                    config=cfg_x)
    stats: Dict = {}
    total = 0
    ok = True
    for _ in range(10):
        n0 = int(st.num_merges)
        # run_merges donates its state: hand each backend its own copy.
        st_k = run_merges(jax.tree.map(jnp.array, st), cfg_k, 25)
        st_x = run_merges(jax.tree.map(jnp.array, st), cfg_x, 25)
        nk, nx = int(st_k.num_merges), int(st_x.num_merges)
        mk = np.asarray(st_k.merges[n0:nk])
        mx = np.asarray(st_x.merges[n0:nx])
        dk = np.asarray(st_k.merge_dists[n0:nk])
        dx = np.asarray(st_x.merge_dists[n0:nx])
        ok = _compare_chunks(mk, dk, mx, dx, stats)
        total = nx
        st = st_x  # oracle resync: fp noise never cascades across chunks
        if not ok or bool(st.stopped):
            break
    out["kernel_selfcheck"] = "pass" if ok else f"FAIL {stats.get('first_bad')}"
    out["kernel_selfcheck_merges"] = total
    if stats.get("reorders") or stats.get("dist_ties"):
        out["kernel_selfcheck_ties"] = (f"reorders={stats.get('reorders', 0)} "
                                        f"dist_ties={stats.get('dist_ties', 0)}")


def _lockstep_enhanced(tok, n_chunks, chunk, out, name) -> None:
    from hyptokenizer_tpu.ops.pallas import enhanced_loop
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    st = jax.tree.map(jnp.array, tok.enh_state)
    stats: Dict = {}
    total = 0
    ok = True
    for _ in range(n_chunks):
        n0 = int(st.base.num_merges)
        st_k = enhanced_loop.run_enhanced_fused(
            jax.tree.map(jnp.array, st), tok.enh_config, chunk,
            segment_grid=64)
        st_x = E._run_enhanced_xla(jax.tree.map(jnp.array, st),
                                   tok.enh_config, chunk)
        nk, nx = int(st_k.base.num_merges), int(st_x.base.num_merges)
        mk = np.asarray(st_k.base.merges[n0:nk])
        mx = np.asarray(st_x.base.merges[n0:nx])
        dk = np.asarray(st_k.base.merge_dists[n0:nk])
        dx = np.asarray(st_x.base.merge_dists[n0:nx])
        ok = _compare_chunks(mk, dk, mx, dx, stats)
        total = nx
        st = st_x
        if not ok or bool(st.base.stopped):
            break
    out[name] = "pass" if ok else f"FAIL {stats.get('first_bad')}"
    out[f"{name}_merges"] = total
    if stats.get("reorders") or stats.get("dist_ties"):
        out[f"{name}_ties"] = (f"reorders={stats.get('reorders', 0)} "
                               f"dist_ties={stats.get('dist_ties', 0)}")


def _check_enhanced_kernel(out: Dict) -> None:
    """Enhanced fused segment kernel (ops/pallas/enhanced_loop.py) vs XLA.

    Raises (caught by the caller) when the kernel fails to COMPILE on the
    device — this is precisely the failure mode interpret-mode tests cannot
    see (round 2's uint32-reduction Mosaic gap).
    """
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer

    corpus = ["the cat sat on the mat", "the dog sat on the log",
              "a cat and a dog and a rat"] * 10
    chars = sorted({c for ln in corpus for c in ln})
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
    emb = L.random_points(jax.random.PRNGKey(1), len(vocab), 16, sigma=0.6)
    tok = EnhancedHyperbolicTokenizer(
        vocab, emb, merge_threshold=5.0, max_vocab_size=256,
        corpus_sample=corpus, corpus_max_tokens=1024, merge_batch=4,
        search_block=64, freq_table_size=1024, queue_size=128, seed=0,
        use_dense_channel=False, use_hierarchical=False,
        use_adaptive_curvature=False, use_compression_aware=False,
        alpha=0.1, beta=0.85, gamma=0.05)
    _lockstep_enhanced(tok, 4, 8, out, "enhanced_kernel_selfcheck")


def _check_enhanced_full_features(out: Dict) -> None:
    """Enhanced fused kernel with EVERY feature flag on (frequency +
    hierarchical morphology + compression + dense channel): exercises the
    pair-table search, the hash compose, and both morphology table lookups —
    the exact constructs that failed Mosaic lowering in round 2."""
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer

    corpus = ["walking dogs walk and walk the walking walk",
              "the walking dog was walking quickly"] * 8
    chars = sorted({c for ln in corpus for c in ln})
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
    emb = L.random_points(jax.random.PRNGKey(3), len(vocab), 16, sigma=0.6)
    tok = EnhancedHyperbolicTokenizer(
        vocab, emb, merge_threshold=5.0, max_vocab_size=256,
        corpus_sample=corpus, corpus_max_tokens=1024, merge_batch=4,
        search_block=64, freq_table_size=1024, queue_size=128, seed=0,
        use_dense_channel=True, use_hierarchical=True,
        use_adaptive_curvature=False, use_compression_aware=True,
        alpha=0.3, beta=0.5, gamma=0.2)
    _lockstep_enhanced(tok, 4, 8, out, "enhanced_full_selfcheck")


def kernel_selfcheck() -> Dict:
    """Run all fused kernels against their XLA paths on the current device.

    Returns a dict with pass/FAIL/error per kernel — a failure in one check
    never discards another's verdict. Skipped off-TPU (the kernels dispatch
    only there).
    """
    if jax.devices()[0].platform != "tpu":
        return {"kernel_selfcheck": "skipped (no TPU)"}
    out: Dict = {}
    for fn in (_check_base_kernel, _check_enhanced_kernel,
               _check_enhanced_full_features):
        try:
            fn(out)
        except Exception as e:  # record, keep going
            name = {"_check_base_kernel": "kernel_selfcheck",
                    "_check_enhanced_kernel": "enhanced_kernel_selfcheck",
                    "_check_enhanced_full_features": "enhanced_full_selfcheck",
                    }[fn.__name__]
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)[:200]
            out[name] = f"error: {msg}"
    return out
