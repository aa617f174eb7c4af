"""On-device kernel self-checks: Pallas vs XLA merge-sequence equivalence.

The Pallas kernels' CI coverage is interpret-mode (tests/); this module is
the REAL-hardware assertion, run by bench.py every round and by
``cli.test_tpu --kernel-check`` on demand (VERDICT r1 #9).

Each kernel's check runs in its own try-scope and the dict ALWAYS carries a
verdict per kernel — "pass", "FAIL", or "error: ..." (VERDICT r2 #3: round 2
lost the base-kernel verdict because the enhanced check raised inside a
shared try-scope in the caller).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _check_base_kernel(out: Dict) -> None:
    """Distance-only fused loop (ops/pallas/merge_loop.py) vs XLA while-loop."""
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import MergeConfig, init_state, run_merges

    key = jax.random.PRNGKey(7)
    emb0 = L.random_points(key, 512, 100, sigma=0.5)
    lengths0 = jnp.ones((512,), jnp.int32)
    seqs = {}
    for use_pallas in (True, False):
        config = MergeConfig(max_vocab_size=1024, search_block=256,
                             use_pallas=use_pallas)
        st = init_state(emb0, lengths0, curvature=1.0, threshold=5.0,
                        config=config)
        st = run_merges(st, config, 256)
        n = int(st.num_merges)
        seqs[use_pallas] = np.asarray(st.merges[:n]).tolist()
    match = seqs[True] == seqs[False]
    out["kernel_selfcheck"] = "pass" if match else "FAIL"
    out["kernel_selfcheck_merges"] = len(seqs[True])


def _check_enhanced_kernel(out: Dict) -> None:
    """Enhanced fused segment kernel (ops/pallas/enhanced_loop.py) vs XLA.

    Raises (caught by the caller) when the kernel fails to COMPILE on the
    device — this is precisely the failure mode interpret-mode tests cannot
    see (round 2's uint32-reduction Mosaic gap).
    """
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.ops.pallas import enhanced_loop
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

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
    st_k = jax.tree.map(jnp.array, tok.enh_state)
    st_x = jax.tree.map(jnp.array, tok.enh_state)
    st_k = enhanced_loop.run_enhanced_fused(st_k, tok.enh_config, 20,
                                            segment_grid=64)
    st_x = E._run_enhanced_xla(st_x, tok.enh_config, 20)
    nx, nk = int(st_x.base.num_merges), int(st_k.base.num_merges)
    same = nx == nk and np.array_equal(np.asarray(st_x.base.merges[:nx]),
                                       np.asarray(st_k.base.merges[:nk]))
    out["enhanced_kernel_selfcheck"] = "pass" if same else "FAIL"
    out["enhanced_kernel_selfcheck_merges"] = nk


def _check_enhanced_full_features(out: Dict) -> None:
    """Enhanced fused kernel with EVERY feature flag on (frequency +
    hierarchical morphology + compression + dense channel): exercises the
    pair-table search, the hash compose, and both morphology table lookups —
    the exact constructs that failed Mosaic lowering in round 2."""
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.ops.pallas import enhanced_loop
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

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
    st_k = jax.tree.map(jnp.array, tok.enh_state)
    st_x = jax.tree.map(jnp.array, tok.enh_state)
    st_k = enhanced_loop.run_enhanced_fused(st_k, tok.enh_config, 16,
                                            segment_grid=64)
    st_x = E._run_enhanced_xla(st_x, tok.enh_config, 16)
    nx, nk = int(st_x.base.num_merges), int(st_k.base.num_merges)
    same = nx == nk and np.array_equal(np.asarray(st_x.base.merges[:nx]),
                                       np.asarray(st_k.base.merges[:nk]))
    out["enhanced_full_selfcheck"] = "pass" if same else "FAIL"
    out["enhanced_full_selfcheck_merges"] = nk


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
