"""One process of a 2-process jax.distributed CPU merge-training job.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 per process, so the global
mesh spans 8 virtual devices across a real process boundary (localhost
coordinator over the jax.distributed GRPC transport — the same code path a
TPU pod uses over DCN).

Usage: python _multihost_driver.py <coordinator> <n_proc> <proc_id> <out.json>
Writes the merge sequence (and enhanced merge sequence) as JSON from every
process — the test asserts all processes and the single-process oracle agree.
"""

import json
import sys


def main():
    coordinator, n_proc, proc_id, out_path = sys.argv[1:5]

    import jax

    from hyptokenizer_tpu.parallel.multihost import (
        global_mesh, initialize_multihost)

    if int(n_proc) > 1:
        initialize_multihost(coordinator_address=coordinator,
                             num_processes=int(n_proc),
                             process_id=int(proc_id))
    assert jax.process_count() == int(n_proc), jax.process_count()
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count()

    result = {"process_count": jax.process_count(),
              "devices": jax.device_count()}

    # --- base (distance-only) loop ---
    import jax.numpy as jnp
    import numpy as np
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.parallel.sharded import run_merges_sharded
    from hyptokenizer_tpu.tokenizer import MergeConfig, init_state

    emb0 = L.random_points(jax.random.PRNGKey(0), 96, 8, sigma=0.5)
    config = MergeConfig(max_vocab_size=256, search_block=64,
                         use_pallas=False)
    state = init_state(emb0, jnp.ones((96,), jnp.int32), curvature=1.0,
                       threshold=2.0, config=config)
    state = run_merges_sharded(state, config, 60, mesh)
    n = int(state.num_merges)
    result["merges"] = np.asarray(state.merges[:n]).tolist()

    # --- enhanced (scored) loop over the same mesh ---
    from hyptokenizer_tpu.ops import lorentz as L2
    from hyptokenizer_tpu.parallel.sharded import run_enhanced_sharded
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer

    corpus = ["the cat sat on the mat", "the dog sat on the log",
              "a cat and a dog and a rat"] * 8
    chars = sorted({c for ln in corpus for c in ln})
    vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
    emb = L2.random_points(jax.random.PRNGKey(1), len(vocab), 8, sigma=0.5)
    tok = EnhancedHyperbolicTokenizer(
        vocab, emb, merge_threshold=3.0, max_vocab_size=256,
        corpus_sample=corpus, corpus_max_tokens=1024, merge_batch=4,
        search_block=64, use_hierarchical=False,
        use_adaptive_curvature=False, seed=0, mesh=mesh)
    tok.optimize_merges(steps=24, log_every=12)
    result["enhanced_merges"] = [list(m) for m in tok.merge_history]

    # --- v3 fully-sharded sync across the process boundary ---
    # Corpus-only config + shard-aligned corpus selects the hash-partitioned
    # sync (parallel/sharded._sharded_sync_v3_fn): the all_to_all and the
    # psum/pmax statistics ride the cross-process transport here.
    tok2 = EnhancedHyperbolicTokenizer(
        vocab, emb, merge_threshold=50.0, max_vocab_size=256,
        corpus_sample=corpus, corpus_max_tokens=1024, corpus_shards=8,
        merge_batch=4, search_block=64, use_hierarchical=False,
        use_adaptive_curvature=False, use_compression_aware=False,
        use_dense_channel=False, merge_policy="priority",
        freq_table_size=8192, queue_size=512, seed=0, mesh=mesh)
    tok2.optimize_merges(steps=16, log_every=8)
    result["v3_merges"] = [list(m) for m in tok2.merge_history]

    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"proc {proc_id}: ok ({n} merges, "
          f"{len(result['enhanced_merges'])} enhanced)")


if __name__ == "__main__":
    main()
