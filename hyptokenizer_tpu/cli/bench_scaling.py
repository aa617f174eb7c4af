"""Scaling-efficiency benchmark: merge throughput vs mesh size.

Measures merge steps/sec on 1, 2, 4, ... device meshes (BASELINE.md: scaling
efficiency 1 chip -> N). On a single-chip host this exercises the SPMD path
over a forced multi-device CPU mesh (functional check); on a pod slice it
measures real ICI scaling.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    from hyptokenizer_tpu.cli._common import add_multihost_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max-vocab-size", type=int, default=50_176)
    p.add_argument("--n-init", type=int, default=4096)
    p.add_argument("--embedding-dim", type=int, default=100)
    p.add_argument("--steps", type=int, default=4096)
    p.add_argument("--warmup", type=int, default=128)
    p.add_argument("--loop", choices=("base", "enhanced"), default="base",
                   help="which training loop to scale: the distance-only "
                        "merge loop, or the flagship enhanced scored loop "
                        "(whose sharded chunk includes the replicated "
                        "sync_corpus pair-table rebuild — the serialization "
                        "risk VERDICT r2 #5 asks to measure)")
    p.add_argument("--corpus-max-tokens", type=int, default=65_536,
                   help="enhanced loop: corpus slice size")
    add_multihost_args(p)
    args = p.parse_args(argv)

    if args.multihost:
        from hyptokenizer_tpu.parallel.multihost import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator_address,
                             num_processes=args.num_processes,
                             process_id=args.process_id)

    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.parallel import make_mesh, run_merges_sharded
    from hyptokenizer_tpu.parallel.mesh import pad_vocab_for_mesh
    from hyptokenizer_tpu.tokenizer import MergeConfig, init_state

    host = f"host {jax.process_index()}/{jax.process_count()}"
    print(f"{host}: {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    n_dev = jax.device_count()
    if jax.process_count() > 1:
        # Every process must join every collective: only the full global
        # mesh is valid on a multi-host job.
        sizes = [n_dev]
    else:
        sizes = []
        d = 1
        while d <= n_dev:
            sizes.append(d)
            d *= 2

    def bench_base(n):
        max_v = pad_vocab_for_mesh(args.max_vocab_size, n)
        emb0 = L.random_points(jax.random.PRNGKey(0), args.n_init,
                               args.embedding_dim, sigma=0.5)
        config = MergeConfig(max_vocab_size=max_v, search_block=512)
        state = init_state(emb0, jnp.ones((args.n_init,), jnp.int32),
                           curvature=1.0, threshold=5.0, config=config)
        mesh = make_mesh(n_devices=n)
        state = run_merges_sharded(state, config, args.warmup, mesh)
        jax.block_until_ready(state.best_dist)
        t0 = time.perf_counter()
        state = run_merges_sharded(state, config, args.steps, mesh)
        jax.block_until_ready(state.best_dist)
        dt = time.perf_counter() - t0
        return args.steps / dt

    def bench_enhanced(n):
        import bz2
        import os

        from hyptokenizer_tpu.parallel.sharded import run_enhanced_sharded
        from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer
        from hyptokenizer_tpu.tokenizer import normalize as N
        from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig

        corpus_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "data", "wiki_corpus.txt.bz2")
        with bz2.open(corpus_path, "rt", encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f if ln.strip()][:2000]
        chars = sorted({ch for ln in lines for ch in ln})
        vocab = ["<pad>", "<bos>", "<eos>", "<unk>"] + chars
        emb = L.random_points(jax.random.PRNGKey(0), len(vocab),
                              args.embedding_dim, sigma=0.5)
        max_v = pad_vocab_for_mesh(8192, n)
        tok = EnhancedHyperbolicTokenizer(
            vocab, emb, max_vocab_size=max_v, merge_threshold=100.0,
            alpha=0.05, beta=0.9, gamma=0.05, min_pair_freq=1,
            merge_batch=16, use_dense_channel=False,
            corpus_sample=lines, corpus_max_tokens=args.corpus_max_tokens,
            corpus_shards=max(n, 1),
            normalizer=NormalizerConfig(pre_split=N.WORDS_WITH_SPACE),
            merge_policy="priority", seed=0)
        mesh = make_mesh(n_devices=n)
        st = jax.tree.map(jnp.array, tok.enh_state)
        # One warmup chunk (compile + first sync_corpus), then timed chunks.
        st = run_enhanced_sharded(st, tok.enh_config, 64, mesh)
        jax.block_until_ready(st.base.num_merges)
        start = int(st.base.num_merges)
        t0 = time.perf_counter()
        chunks = max(1, args.steps // 256)
        for _ in range(chunks):
            st = run_enhanced_sharded(st, tok.enh_config, 256, mesh)
        jax.block_until_ready(st.base.num_merges)
        dt = time.perf_counter() - t0
        merges = int(st.base.num_merges) - start
        return merges / dt

    bench_one = bench_enhanced if args.loop == "enhanced" else bench_base
    results = {}
    for n in sizes:
        sps = bench_one(n)
        results[n] = sps
        eff = sps / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(f"{host}: loop={args.loop} devices={n}: {sps:.1f} steps/s  "
              f"scaling-efficiency={eff:.2f}")
    print(json.dumps({"process": jax.process_index(),
                      "n_processes": jax.process_count(),
                      "loop": args.loop,
                      "steps_per_sec_by_devices": results}))


if __name__ == "__main__":
    main()
