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

    results = {}
    for n in sizes:
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
        sps = args.steps / dt
        results[n] = sps
        eff = sps / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(f"{host}: devices={n}: {sps:.1f} steps/s  "
              f"scaling-efficiency={eff:.2f}")
    print(json.dumps({"process": jax.process_index(),
                      "n_processes": jax.process_count(),
                      "steps_per_sec_by_devices": results}))


if __name__ == "__main__":
    main()
