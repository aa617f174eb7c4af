"""Hierarchy-supervision hop-cap sweep (VERDICT r4 #6: push the supervised
score with the headroom known).

The mapping ceiling measured 0.996 (tools/hierarchy_ceiling.py) — the 0.351
published score was at 35% of ceiling, NOT near it. The eval protocol's
sampled pairs have graph distances 7-16 hops (median 12), while the round-4
recipe's ordinal polish only supervised <=10-hop pairs. This sweep loads the
UNSUPERVISED flagship artifact once and applies supervision variants,
scoring each on the exact 5k-pair protocol.

Usage: python tools/hs_sweep.py work_r5/flagship50k_unsup \
           /root/reference/data/processed/wordnet_graph.pkl \
           results_r5/hs_sweep.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    tok_dir = sys.argv[1]
    graph_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "results_r5/hs_sweep.json"

    import jax.numpy as jnp
    from scipy import stats as sps

    from hyptokenizer_tpu.cli.train_graph_embeddings import supervise_embeddings
    from hyptokenizer_tpu.evals import create_node_mapping, load_wordnet_graph
    from hyptokenizer_tpu.evals.hierarchy import sample_connected_pairs
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import EnhancedHyperbolicTokenizer

    tok = EnhancedHyperbolicTokenizer.load(tok_dir)
    graph = load_wordnet_graph(graph_path)
    mapping = create_node_mapping(graph, tok.vocab)
    pairs = sample_connected_pairs(graph, list(mapping.keys()), 5000, 42)
    graph_d = np.asarray([d for _, _, d in pairs], np.float64)
    ii = np.asarray([mapping[a] for a, _, _ in pairs])
    jj = np.asarray([mapping[b] for _, b, _ in pairs])
    c = float(tok.state.curvature)
    base_emb = np.asarray(tok.embeddings).copy()

    def score(emb):
        emb_d = np.asarray(L.distance(jnp.asarray(emb[ii]),
                                      jnp.asarray(emb[jj]), c))
        return float(sps.spearmanr(emb_d, graph_d).statistic)

    if len(sys.argv) > 4:  # optional variants JSON file, round-2 probes
        with open(sys.argv[4]) as f:
            variants = json.load(f)
    else:
        variants = [
            dict(name="r4-recipe (6,10)", hop_rank=6, hop_ord=10),
            dict(name="ord16", hop_rank=6, hop_ord=16),
            dict(name="ord16-long", hop_rank=6, hop_ord=16,
                 ordinal_steps=32_000),
            dict(name="rank8-ord20", hop_rank=8, hop_ord=20),
        ]
    results = {"baseline_unsupervised": score(base_emb)}
    print(f"unsupervised: {results['baseline_unsupervised']:.4f}", flush=True)
    for v in variants:
        name = v.pop("name")
        t0 = time.time()
        # Restore the pristine unsupervised embeddings before each variant.
        vs = int(tok.state.vocab_size)
        tok.state = tok.state.replace(
            emb=tok.state.emb.at[:vs].set(jnp.asarray(base_emb)))
        emb_out = supervise_embeddings(tok, graph_path=graph_path, **v)
        s = score(emb_out)
        results[name] = {"spearman": s, "params": v,
                         "seconds": round(time.time() - t0, 1)}
        print(f"{name}: spearman={s:.4f} ({results[name]['seconds']}s)",
              flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
