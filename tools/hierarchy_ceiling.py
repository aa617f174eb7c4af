"""Mapping ceiling of the WordNet hierarchy eval (VERDICT r4 #5).

The eval protocol (evals/hierarchy.py, reference scripts/eval_hierarchy.py
:65-172) maps synsets to vocabulary tokens MANY-TO-ONE: every synset whose
head word matches a token collapses onto that token ('dog.n.01' and
'dog.n.03' both score through the embedding of "dog"). Distinct sampled
synset pairs that collapse onto the same (token_i, token_j) therefore get
ONE embedding distance but different graph distances — no embedding,
however perfect, can rank them apart. The protocol's self-ceiling is the
spearman of the best possible per-token-pair predictor against the sampled
graph distances, computed under the SAME mapping, pair sampling, and seed
as the score it contextualizes ("0.351 is near the eval's ceiling" was a
guess in RESULTS.md until this measures it).

Predictor: a constant per collapsed (unordered) token pair. For spearman —
Pearson on midranks — the optimal constant is the group's mean graph-
distance RANK; the group's mean graph distance is reported as a cross-check
(the two agree to ~1e-3 here).

Usage (CPU; set PALLAS_AXON_POOL_IPS= if a TPU job is live):
    python tools/hierarchy_ceiling.py --tokenizer-dir work_r4/flagship50k_final \
        --graph-path /root/reference/data/processed/wordnet_graph.pkl \
        --num-pairs 5000 --output results_r5/hierarchy_ceiling.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tokenizer-dir", type=str, required=True)
    p.add_argument("--graph-path", type=str, required=True)
    p.add_argument("--num-pairs", type=int, default=5000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str,
                   default="results_r5/hierarchy_ceiling.json")
    args = p.parse_args(argv)

    from scipy import stats as sps

    from hyptokenizer_tpu.evals import create_node_mapping, load_wordnet_graph
    from hyptokenizer_tpu.evals.hierarchy import sample_connected_pairs
    from hyptokenizer_tpu.ops import lorentz as L
    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer

    tok = HyperbolicTokenizer.load(args.tokenizer_dir)
    graph = load_wordnet_graph(args.graph_path)
    mapping = create_node_mapping(graph, tok.vocab)
    pairs = sample_connected_pairs(graph, list(mapping.keys()),
                                   args.num_pairs, args.seed)
    graph_d = np.asarray([d for _, _, d in pairs], np.float64)
    ii = np.asarray([mapping[a] for a, _, _ in pairs])
    jj = np.asarray([mapping[b] for _, b, _ in pairs])

    # Collapsed (unordered) token-pair groups — the resolution limit the
    # mapping imposes on ANY symmetric distance function of the embeddings.
    lo = np.minimum(ii, jj)
    hi = np.maximum(ii, jj)
    group = lo.astype(np.int64) * (int(hi.max()) + 1) + hi
    _, ginv = np.unique(group, return_inverse=True)
    n_groups = int(ginv.max()) + 1

    ranks = sps.rankdata(graph_d)
    gsum_r = np.bincount(ginv, weights=ranks, minlength=n_groups)
    gsum_d = np.bincount(ginv, weights=graph_d, minlength=n_groups)
    gcnt = np.bincount(ginv, minlength=n_groups)
    pred_rank = (gsum_r / gcnt)[ginv]   # optimal for Pearson-on-midranks
    pred_dist = (gsum_d / gcnt)[ginv]   # cross-check predictor

    ceiling = float(sps.spearmanr(pred_rank, graph_d).statistic)
    ceiling_dist = float(sps.spearmanr(pred_dist, graph_d).statistic)

    # The actual embedding score under the identical sample (equals the
    # published eval when tokenizer/seed/num_pairs match).
    emb = np.asarray(tok.embeddings, np.float32)
    import jax.numpy as jnp
    emb_d = np.asarray(L.distance(jnp.asarray(emb[ii]), jnp.asarray(emb[jj]),
                                  float(tok.state.curvature)))
    score = float(sps.spearmanr(emb_d, graph_d).statistic)

    out = {
        "num_pairs": len(pairs),
        "seed": args.seed,
        "mapped_nodes": len(mapping),
        "collapsed_token_pairs": n_groups,
        "duplicate_pair_fraction": float(1.0 - n_groups / len(pairs)),
        "ceiling_spearman": ceiling,
        "ceiling_spearman_meandist_predictor": ceiling_dist,
        "embedding_spearman": score,
        "pct_of_ceiling": float(score / ceiling) if ceiling > 0 else None,
        "tokenizer_dir": args.tokenizer_dir,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
