"""Hierarchy-aware embedding training for a saved tokenizer.

The reference evaluates WordNet-hierarchy preservation of its embeddings
(scripts/eval_hierarchy.py:92-172) but never TRAINS them toward any
hierarchy — they stay at random init, so the measured signal is noise
(VERDICT r2 #7; the reference publishes no number). This CLI closes the
loop: RSGD-train the saved embeddings on hierarchy supervision, then rerun
``cli.eval_hierarchy`` on the updated artifacts.

Two supervision sources (both via tokenizer/embed_train.train_embeddings_pairs):
  * ``--graph-path``: WordNet hypernym-path pairs among vocab-mapped synsets
    (Nickel & Kiela 2017's task) — positive pairs are node pairs within
    ``--max-graph-dist`` hops, weighted 1/(graph distance).
  * ``--merge-tree``: the tokenizer's own merge-tree (child, parent) edges
    with depth weighting — needs no external graph.

Writes ``embeddings.npy``/``embeddings.pt`` into ``--output-dir`` (a full
artifact copy, loadable by every eval CLI and by the reference).
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from hyptokenizer_tpu.cli._common import setup_logging


def graph_pairs(graph, mapping, max_dist: int):
    """(u_id, v_id) pairs for mapped nodes within max_dist hops; w = 1/d."""
    import networkx as nx

    mapped = {n: i for n, i in mapping.items()}
    pairs, weights = [], []
    for src, src_id in mapped.items():
        lengths = nx.single_source_shortest_path_length(
            graph, src, cutoff=max_dist)
        for dst, d in lengths.items():
            if d == 0:
                continue
            dst_id = mapped.get(dst)
            if dst_id is not None and dst_id > src_id:  # dedupe (u, v)/(v, u)
                pairs.append((src_id, dst_id))
                weights.append(1.0 / d)
    return (np.asarray(pairs, np.int32).reshape(-1, 2),
            np.asarray(weights, np.float32))


def supervise_embeddings(tok, graph_path=None, merge_tree=False,
                         seed: int = 0, ranking_steps: int = 27_000,
                         ordinal_steps: int = 32_000, lr: float = 0.3,
                         batch: int = 2048, negatives: int = 10,
                         hop_rank: int = 8, hop_ord: int = 20):
    """Hierarchy supervision recipe, as one call on a live tokenizer.

    WordNet mode: ranking-NLL warm-up over <=hop_rank-hop pairs (global
    structure), then a two-stage ordinal pairwise-order polish over
    <=hop_ord-hop pairs — the loss that optimizes exactly what
    eval_hierarchy's spearman_r measures; the second polish stage doubles
    the batch and cools the lr. Defaults are the round-5 sweep winner
    (results_r5/hs_sweep*.json, rank<=8 / ord<=20 / 32k polish steps):
    spearman 0.054 (random) -> 0.567 at the full 50k vocab on the 5k-pair
    protocol — 57 % of the eval's measured mapping ceiling of 0.996
    (tools/hierarchy_ceiling.py). The round-4 recipe (6/10/16k) measured
    0.362: its 10-hop polish cap left ~75 % of evaluated pairs (graph
    distances 7-16, median 12) outside the supervised range. Merge-tree
    mode: ranking NLL on the tokenizer's own merge tree (no external
    graph). Returns the updated (V, d+1) embedding array (numpy).
    """
    import jax
    import jax.numpy as jnp

    from hyptokenizer_tpu.tokenizer import embed_train as ET

    emb = jnp.asarray(tok.embeddings)
    n_vocab = len(tok.vocab)
    c = float(tok.state.curvature)
    key = jax.random.PRNGKey(seed)

    if graph_path:
        from hyptokenizer_tpu.evals import create_node_mapping, \
            load_wordnet_graph
        graph = load_wordnet_graph(graph_path)
        mapping = create_node_mapping(graph, tok.vocab)
        neg_pool = np.asarray(sorted(set(mapping.values())), np.int32)
        pairs6, w6 = graph_pairs(graph, mapping, hop_rank)
        emb, _ = ET.train_embeddings_pairs(
            emb, jnp.asarray(pairs6), jnp.asarray(w6),
            jnp.asarray(neg_pool), key, steps=ranking_steps, batch=batch,
            negatives=negatives, lr=lr, c=c)
        # Ordinal polish hop cap: the 5k-pair eval protocol samples random
        # connected mapped pairs whose graph distances run 7-16 hops
        # (median 12) — a cap below that range leaves most evaluated pairs
        # unsupervised (round-5 sweep: 10->20 hops lifts 0.362 -> 0.567).
        pairs10, w10 = graph_pairs(graph, mapping, hop_ord)
        targets10 = jnp.asarray(1.0 / w10, jnp.float32)
        emb, _ = ET.train_embeddings_ordinal(
            emb, jnp.asarray(pairs10), targets10,
            jax.random.PRNGKey(seed + 1), steps=ordinal_steps // 2,
            batch=max(batch, 1), lr=lr, c=c)
        emb, _ = ET.train_embeddings_ordinal(
            emb, jnp.asarray(pairs10), targets10,
            jax.random.PRNGKey(seed + 3), steps=ordinal_steps // 2,
            batch=max(2 * batch, 1), lr=2 * lr / 3, c=c)
    if merge_tree:
        n_init = n_vocab - len(tok.merge_history)
        pairs, w = ET.merge_tree_pairs(
            [(tok.token2idx[a], tok.token2idx[b])
             for a, b, _ in tok.merge_history], n_init, n_vocab)
        if pairs.shape[0]:
            emb, _ = ET.train_embeddings_pairs(
                emb, jnp.asarray(pairs), jnp.asarray(w),
                jnp.asarray(np.arange(n_vocab, dtype=np.int32)),
                jax.random.PRNGKey(seed + 2), steps=ranking_steps // 3,
                batch=batch, negatives=negatives, lr=lr, c=c)
    return np.asarray(emb)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tokenizer-dir", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--graph-path", type=str, default=None)
    p.add_argument("--merge-tree", action="store_true",
                   help="supervise on the tokenizer's own merge-tree edges")
    p.add_argument("--max-graph-dist", type=int, default=3)
    p.add_argument("--objective", choices=("ranking", "stress", "ordinal"),
                   default="ranking",
                   help="ranking: NLL vs random negatives (Nickel & Kiela); "
                        "stress: scale-free metric fit of embedding distance "
                        "to graph distance; ordinal: pairwise order "
                        "consistency (optimizes exactly what "
                        "eval_hierarchy's spearman_r measures)")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--negatives", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    setup_logging()
    if not args.graph_path and not args.merge_tree:
        raise SystemExit("need --graph-path and/or --merge-tree")

    import jax
    import jax.numpy as jnp

    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
    from hyptokenizer_tpu.tokenizer import embed_train as ET

    tok = HyperbolicTokenizer.load(args.tokenizer_dir)
    emb = jnp.asarray(tok.embeddings)
    n_vocab = len(tok.vocab)

    all_pairs, all_w = [], []
    neg_pool = None
    if args.graph_path:
        from hyptokenizer_tpu.evals import create_node_mapping, \
            load_wordnet_graph
        graph = load_wordnet_graph(args.graph_path)
        mapping = create_node_mapping(graph, tok.vocab)
        pairs, w = graph_pairs(graph, mapping, args.max_graph_dist)
        graph_w = w
        print(f"graph supervision: {len(mapping)} mapped nodes, "
              f"{pairs.shape[0]} pairs (<= {args.max_graph_dist} hops)")
        all_pairs.append(pairs)
        all_w.append(w)
        # Contrast within the supervised submanifold: negatives from the
        # mapped ids, not the whole vocab.
        neg_pool = np.asarray(sorted(set(mapping.values())), np.int32)
    if args.merge_tree:
        n_init = n_vocab - len(tok.merge_history)
        pairs, w = ET.merge_tree_pairs(
            [(tok.token2idx[a], tok.token2idx[b])
             for a, b, _ in tok.merge_history], n_init, n_vocab)
        print(f"merge-tree supervision: {pairs.shape[0]} edges")
        all_pairs.append(pairs)
        all_w.append(w)
    pairs = np.concatenate(all_pairs)
    weights = np.concatenate(all_w)
    if pairs.shape[0] == 0:
        raise SystemExit("no supervision pairs found")
    if neg_pool is None:
        neg_pool = np.arange(n_vocab, dtype=np.int32)

    if args.objective in ("stress", "ordinal"):
        if not args.graph_path or args.merge_tree:
            raise SystemExit(f"--objective {args.objective} needs "
                             "--graph-path alone (targets are graph "
                             "distances)")
        targets = 1.0 / graph_w  # graph_pairs weights are 1/distance
        train = (ET.train_embeddings_stress if args.objective == "stress"
                 else ET.train_embeddings_ordinal)
        emb_out, losses = train(
            emb, jnp.asarray(pairs), jnp.asarray(targets, jnp.float32),
            jax.random.PRNGKey(args.seed), steps=args.steps,
            batch=max(args.batch, 1), lr=args.lr,
            c=float(tok.state.curvature))
    else:
        emb_out, losses = ET.train_embeddings_pairs(
            emb, jnp.asarray(pairs), jnp.asarray(weights),
            jnp.asarray(neg_pool), jax.random.PRNGKey(args.seed),
            steps=args.steps, batch=args.batch, negatives=args.negatives,
            lr=args.lr, c=float(tok.state.curvature))
    print(f"loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f} "
          f"over {args.steps} steps")

    os.makedirs(args.output_dir, exist_ok=True)
    for name in os.listdir(args.tokenizer_dir):
        src = os.path.join(args.tokenizer_dir, name)
        if os.path.isfile(src) and not name.startswith("embeddings"):
            shutil.copy2(src, os.path.join(args.output_dir, name))
    emb_np = np.asarray(emb_out)
    np.save(os.path.join(args.output_dir, "embeddings.npy"), emb_np)
    try:
        import torch
        torch.save(torch.from_numpy(emb_np.copy()),
                   os.path.join(args.output_dir, "embeddings.pt"))
    except ImportError:
        pass
    print(f"wrote updated embeddings to {args.output_dir}")


if __name__ == "__main__":
    main()
