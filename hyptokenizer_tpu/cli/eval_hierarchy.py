"""Evaluate hierarchy preservation: WordNet graph vs embedding distances.

CLI parity with ``scripts/eval_hierarchy.py:175-246``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from hyptokenizer_tpu.cli._common import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tokenizer-dir", type=str, required=True)
    p.add_argument("--graph-path", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--num-pairs", type=int, default=10_000)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    setup_logging()

    from hyptokenizer_tpu.evals import (
        compute_distortion, create_node_mapping, load_wordnet_graph,
    )
    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer

    tok = HyperbolicTokenizer.load(args.tokenizer_dir)
    graph = load_wordnet_graph(args.graph_path)
    mapping = create_node_mapping(graph, tok.vocab)
    print(f"mapped {len(mapping)}/{graph.number_of_nodes()} nodes")
    ratios, stats = compute_distortion(
        graph, tok.embeddings, mapping, num_pairs=args.num_pairs,
        curvature=float(tok.state.curvature), seed=args.seed)

    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "distortion_ratios.npy"), ratios)
    with open(os.path.join(args.output_dir, "distortion_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
