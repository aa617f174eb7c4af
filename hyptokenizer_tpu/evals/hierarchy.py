"""WordNet hierarchy distortion evaluation.

Capability parity with ``scripts/eval_hierarchy.py:49-246``: load the WordNet
graph, map synset names to vocabulary indices, sample connected node pairs,
and compare hyperbolic embedding distance to graph shortest-path distance.

TPU-first reformulation: graph work (sampling, BFS) stays host-side networkx;
all embedding distances are computed in ONE device batch instead of the
reference's per-pair scalar ``.item()`` loop (eval_hierarchy.py:141-152).

Also fixes the reference's version-skew bug: it writes the graph with
``pickle.dump`` but reads with ``nx.read_gpickle`` (removed in networkx >= 3)
— SURVEY §3.5. Here both ends use plain pickle.
"""

from __future__ import annotations

import pickle
import random
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L


def load_wordnet_graph(path: str):
    """Plain-pickle load (builder parity: build_wordnet_graph.py:46-47)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def create_node_mapping(graph, vocab: List[str]) -> Dict[str, int]:
    """synset name 'word.pos.id' -> vocab index (eval_hierarchy.py:65-89).

    Uses a dict for vocab lookup instead of the reference's O(V) list.index
    per node (first-occurrence index semantics preserved).
    """
    first_idx: Dict[str, int] = {}
    for i, tok in enumerate(vocab):
        first_idx.setdefault(tok, i)
    mapping = {}
    for node in graph.nodes():
        word = str(node).split(".")[0]
        if word in first_idx:
            mapping[node] = first_idx[word]
    return mapping


def sample_connected_pairs(graph, valid_nodes: List, num_pairs: int,
                           seed: int = 42,
                           max_attempts_factor: int = 20) -> List[Tuple]:
    """Sample connected node pairs with their shortest-path length."""
    rng = random.Random(seed)
    pairs = []
    attempts = 0
    max_attempts = num_pairs * max_attempts_factor
    import networkx as nx
    while len(pairs) < num_pairs and attempts < max_attempts:
        attempts += 1
        a, b = rng.sample(valid_nodes, 2)
        try:
            d = nx.shortest_path_length(graph, a, b)
        except nx.NetworkXNoPath:
            continue
        pairs.append((a, b, d))
    return pairs


def compute_distortion(graph, embeddings, node_mapping: Dict[str, int],
                       num_pairs: int = 10_000, curvature: float = 1.0,
                       seed: int = 42):
    """(ratios, stats) of hyperbolic distance / graph distance.

    Parity: eval_hierarchy.py:92-172 — but distances are one batched device
    call.
    """
    valid_nodes = list(node_mapping.keys())
    if len(valid_nodes) < 2:
        raise ValueError("fewer than 2 graph nodes map into the vocabulary")
    pairs = sample_connected_pairs(graph, valid_nodes, num_pairs, seed)
    if not pairs:
        raise ValueError("no connected pairs sampled")

    emb = jnp.asarray(np.asarray(embeddings), jnp.float32)
    ii = jnp.asarray([node_mapping[a] for a, _, _ in pairs], jnp.int32)
    jj = jnp.asarray([node_mapping[b] for _, b, _ in pairs], jnp.int32)
    graph_d = np.asarray([d for _, _, d in pairs], np.float64)
    emb_d = np.asarray(L.distance(emb[ii], emb[jj], curvature))

    ratios = emb_d / graph_d
    stats = {
        "mean": float(np.mean(ratios)),
        "median": float(np.median(ratios)),
        "min": float(np.min(ratios)),
        "max": float(np.max(ratios)),
        "std": float(np.std(ratios)),
        "num_pairs": int(len(ratios)),
    }
    # Correlation between graph and embedding distances. The ratio above (the
    # reference's metric) is scale-degenerate: shrinking all embeddings
    # toward the origin drives it to 0 without any hierarchy signal; the
    # rank correlation is scale-free and measures actual alignment.
    if len(ratios) >= 3 and np.std(emb_d) > 0 and np.std(graph_d) > 0:
        from scipy import stats as sps
        stats["pearson_r"] = float(np.corrcoef(graph_d, emb_d)[0, 1])
        stats["spearman_r"] = float(sps.spearmanr(graph_d, emb_d).statistic)
    return ratios, stats


def build_wordnet_graph(output_path: str):
    """Undirected graph over noun-synset hypernym edges, pickled.

    Parity: scripts/build_wordnet_graph.py:19-50. Requires nltk wordnet data
    (raises LookupError with a clear message when absent — zero-egress
    environments can use a pre-built pickle instead).
    """
    import networkx as nx
    from nltk.corpus import wordnet as wn

    g = nx.Graph()
    for synset in wn.all_synsets("n"):
        for hyper in synset.hypernyms():
            g.add_edge(synset.name(), hyper.name())
    with open(output_path, "wb") as f:
        pickle.dump(g, f)
    return g
