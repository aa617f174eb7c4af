"""Analysis & plotting over experiment artifacts.

Capability parity with ``notebooks/analysis.py:391-685``: distortion-vs-vocab
curves, metric bar charts, embedding projection (PCA of the tangent-space
chart — the reference uses UMAP, unavailable here; PCA is the deterministic
stand-in), and pairwise relative-difference comparisons.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np

from hyptokenizer_tpu.cli._common import setup_logging


def _load_json(path):
    with open(path) as f:
        return json.load(f)


def plot_training_curves(stats: List[Dict], out_path: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    # Per-step records only (artifacts from older runs appended a summary
    # dict without a 'step' key to training_stats).
    stats = [s for s in stats if "step" in s]
    steps = [s["step"] for s in stats]
    axes[0].plot(steps, [s["vocab_size"] for s in stats])
    axes[0].set_title("vocab size")
    axes[1].plot(steps, [s["threshold"] for s in stats])
    axes[1].set_yscale("log")
    axes[1].set_title("merge threshold")
    axes[2].plot(steps, [s.get("steps_per_sec", 0) for s in stats])
    axes[2].set_title("merge steps/sec")
    for ax in axes:
        ax.set_xlabel("step")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def plot_embedding_projection(emb: np.ndarray, out_path: str,
                              max_points: int = 2000):
    """2-D PCA of the tangent chart at the origin."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from hyptokenizer_tpu.models.nlp import export_euclidean_embeddings
    eu = export_euclidean_embeddings(emb)[:max_points]
    eu = eu - eu.mean(0)
    _, _, vt = np.linalg.svd(eu, full_matrices=False)
    xy = eu @ vt[:2].T
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(xy[:, 0], xy[:, 1], s=3, alpha=0.5,
               c=np.arange(len(xy)), cmap="viridis")
    ax.set_title("token embeddings (tangent-chart PCA; color = merge order)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def relative_differences(results: Dict[str, float]) -> Dict[str, Dict[str, float]]:
    """Pairwise relative differences (analysis.py:500-606 'statistical tests')."""
    out = {}
    names = list(results)
    for a in names:
        for b in names:
            if a < b:
                va, vb = results[a], results[b]
                denom = max(abs(va), abs(vb), 1e-12)
                out[f"{a}_vs_{b}"] = {
                    "a": va, "b": vb,
                    "relative_difference": (va - vb) / denom,
                }
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tokenizer-dir", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--comparison-json", type=str, default=None,
                   help="output of cli.compare_tokenizers for relative-diff "
                        "analysis")
    args = p.parse_args(argv)
    setup_logging()
    os.makedirs(args.output_dir, exist_ok=True)

    stats_path = os.path.join(args.tokenizer_dir, "training_stats.json")
    if os.path.exists(stats_path):
        stats = _load_json(stats_path)
        if stats:
            plot_training_curves(
                stats, os.path.join(args.output_dir, "training_curves.png"))
            print("wrote training_curves.png")

    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
    tok = HyperbolicTokenizer.load(args.tokenizer_dir)
    plot_embedding_projection(
        tok.embeddings, os.path.join(args.output_dir, "embedding_pca.png"))
    print("wrote embedding_pca.png")

    if args.comparison_json:
        comp = _load_json(args.comparison_json)
        tps = {name: r["throughput"]["tokens_per_sec"]
               for name, r in comp.items()}
        rel = relative_differences(tps)
        with open(os.path.join(args.output_dir,
                               "relative_differences.json"), "w") as f:
            json.dump(rel, f, indent=2)
        print("wrote relative_differences.json")


if __name__ == "__main__":
    main()
