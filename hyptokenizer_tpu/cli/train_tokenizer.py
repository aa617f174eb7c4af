"""Train a standard/fast hyperbolic tokenizer.

CLI parity with ``scripts/train_hyperbolic_tokenizer.py:300-344`` (the
standard/fast distance-only training path), plus working ``--target-vocab-size``.
"""

from __future__ import annotations

import argparse
import json
import os

from hyptokenizer_tpu.cli._common import (
    add_common_tokenizer_args, load_or_build_vocab, set_seeds, setup_logging,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_tokenizer_args(p)
    p.add_argument("--tokenizer-type", choices=["standard", "fast"],
                   default="fast")
    p.add_argument("--adaptive-threshold", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args(argv)

    setup_logging()
    set_seeds(args.seed)

    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
    from hyptokenizer_tpu.utils import data

    vocab = load_or_build_vocab(args.vocab_path, args.corpus_path)
    emb = data.initialize_embeddings(len(vocab), args.embedding_dim,
                                     args.curvature, args.init_sigma,
                                     args.seed)
    tok = HyperbolicTokenizer(
        vocab, emb, curvature=args.curvature,
        merge_threshold=args.merge_threshold,
        max_vocab_size=args.max_vocab_size,
        adaptive_threshold=args.adaptive_threshold,
    )
    steps = args.steps
    if args.target_vocab_size is not None:
        steps = min(steps, max(0, args.target_vocab_size - len(vocab)))
    tok.optimize_merges(steps=steps, log_every=args.log_every)
    tok.save(args.output_dir)
    with open(os.path.join(args.output_dir, "training_stats.json"), "w") as f:
        json.dump(tok.training_stats, f)
    print(f"saved tokenizer with {tok.current_vocab_size} tokens to "
          f"{args.output_dir}")


if __name__ == "__main__":
    main()
