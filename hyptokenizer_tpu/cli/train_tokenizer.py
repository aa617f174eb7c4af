"""Train a standard/fast hyperbolic tokenizer.

CLI parity with ``scripts/train_hyperbolic_tokenizer.py:300-344`` (the
standard/fast distance-only training path), plus working ``--target-vocab-size``.
"""

from __future__ import annotations

import argparse
import json
import os

from hyptokenizer_tpu.cli._common import (
    add_common_tokenizer_args, load_or_build_vocab, maybe_pretrain_embeddings,
    add_multihost_args, maybe_init_multihost, parse_with_config,
    persist_train_config, set_seeds, setup_logging,
    training_observability,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_tokenizer_args(p)
    add_multihost_args(p)
    p.add_argument("--tokenizer-type", choices=["standard", "fast"],
                   default="fast")
    p.add_argument("--adaptive-threshold", action=argparse.BooleanOptionalAction,
                   default=True)
    args, _ = parse_with_config(p, argv)

    setup_logging()
    set_seeds(args.seed)
    mesh = maybe_init_multihost(args)

    from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
    from hyptokenizer_tpu.utils import data

    vocab = load_or_build_vocab(args.vocab_path, args.corpus_path)
    emb = data.initialize_embeddings(len(vocab), args.embedding_dim,
                                     args.curvature, args.init_sigma,
                                     args.seed)
    emb = maybe_pretrain_embeddings(args, vocab, emb)
    tok = HyperbolicTokenizer(
        vocab, emb, curvature=args.curvature,
        merge_threshold=args.merge_threshold,
        max_vocab_size=args.max_vocab_size,
        adaptive_threshold=args.adaptive_threshold,
        mesh=mesh,
    )
    if args.resume and args.checkpoint_dir:
        from hyptokenizer_tpu.utils.checkpoint import restore_checkpoint
        restore_checkpoint(args.checkpoint_dir, tok)
    steps = args.steps
    if args.target_vocab_size is not None:
        steps = min(steps, max(0, args.target_vocab_size - len(vocab)))
    writer, profile_ctx, metrics_cb = training_observability(args)
    done = 0
    chunk_i = 0
    with profile_ctx:
        while done < steps and not bool(tok.state.stopped):
            chunk = min(args.log_every, steps - done)
            tok.optimize_merges(steps=chunk, log_every=chunk)
            metrics_cb(tok.training_stats[-1])
            done += chunk
            chunk_i += 1
            if args.checkpoint_dir and args.checkpoint_every and \
                    chunk_i % args.checkpoint_every == 0:
                from hyptokenizer_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(args.checkpoint_dir, tok)
    import jax
    if jax.process_index() != 0:
        return  # only process 0 writes artifacts on a multi-host job
    tok.save(args.output_dir)
    persist_train_config(args, args.output_dir)
    with open(os.path.join(args.output_dir, "training_stats.json"), "w") as f:
        json.dump(tok.training_stats, f)
    print(f"saved tokenizer with {tok.current_vocab_size} tokens to "
          f"{args.output_dir}")


if __name__ == "__main__":
    main()
