"""Shared CLI plumbing: logging, seeding, vocab/embedding setup."""

from __future__ import annotations

import argparse
import logging
import random
from typing import List, Optional

import numpy as np


def setup_logging(verbose: bool = True) -> None:
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )


def set_seeds(seed: int = 42) -> None:
    """Python/numpy seeding (train_hyperbolic_tokenizer.py:36-48; JAX RNG is
    explicit-key so nothing global to seed there)."""
    random.seed(seed)
    np.random.seed(seed)


def add_common_tokenizer_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--vocab-path", type=str, default=None,
                   help="initial vocab file (one token per line); built from "
                        "the corpus when omitted")
    p.add_argument("--corpus-path", type=str, default=None,
                   help="training corpus text file")
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--embedding-dim", type=int, default=50)
    p.add_argument("--curvature", type=float, default=1.0)
    p.add_argument("--merge-threshold", type=float, default=0.1)
    p.add_argument("--max-vocab-size", type=int, default=100_000)
    p.add_argument("--target-vocab-size", type=int, default=None)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--log-every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--init-sigma", type=float, default=0.01)
    p.add_argument("--embed-steps", type=int, default=0,
                   help="RSGD co-occurrence pretraining steps for the initial "
                        "embeddings (0 = random init, the reference's only "
                        "mode)")
    p.add_argument("--embed-lr", type=float, default=0.3)
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="mid-training checkpoint directory")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="checkpoint every N chunks (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint-dir")


def maybe_pretrain_embeddings(args, vocab, emb):
    """RSGD co-occurrence pretraining when --embed-steps > 0."""
    if not args.embed_steps:
        return emb
    if not args.corpus_path:
        raise SystemExit("--embed-steps requires --corpus-path")
    import jax
    import jax.numpy as jnp
    from hyptokenizer_tpu.tokenizer.embed_train import train_embeddings
    from hyptokenizer_tpu.utils import data
    with data.open_text(args.corpus_path) as f:
        corpus = data.encode_corpus_chars(f, vocab, max_tokens=1 << 21)
    emb2, losses = train_embeddings(
        jnp.asarray(emb), jnp.asarray(corpus), len(vocab),
        jax.random.PRNGKey(args.seed), steps=args.embed_steps,
        lr=args.embed_lr)
    logging.getLogger(__name__).info(
        "embedding pretraining: loss %.4f -> %.4f",
        float(losses[:10].mean()), float(losses[-10:].mean()))
    return emb2


def load_or_build_vocab(vocab_path: Optional[str], corpus_path: Optional[str],
                        min_count: int = 5) -> List[str]:
    from hyptokenizer_tpu.utils import data
    if vocab_path:
        return data.load_vocab(vocab_path)
    if not corpus_path:
        raise SystemExit("need --vocab-path or --corpus-path")
    with data.open_text(corpus_path) as f:
        return data.build_initial_vocab(f, min_count=min_count)
