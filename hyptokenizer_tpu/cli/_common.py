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


def load_or_build_vocab(vocab_path: Optional[str], corpus_path: Optional[str],
                        min_count: int = 5) -> List[str]:
    from hyptokenizer_tpu.utils import data
    if vocab_path:
        return data.load_vocab(vocab_path)
    if not corpus_path:
        raise SystemExit("need --vocab-path or --corpus-path")
    with data.open_text(corpus_path) as f:
        return data.build_initial_vocab(f, min_count=min_count)
