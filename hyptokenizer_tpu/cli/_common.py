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
    enable_compile_cache()


def enable_compile_cache() -> None:
    """Point every CLI at the persistent XLA compile cache.

    The enhanced pipeline's jit compiles dominate cold-start wall time (the
    sync jit alone measured ~460 s on TPU — tools/profile_tpu_chunks.py);
    the persistent cache works through the TPU tunnel (2nd process 0.42 s vs
    1.59 s cold, probed) and makes reruns start in seconds. Keyed by host
    CPU flags: this container live-migrates between hosts and a stale
    XLA:CPU AOT entry SIGSEGVs on a feature-poorer host (tests/conftest.py).
    Opt out with HYP_NO_COMPILE_CACHE=1 (or by pre-setting
    JAX_COMPILATION_CACHE_DIR).
    """
    import os

    if os.environ.get("HYP_NO_COMPILE_CACHE"):
        return
    from hyptokenizer_tpu import _cachetag
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = \
            _cachetag.cache_dir_for_host()
    # Seed shipped TPU executables for the flagship shapes (no-op when
    # absent or already seeded).
    _cachetag.seed_cache(
        os.environ["JAX_COMPILATION_CACHE_DIR"],
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "..", "data", "tpu_compile_cache"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    # Persist small entries too: a sub-second compile can stall ~10s behind
    # a busy dispatch queue on the tunneled transport.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


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
    p.add_argument("--sync-every", type=int, default=None,
                   help="enhanced tokenizers: max merges applied against one "
                        "pair-count snapshot (default: log-every). Fresher "
                        "counts allocate the vocab budget better — "
                        "sync-every 64 improved val tokens/char 0.2485 -> "
                        "0.2404 at 8k vocab on wiki (RESULTS.md) — at the "
                        "cost of more sync dispatches")
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
    p.add_argument("--config", type=str, default=None,
                   help="TrainConfig JSON (path or inline); sets flag "
                        "defaults — explicit flags still win. Persisted as "
                        "train_config.json next to the artifacts")
    p.add_argument("--metrics-path", type=str, default=None,
                   help="append per-chunk metrics as JSONL to this path")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of the training loop to "
                        "this directory (view with TensorBoard/xprof)")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on any NaN produced under jit (sanitizer "
                        "equivalent)")


def parse_with_config(p: argparse.ArgumentParser, argv=None):
    """Parse args with ``--config`` JSON providing flag DEFAULTS.

    Two-pass parse: --config is read first, its fields become parser defaults
    (only for dests the parser actually has), then the full parse runs so
    explicitly-passed flags override the config file.
    Returns (args, config_or_None).
    """
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    ns, _ = pre.parse_known_args(argv)
    cfg = None
    if ns.config:
        import dataclasses
        from hyptokenizer_tpu.utils.config import TrainConfig
        cfg = TrainConfig.from_json(ns.config)
        known = {a.dest for a in p._actions}
        d = dataclasses.asdict(cfg)
        pts = d.pop("phase_transition_steps", None) or {}
        if pts:
            d["phase2_step"] = pts.get(2, 1000)
            d["phase3_step"] = pts.get(3, 6000)
        p.set_defaults(**{k: v for k, v in d.items()
                          if k in known and v is not None})
    return p.parse_args(argv), cfg


def persist_train_config(args, output_dir: str) -> None:
    """Write the effective knob surface as train_config.json (SURVEY §5.6)."""
    import dataclasses
    import os
    from hyptokenizer_tpu.utils.config import TrainConfig
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    eff = {k: v for k, v in vars(args).items() if k in known}
    if hasattr(args, "phase2_step"):
        eff["phase_transition_steps"] = {2: args.phase2_step,
                                         3: args.phase3_step}
    os.makedirs(output_dir, exist_ok=True)
    TrainConfig(**eff).to_json(os.path.join(output_dir, "train_config.json"))


def add_multihost_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed and run the merge loop "
                        "sharded over the global (all-hosts) mesh")
    p.add_argument("--coordinator-address", type=str, default=None,
                   help="host:port of process 0 (auto-detected on TPU pods)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--mesh", action="store_true",
                   help="run sharded over all LOCAL devices (single-host "
                        "SPMD) even without --multihost")


def maybe_init_multihost(args):
    """Initialise jax.distributed per the flags; return the mesh to train on
    (None = unsharded single-device path)."""
    if getattr(args, "multihost", False):
        from hyptokenizer_tpu.parallel.multihost import (
            global_mesh, initialize_multihost)
        initialize_multihost(coordinator_address=args.coordinator_address,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
        return global_mesh()
    if getattr(args, "mesh", False):
        from hyptokenizer_tpu.parallel.mesh import make_mesh
        return make_mesh()
    return None


def training_observability(args):
    """(metrics_writer, profile_ctx, per-chunk callback) from the aux flags."""
    import contextlib
    from hyptokenizer_tpu.utils.metrics import (
        MetricsWriter, enable_nan_checks, profile_trace)
    if getattr(args, "debug_nans", False):
        enable_nan_checks(True)
    writer = MetricsWriter(args.metrics_path) if args.metrics_path else None
    ctx = profile_trace(args.profile) if args.profile else (
        contextlib.nullcontext())
    cb = writer.log if writer else (lambda stat: None)
    return writer, ctx, cb


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
