"""Host-side tokenizer API: the reference's class surface over the device loop.

Capability parity with ``HyperbolicTokenizer`` / ``FastHyperbolicTokenizer``
(tokenizer/hyperbolic_merge.py:96-625, tokenizer/fast_hyperbolic_merge.py:136-576):
same constructor knobs, ``optimize_merges`` / ``tokenize`` / ``encode`` /
``decode`` / ``save`` / ``load`` surface, same on-disk artifact schema — but the
training loop runs as a jitted device state machine (state.py) with exact
incremental candidate search instead of host python + FAISS.

The host owns strings (vocabulary, merge history); the device owns arrays.
After each chunk of device steps the host materialises the new merge indices
and extends the string vocabulary.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import search as search_lib
from hyptokenizer_tpu.tokenizer import state as state_lib
from hyptokenizer_tpu.tokenizer.encode import Encoder
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig

logger = logging.getLogger(__name__)


class HyperbolicTokenizer:
    """Distance-threshold hyperbolic merge tokenizer (TPU-native).

    Mirrors the reference constructor (hyperbolic_merge.py:104-127); ``lr`` and
    ``use_approximate_search`` are accepted for API parity (approximate search
    is unnecessary here — candidate search is exact and faster; see search.py).
    """

    def __init__(
        self,
        vocab: Sequence[str],
        embeddings,
        curvature: float = 1.0,
        merge_threshold: float = 0.1,
        lr: float = 1e-3,
        device=None,
        max_vocab_size: int = 100_000,
        use_approximate_search: bool = True,
        adaptive_threshold: bool = True,
        search_block: int = 512,
        normalizer=None,
        merge_policy: str = "fixpoint",
        mesh=None,
    ):
        if len(vocab) > max_vocab_size:
            raise ValueError("initial vocab larger than max_vocab_size")
        # SPMD mesh (parallel.mesh.make_mesh / multihost.global_mesh): the
        # training loop runs sharded over it; max_vocab_size rounds up so the
        # row axis divides evenly.
        self.mesh = mesh
        if mesh is not None:
            from hyptokenizer_tpu.parallel.mesh import pad_vocab_for_mesh
            max_vocab_size = pad_vocab_for_mesh(int(max_vocab_size),
                                                mesh.devices.size)
        self.normalizer = normalizer  # Optional[NormalizerConfig]; None = raw
        # "fixpoint" = the reference's multi-pass first-match scan (conformance
        # default); "priority" = classic BPE rank order, which reproduces the
        # chunked training trajectory (encode.tokenize_priority_py).
        self.merge_policy = merge_policy
        self.vocab: List[str] = list(vocab)
        self.curvature = float(curvature)
        self.merge_threshold = float(merge_threshold)
        self.lr = float(lr)
        self.max_vocab_size = int(max_vocab_size)
        self.use_approximate_search = bool(use_approximate_search)
        self.merge_history: List[Tuple[str, str, str]] = []
        self.training_stats: List[Dict] = []
        self.training_summary: Optional[Dict] = None
        self._encoder: Optional[Encoder] = None

        # Avoid a device->host pull when embeddings are already on device
        # (~29 s per pull on the remote-tunnel transport; see init_state).
        if isinstance(embeddings, jax.Array):
            emb0 = embeddings.astype(jnp.float32)
        else:
            emb0 = jnp.asarray(np.asarray(embeddings), jnp.float32)
        if emb0.ndim != 2 or emb0.shape[0] != len(vocab):
            raise ValueError(f"embeddings shape {emb0.shape} != (len(vocab), d+1)")
        lengths0 = jnp.asarray([len(t) for t in self.vocab], jnp.int32)

        self.config = state_lib.MergeConfig(
            max_vocab_size=self.max_vocab_size,
            adaptive_threshold=adaptive_threshold,
            search_block=search_block,
            # Subclasses may pre-set _init_candidates=False (corpus-only
            # enhanced mode) BEFORE super().__init__: the dense-candidate
            # arrays are then poisoned instead of computed (state.init_state).
            init_candidates=getattr(self, "_init_candidates", True),
        )
        self.state = state_lib.init_state(
            emb0, lengths0, curvature=self.curvature,
            threshold=self.merge_threshold, config=self.config,
        )

    # ------------------------------------------------------------------ props
    @property
    def current_vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def token2idx(self) -> Dict[str, int]:
        return {t: i for i, t in enumerate(self.vocab)}

    @property
    def embeddings(self) -> np.ndarray:
        """Active embedding rows, host-side (V, d+1)."""
        v = int(self.state.vocab_size)
        return np.asarray(self.state.emb[:v])

    # --------------------------------------------------------------- training
    def _sync_merges_from_device(self) -> int:
        """Pull new merge indices off the device, extend the string vocab."""
        n_dev = int(self.state.num_merges)
        n_host = len(self.merge_history)
        if n_dev == n_host:
            return 0
        # Whole-buffer transfer (400 KB at 50k vocab), sliced host-side: a
        # device-side merges[a:b] slice auto-jits a fresh dynamic_slice per
        # size, and through the tunneled transport a mid-run compile can
        # stall ~10 s behind the dispatch queue (measured; the same op
        # compiles in 0.4 s when the queue is idle).
        pairs = np.asarray(self.state.merges)[n_host:n_dev]
        for a, b in pairs:
            tok_a, tok_b = self.vocab[int(a)], self.vocab[int(b)]
            merged = tok_a + tok_b
            self.vocab.append(merged)
            self.merge_history.append((tok_a, tok_b, merged))
        self._encoder = None  # merge rules changed
        return n_dev - n_host

    # ------------------------------------------------ threshold controller
    _stats_key = 0  # per-instance draw counter for the stats sampler

    def distance_statistics(self, sample_size: int = 1000) -> Dict[str, float]:
        """Sampled pairwise-distance diagnostics (reference surface,
        fast_hyperbolic_merge.py:433-465)."""
        st = self.state
        self._stats_key += 1
        out = np.asarray(state_lib.distance_statistics(
            st.emb, st.vocab_size, st.curvature,
            jax.random.PRNGKey(self._stats_key), sample_size))
        return {"min": float(out[0]), "max": float(out[1]),
                "mean": float(out[2]), "std": float(out[3])}

    def _set_threshold(self, value: float) -> None:
        self.state = self.state.replace(
            threshold=jnp.asarray(value, jnp.float32))
        self.merge_threshold = float(value)

    def _startup_threshold_adjust(self) -> Optional[Dict[str, float]]:
        """Reference startup controller (fast_hyperbolic_merge.py:487-505):
        degenerate geometry drops the threshold to 1e-5; a threshold above the
        sampled max is pulled down to 1.5x the mean distance."""
        stats = self.distance_statistics()
        logger.info("Initial distance statistics: min=%.6f max=%.6f "
                    "mean=%.6f std=%.6f", stats["min"], stats["max"],
                    stats["mean"], stats["std"])
        thr = float(self.state.threshold)
        if stats["max"] < 1e-6:
            logger.warning("Maximum distance is near zero — auto-adjusting "
                           "merge threshold to 1e-05")
            self._set_threshold(1e-5)
        elif thr > stats["max"]:
            new = min(thr, stats["mean"] * 1.5)
            if new != thr:
                logger.info("Adjusted initial merge threshold to %.6f", new)
                self._set_threshold(new)
        return stats

    def optimize_merges(self, steps: int = 10_000, log_every: int = 1000,
                        **_compat) -> None:
        """Run the merge loop (API parity: hyperbolic_merge.py:357-412).

        Extra kwargs (``parallel_eval``, ``sample_ratio``, ``text_sample``,
        ``adaptive_threshold``) are accepted for reference-API compatibility.
        """
        if "adaptive_threshold" in _compat:
            self.config = self.config.replace(
                adaptive_threshold=bool(_compat["adaptive_threshold"]))
        # Once per tokenizer: CLIs call optimize_merges as a chunking loop,
        # and re-running the controller would undo in-loop threshold growth.
        if self.config.adaptive_threshold and \
                not getattr(self, "_threshold_adjusted", False):
            self._threshold_adjusted = True
            self._startup_threshold_adjust()
        done = 0
        while done < steps:
            chunk = min(log_every, steps - done)
            t0 = time.perf_counter()
            if self.mesh is not None:
                from hyptokenizer_tpu.parallel.sharded import run_merges_sharded
                self.state = run_merges_sharded(self.state, self.config,
                                                chunk, self.mesh)
            else:
                self.state = state_lib.run_merges(self.state, self.config,
                                                  chunk)
            new = self._sync_merges_from_device()
            dt = time.perf_counter() - t0
            done += chunk
            dstats = self.distance_statistics()
            stat = {
                "step": int(self.state.step),
                "vocab_size": len(self.vocab),
                "merges": len(self.merge_history),
                "threshold": float(self.state.threshold),
                "steps_per_sec": chunk / dt if dt > 0 else float("inf"),
                "min_dist": dstats["min"],
                "max_dist": dstats["max"],
                "mean_dist": dstats["mean"],
                "std_dist": dstats["std"],
            }
            self.training_stats.append(stat)
            logger.info("step %(step)d: vocab=%(vocab_size)d merges=%(merges)d "
                        "threshold=%(threshold).6f %(steps_per_sec).1f steps/s", stat)
            if bool(self.state.stopped):
                logger.info("No more merge candidates found. Stopping.")
                break
        self.merge_threshold = float(self.state.threshold)

    # -------------------------------------------------------------- inference
    def _get_encoder(self) -> Encoder:
        if self._encoder is None:
            self._encoder = Encoder(self.vocab, self.merge_history,
                                    normalizer=self.normalizer,
                                    merge_policy=self.merge_policy)
        return self._encoder

    def tokenize(self, text: str) -> List[str]:
        return self._get_encoder().tokenize(text)

    def encode(self, text: str) -> List[int]:
        return self._get_encoder().encode(text)

    def encode_batch(self, texts: Sequence[str]) -> List[List[int]]:
        """Batch encode (one threaded native call; see encode.Encoder)."""
        return self._get_encoder().encode_batch(texts)

    def decode(self, ids: Sequence[int]) -> str:
        return self._get_encoder().decode(ids)

    # ----------------------------------------------------------------- persist
    def save(self, path: str) -> None:
        """Write reference-schema artifacts (hyperbolic_merge.py:473-504).

        ``embeddings.pt`` is written when torch is importable (bit-compatible
        with the reference's loader); ``embeddings.npy`` is always written.
        """
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "vocab.json"), "w") as f:
            json.dump(self.vocab, f)
        emb = self.embeddings
        np.save(os.path.join(path, "embeddings.npy"), emb)
        try:
            import torch
            torch.save(torch.from_numpy(emb.copy()), os.path.join(path, "embeddings.pt"))
        except ImportError:
            pass
        with open(os.path.join(path, "merges.json"), "w") as f:
            json.dump([list(m) for m in self.merge_history], f)
        config = {
            "curvature": float(self.state.curvature),
            "merge_threshold": float(self.state.threshold),
            "embedding_dim": emb.shape[1] - 1,
            "max_vocab_size": self.max_vocab_size,
            "use_approximate_search": self.use_approximate_search,
        }
        if self.merge_policy != "fixpoint":
            config["merge_policy"] = self.merge_policy
        if self.normalizer is not None:
            # Framework extension key; the reference's loader reads only the
            # keys it knows (hyperbolic_merge.py:516-529), so artifacts stay
            # loadable there.
            config["normalizer"] = self.normalizer.to_json()
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f)
        with open(os.path.join(path, "training_stats.json"), "w") as f:
            json.dump(self.training_stats, f)
        # Per-step consumers read training_stats.json entry-by-entry, so the
        # end-of-run summary lives in its own artifact.
        if getattr(self, "training_summary", None):
            with open(os.path.join(path, "training_summary.json"), "w") as f:
                json.dump(self.training_summary, f)

    @staticmethod
    def _parse_artifacts(path: str):
        """Read the base artifact set: (vocab, emb, merges, config).

        ``config.json`` may be absent: the reference's ENHANCED save writes
        only ``enhanced_config.json`` (enhanced_…:1248-1262, which carries
        the base keys too); the enhanced loader merges the two. Torch
        embeddings may carry grad (the reference saves the live parameter)
        — detach before converting."""
        with open(os.path.join(path, "vocab.json")) as f:
            vocab = json.load(f)
        npy = os.path.join(path, "embeddings.npy")
        if os.path.exists(npy):
            emb = np.load(npy)
        else:
            import torch
            emb = torch.load(os.path.join(path, "embeddings.pt"),
                             map_location="cpu",
                             weights_only=True).detach().numpy()
        cpath = os.path.join(path, "config.json")
        config = {}
        if os.path.exists(cpath):
            with open(cpath) as f:
                config = json.load(f)
        with open(os.path.join(path, "merges.json")) as f:
            merges = [tuple(m) for m in json.load(f)]
        return vocab, emb, merges, config

    def _restore_loaded_state(self, vocab, emb, merges) -> None:
        """Restore device arrays from parsed artifacts onto a freshly
        constructed tokenizer (built from the initial-vocab prefix)."""
        self.vocab = list(vocab)
        self.merge_history = list(merges)
        v = len(vocab)
        emb_full = jnp.asarray(emb, jnp.float32)
        st = self.state
        st = st.replace(
            emb=st.emb.at[:v].set(emb_full[:v]),
            lengths=st.lengths.at[:v].set(
                jnp.asarray([len(t) for t in vocab], jnp.int32)),
            vocab_size=jnp.asarray(v, jnp.int32),
        )
        # Merge index pairs: replay from strings via first-occurrence index.
        if merges:
            t2i: Dict[str, int] = {}
            for i, t in enumerate(vocab):
                t2i.setdefault(t, i)
            pairs = np.asarray(
                [[t2i[a], t2i[b]] for a, b, _ in merges], np.int32)
            st = st.replace(
                merges=st.merges.at[:len(merges)].set(jnp.asarray(pairs)),
                num_merges=jnp.asarray(len(merges), jnp.int32),
            )
        # Candidate arrays refreshed for potential continued training
        # (length-gated to match the training folds' structural cap).
        bd, bj = search_lib.full_pass_best(
            st.emb, st.vocab_size, st.curvature, st.merges, st.num_merges,
            block=self.config.search_block, lengths=st.lengths,
            max_token_len=self.config.max_token_len)
        self.state = st.replace(best_dist=bd, best_j=bj)

    @classmethod
    def load(cls, path: str, device=None) -> "HyperbolicTokenizer":
        """Load reference-schema artifacts (hyperbolic_merge.py:506-551)."""
        vocab, emb, merges, config = cls._parse_artifacts(path)
        # Reconstruct: the *initial* vocab is the prefix before merged tokens.
        n_init = len(vocab) - len(merges)
        tok = cls(
            vocab=vocab[:n_init],
            embeddings=emb[:n_init],
            curvature=config.get("curvature", 1.0),
            merge_threshold=config.get("merge_threshold", 0.1),
            max_vocab_size=config.get("max_vocab_size", 100_000),
            use_approximate_search=config.get("use_approximate_search", True),
            normalizer=NormalizerConfig.from_json(config.get("normalizer")),
            merge_policy=config.get("merge_policy", "fixpoint"),
        )
        tok._restore_loaded_state(vocab, emb, merges)
        return tok


# Name-parity alias: the reference's "fast" class is behaviourally the same
# loop here (the speed techniques it exists for — HNSW, caching, staleness —
# are subsumed by exact incremental search).
FastHyperbolicTokenizer = HyperbolicTokenizer
