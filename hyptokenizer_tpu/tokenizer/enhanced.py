"""Host API for the enhanced tokenizer family.

``EnhancedHyperbolicTokenizer`` carries the reference flagship's full
constructor surface (enhanced_fast_hyperbolic_merge.py:78-121) over the scored
device loop (enhanced_state.py). The sibling classes
(FrequencyAware/Hierarchical/AdaptiveCurvature/CompressionAware) are thin
configurations of the same engine — the reference implements them as four
copy-paste variants (SURVEY §2.2 #5-#8); here the feature matrix is function
composition.

Also provides the *intended* API the reference's own enhanced training script
calls but the reference never implemented (SURVEY §2.5):
``register_callback`` and ``optimize_merges(target_vocab_size=...)``.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.tokenizer import enhanced_state as E
from hyptokenizer_tpu.tokenizer import scoring
from hyptokenizer_tpu.tokenizer.core import HyperbolicTokenizer
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig
from hyptokenizer_tpu.tokenizer.state import MergeConfig
from hyptokenizer_tpu.utils import morphology

logger = logging.getLogger(__name__)

DEFAULT_CORPUS_TOKENS = 1 << 21


@jax.jit
def _live_count(corpus):
    """Non-PAD prefix length of a (compacted) corpus buffer."""
    return jnp.sum(corpus != -1)


def _token_features(tokens: Sequence[str]):
    """Host-side (hash, byte length, vowel bit) arrays for a token list."""
    n = len(tokens)
    t_hash = np.zeros((n, 2), np.int32)
    b_len = np.zeros((n,), np.int32)
    vflag = np.zeros((n,), np.bool_)
    for idx, tok in enumerate(tokens):
        h1, h2 = scoring.hash_string(tok)
        t_hash[idx] = (h1, h2)
        b_len[idx] = len(tok.encode("utf-8"))
        vflag[idx] = morphology.has_vowel(tok)
    return t_hash, b_len, vflag


class EnhancedHyperbolicTokenizer(HyperbolicTokenizer):
    """Flagship tokenizer: all scoring features behind flags.

    HNSW/cache parameters (``cache_size``, ``rebuild_frequency``, ``hnsw_*``)
    are accepted for API parity and ignored: candidate search here is exact and
    incremental, so there is no index to cache or rebuild (BASELINE.md).
    """

    def __init__(
        self,
        vocab: Sequence[str],
        embeddings,
        curvature: float = 1.0,
        merge_threshold: float = 0.5,
        lr: float = 1e-3,
        device=None,
        max_vocab_size: int = 100_000,
        use_approximate_search: bool = True,
        cache_size: int = 10_000,
        rebuild_frequency: int = 100,
        hnsw_m: int = 32,
        hnsw_ef_construction: int = 200,
        hnsw_ef_search: int = 100,
        # Feature flags
        use_frequency_aware: bool = True,
        use_hierarchical: bool = True,
        use_adaptive_curvature: bool = True,
        use_compression_aware: bool = True,
        # Frequency-aware parameters
        corpus_path: Optional[str] = None,
        alpha: float = 0.4,
        beta: float = 0.4,
        gamma: float = 0.2,
        # Hierarchical parameters
        language: str = "english",
        # Adaptive curvature parameters
        curvature_lr: float = 0.01,
        hierarchy_weight: float = 1.0,
        distortion_weight: float = 0.1,
        optimize_curvature_freq: int = 100,
        # Compression-aware parameters
        corpus_sample: Optional[List[str]] = None,
        compression_weight: float = 0.7,
        distance_weight: float = 0.3,
        sample_size: int = 100,
        # TPU-build knobs
        pool_k: int = 64,
        corpus_max_tokens: int = DEFAULT_CORPUS_TOKENS,
        search_block: int = 512,
        merge_batch: int = 8,
        min_pair_freq: int = 1,
        use_dense_channel: bool = True,
        max_token_len: int = 512,
        freq_table_size: int = 1 << 17,
        queue_size: int = 4096,
        seed: int = 0,
        normalizer=None,
        merge_policy: str = "fixpoint",
        mesh=None,
        corpus_shards: int = 1,
        corpus_shrink: bool = False,
    ):
        # Corpus-only (bpe) mode never reads the dense-candidate arrays:
        # skip the O(V^2 d) init pass and poison them (state.init_state;
        # VERDICT r3 #7). Decided before super().__init__ builds the state.
        has_corpus = bool(corpus_path or corpus_sample)
        needs_corpus = has_corpus and (use_frequency_aware
                                       or use_compression_aware
                                       or use_hierarchical)
        self._init_candidates = use_dense_channel or not needs_corpus
        # Ctor cost attribution (VERDICT r4 #2: on the tunneled backend the
        # ctor is the dominant end-to-end cost and was unmeasured). Phases:
        # base (super().__init__ incl. any dense-candidate init pass),
        # corpus (host encode + upload dispatch), morph (host corpus
        # analysis), assemble (device buffer build dispatch), flush (the
        # one host fetch that forces all deferred device work + transfers),
        # compile (jit trace+compile seconds attributed to the ctor).
        from hyptokenizer_tpu.utils.metrics import compile_seconds
        _t_ctor0 = time.perf_counter()
        _compile0 = compile_seconds()
        _t0 = _t_ctor0
        super().__init__(
            vocab, embeddings, curvature=curvature,
            merge_threshold=merge_threshold, lr=lr, device=device,
            max_vocab_size=max_vocab_size,
            use_approximate_search=use_approximate_search,
            search_block=search_block,
            normalizer=normalizer,
            merge_policy=merge_policy,
            mesh=mesh,
        )
        self.language = language
        self.corpus_shrink = corpus_shrink
        # Mirror the length cap onto the core config so load-resume's full
        # candidate re-scan applies the same structural gate as training.
        self.config = self.config.replace(max_token_len=max_token_len)
        self.callbacks: List[Callable] = []
        del cache_size, rebuild_frequency, hnsw_m, hnsw_ef_construction
        del hnsw_ef_search, distance_weight, sample_size  # parity-only knobs

        del pool_k  # superseded by the two-channel candidate architecture
        self.enh_config = E.EnhancedConfig(
            base=MergeConfig(max_vocab_size=self.max_vocab_size,
                             search_block=search_block,
                             # Merged-token length cap (the reference's
                             # intended-but-ghost _is_valid_merge; prevents
                             # the dense channel's chain-collapse from
                             # exponentially exploding vocab strings).
                             max_token_len=max_token_len),
            n_init=len(self.vocab),
            has_corpus=bool(corpus_path or corpus_sample),
            merge_batch=merge_batch,
            min_pair_freq=min_pair_freq,
            use_dense_channel=use_dense_channel,
            priority_replay=(merge_policy == "priority"),
            use_frequency=use_frequency_aware,
            alpha=alpha, beta=beta, gamma=gamma,
            use_compression=use_compression_aware,
            compression_weight=compression_weight,
            use_hierarchical=use_hierarchical,
            use_adaptive_curvature=use_adaptive_curvature,
            curvature_freq=optimize_curvature_freq,
            curvature_lr=curvature_lr,
            hierarchy_weight=hierarchy_weight,
            distortion_weight=distortion_weight,
            freq_table_size=freq_table_size,
            # top_k needs k <= table size; batches need at least merge_batch
            # queue slots.
            queue_size=max(min(queue_size, freq_table_size), merge_batch, 1),
        )
        self.current_phase = 1
        _base_s = time.perf_counter() - _t0

        # --- corpus ---
        _t0 = time.perf_counter()
        texts: List[str] = []
        if corpus_path:
            with open(corpus_path, encoding="utf-8") as f:
                texts = [ln.rstrip("\n") for ln in f]
        elif corpus_sample:
            texts = list(corpus_sample)
        self.corpus_sample = texts
        self.corpus_shards = corpus_shards
        corpus_ids = self._encode_initial_corpus(texts, corpus_max_tokens,
                                                 corpus_shards)
        _corpus_s = time.perf_counter() - _t0

        # --- morphology tables ---
        _t0 = time.perf_counter()
        if use_hierarchical and texts:
            self.morphology = morphology.analyze_corpus(texts)
        else:
            self.morphology = morphology.MorphologyTables()
        mk, ms, wk, ws = self.morphology.hash_tables()
        _morph_s = time.perf_counter() - _t0
        _t0 = time.perf_counter()

        # --- device state ---
        # Host computes only the n0 initial-vocab feature rows; EVERYTHING
        # else (padded buffers, constant tables, PRNG key, all scalars)
        # assembles in ONE jitted dispatch — on the tunneled transport each
        # deferred device op pays a round-trip at the ctor's flush fetch,
        # so dispatch count is ctor wall time (BENCH round 5).
        max_v = self.max_vocab_size
        t_hash, b_len, vflag = _token_features(self.vocab)
        t_feat = np.concatenate(
            [t_hash, b_len[:, None], vflag[:, None].astype(np.int32)],
            axis=1).astype(np.int32)
        misc = np.asarray([seed, ms, ws], np.int32)
        (pair_keys, pair_counts, q_i, q_j, q_dist, q_score, coh_samples,
         token_hash, byte_lengths, has_vowel, key, powers, morph_dev,
         word_dev, scal) = E.assemble_enhanced_buffers(
            jnp.asarray(t_feat), jnp.asarray(mk), jnp.asarray(wk),
            jnp.asarray(misc), max_v, self.enh_config.freq_table_size,
            self.enh_config.queue_size, self.enh_config.coherence_samples)

        self.enh_state = E.EnhancedState(
            base=self.state,
            key=key,
            phase=scal["phase"],
            corpus=corpus_ids,
            corpus_synced=scal["corpus_synced"],
            corpus_tokens=scal["corpus_tokens"],
            pair_keys=pair_keys,
            pair_counts=pair_counts,
            max_pair_count=scal["max_pair_count"],
            pair_unique=scal["pair_unique"],
            q_i=q_i,
            q_j=q_j,
            q_dist=q_dist,
            q_score=q_score,
            q_valid_total=scal["q_valid_total"],
            needs_resync=scal["needs_resync"],
            coh_samples=coh_samples,
            token_hash=token_hash,
            byte_lengths=byte_lengths,
            has_vowel=has_vowel,
            hash_powers=powers,
            morph_table=morph_dev,
            morph_size=scal["morph_size"],
            word_table=word_dev,
            word_size=scal["word_size"],
            curv_m=scal["curv_m"],
            curv_v=scal["curv_v"],
            curv_t=scal["curv_t"],
            curv_last=scal["curv_last"],
        )
        if use_hierarchical:
            # Phase-1 threshold applies from the start (enhanced_…:1046-1049).
            self.enh_state = self.enh_state.replace(
                base=self.enh_state.base.replace(
                    threshold=jnp.asarray(
                        self.enh_config.phase_thresholds[0], jnp.float32)))
        _assemble_s = time.perf_counter() - _t0
        # Materialize the ctor's device work NOW: the tunneled TPU backend
        # defers execution until a host fetch and flushes its queue FIFO, so
        # without this pull the whole ctor graph (corpus upload, buffer
        # assembly) would be billed to the first training chunk
        # (BASELINE.md round-4 variance note). One small transfer suffices.
        _t0 = time.perf_counter()
        np.asarray(self.enh_state.token_hash[:1])
        _flush_s = time.perf_counter() - _t0
        self.ctor_stats = {
            "ctor_total_s": round(time.perf_counter() - _t_ctor0, 3),
            "ctor_base_s": round(_base_s, 3),
            "ctor_corpus_s": round(_corpus_s, 3),
            "ctor_morph_s": round(_morph_s, 3),
            "ctor_assemble_s": round(_assemble_s, 3),
            "ctor_flush_s": round(_flush_s, 3),
            "ctor_compile_s": round(compile_seconds() - _compile0, 3),
        }

    # ------------------------------------------------------------------ setup
    def _encode_initial_corpus(self, texts: List[str],
                               corpus_max_tokens: int,
                               corpus_shards: int = 1) -> jax.Array:
        from hyptokenizer_tpu.utils import data
        from hyptokenizer_tpu.tokenizer import normalize as norm_lib
        # SEP between lines: no cross-line pairs (frequency_aware_…:92-112).
        # With a pre-splitting normalizer, SEP also separates segments so
        # training candidates match the encode path's merge boundaries.
        pre_split = None
        if self.normalizer is not None:
            texts = [norm_lib.normalize(t, self.normalizer) for t in texts]
            pre_split = self.normalizer.pre_split
        ids = data.encode_corpus_chars(
            texts, self.vocab, corpus_max_tokens,
            unk_id=self.token2idx.get("<unk>", 3),
            sep_id=int(scoring.SEP_ID), pad_id=int(scoring.PAD_ID),
            pre_split=pre_split)
        if corpus_shards > 1:
            # Align SEP/PAD to every 1/corpus_shards boundary so the
            # multi-chip sync (parallel/sharded.sync_corpus_sharded) can
            # count pairs per corpus shard with no boundary loss.
            ids = data.shard_align_corpus(
                ids, corpus_shards,
                pad_id=int(scoring.PAD_ID), sep_id=int(scoring.SEP_ID))
        # Upload in the narrowest dtype the INITIAL ids fit (merged ids only
        # appear device-side, where the buffer is int32): the tunneled
        # transport's upload bandwidth degrades to <1 MB/s in bad weather,
        # so a char-vocab corpus ships 4x smaller as int8 (PAD/SEP = -1/-2
        # fit). One device-side widening cast; values identical.
        n_vocab = len(self.vocab)
        if n_vocab <= 127:
            narrow = ids.astype(np.int8)
        elif n_vocab <= 32767:
            narrow = ids.astype(np.int16)
        else:
            narrow = ids
        return jnp.asarray(narrow).astype(jnp.int32)

    # ---------------------------------------------------------------- training
    MIN_CORPUS_BUFFER = 1 << 16

    def _maybe_shrink_corpus(self) -> None:
        """Halve the corpus buffer when the live prefix fits (OPT-IN).

        Merges only ever shrink the corpus (replay + compaction leave a PAD
        tail), and every sync cost scales with the static BUFFER size —
        slicing to the next power of two above the live count keeps
        late-training syncs proportional to the live corpus. Semantically a
        no-op (only PAD tail is dropped; merge sequences are bit-identical —
        tested). OFF by default (``corpus_shrink=False``): each new buffer
        size is a fresh jit shape for the sync graph, and on a cold
        compile cache those recompiles land INSIDE training (the round-3
        driver bench lost a 100x window to them — VERDICT r3 #1), while the
        measured full-buffer sync execution is ~0.1 s/chunk at 2.9 M tokens
        (tools/profile_tpu_chunks.py) — the ladder saves little and costs a
        lot. Enable for memory-bound corpora, or with a warm compile cache.
        """
        import jax as _jax
        if not self.corpus_shrink:
            return
        if self.mesh is not None and _jax.process_count() > 1:
            return  # sharded corpus is not host-addressable across processes
        if self.corpus_shards > 1:
            # Shard-aligned corpora keep live tokens at each SHARD's prefix
            # (per-shard compaction), not the global prefix: slicing the
            # buffer would drop later shards' content. Sync cost is already
            # per-shard in this mode.
            return
        corpus = self.enh_state.corpus
        buf = corpus.shape[0]
        if buf <= self.MIN_CORPUS_BUFFER:
            return
        live = int(_live_count(corpus))
        new = max(self.MIN_CORPUS_BUFFER, 1 << max(1, live).bit_length())
        if new <= buf // 2:
            self.enh_state = self.enh_state.replace(corpus=corpus[:new])

    def register_callback(self, fn: Callable[[Dict], None]) -> None:
        """Per-chunk progress callback (the API the reference's enhanced
        training script calls but the reference never implemented —
        SURVEY §2.5)."""
        self.callbacks.append(fn)

    def _sync_merges_from_device(self) -> int:
        self.state = self.enh_state.base
        return super()._sync_merges_from_device()

    def optimize_merges(self, steps: int = 10_000, log_every: int = 1000,
                        target_vocab_size: Optional[int] = None,
                        corpus_sample: Optional[List[str]] = None,
                        adaptive_threshold: bool = True,
                        phase_transition_steps: Optional[Dict[int, int]] = None,
                        sync_every: Optional[int] = None,
                        **_compat) -> None:
        """Train ``steps`` merges.

        ``sync_every`` caps the merges applied against one pair-count
        snapshot (defaults to ``log_every``). Stale in-chunk counts spend
        vocab slots on pairs whose frequency collapsed mid-chunk: on the
        wiki corpus at 8k vocab, val tokens/char improves 0.2485 (2048) ->
        0.2404 (64) -> 0.2388 (16), beating the lossless byte-level BPE
        baseline's 0.2439 (RESULTS.md round-3 rematch). Lower = fresher =
        better vocab allocation; higher = fewer syncs = faster wall-clock.
        """
        if corpus_sample:
            self.corpus_sample = corpus_sample
            if self.enh_config.frozen_freqs or not self.enh_config.has_corpus:
                # Loaded-artifact tokenizer handed a live corpus: re-ground.
                # The fresh char-level buffer replays the FULL merge history
                # at the next sync (corpus_synced=0), then statistics go back
                # to per-chunk freshness.
                corpus_ids = self._encode_initial_corpus(
                    corpus_sample, DEFAULT_CORPUS_TOKENS, self.corpus_shards)
                self.enh_state = self.enh_state.replace(
                    corpus=corpus_ids,
                    corpus_synced=jnp.asarray(0, jnp.int32))
                self.enh_config = self.enh_config.replace(
                    has_corpus=True, frozen_freqs=False)
        if phase_transition_steps:
            self.enh_config = self.enh_config.replace(
                phase2_step=phase_transition_steps.get(2, 1000),
                phase3_step=phase_transition_steps.get(3, 6000))
        if not adaptive_threshold:
            self.enh_config = self.enh_config.replace(
                base=self.enh_config.base.replace(adaptive_threshold=False))
        done = 0
        zero_chunks = 0
        train_seconds = 0.0
        first_chunk_seconds = None  # includes jit compile; reported separately
        start_merges = len(self.merge_history)
        prev_merges = start_merges
        from hyptokenizer_tpu.utils.metrics import compile_seconds
        prev_compile_s = compile_seconds()
        prev_rounds = E.DISPATCH_ROUNDS
        while done < steps:
            if target_vocab_size is not None and \
                    len(self.vocab) >= target_vocab_size:
                logger.info("Reached target vocab size %d", target_vocab_size)
                break
            chunk = min(log_every, steps - done)
            t0 = time.perf_counter()
            # sync_every < log_every: several sub-chunks per log window,
            # each re-entering run_enhanced (= one fresh pair-count sync).
            sub = min(sync_every, chunk) if sync_every else chunk
            run = 0
            while run < chunk:
                n = min(sub, chunk - run)
                if self.mesh is not None:
                    from hyptokenizer_tpu.parallel.sharded import (
                        run_enhanced_sharded)
                    self.enh_state = run_enhanced_sharded(
                        self.enh_state, self.enh_config, n, self.mesh)
                else:
                    self.enh_state = E.run_enhanced(self.enh_state,
                                                    self.enh_config, n)
                run += n
            new = self._sync_merges_from_device()
            if self.enh_config.needs_corpus:
                self._maybe_shrink_corpus()
            # Candidate exhaustion: a chunk with zero merges after a fresh
            # corpus sync means no candidate can ever qualify again (threshold
            # adaptation already ran inside the chunk); one retry confirms.
            zero_chunks = zero_chunks + 1 if new == 0 else 0
            if zero_chunks >= 2:
                logger.info("No more merge candidates found. Stopping.")
                break
            dt = time.perf_counter() - t0
            if first_chunk_seconds is None:
                first_chunk_seconds = dt
            else:
                train_seconds += dt
            done += chunk
            self.current_phase = int(self.enh_state.phase)
            # Per-chunk sampled distance diagnostics (the reference logs these
            # every log_every steps, enhanced_…:1077-1111).
            dstats = self.distance_statistics()
            chunk_merges = len(self.merge_history) - prev_merges
            prev_merges = len(self.merge_history)
            stat = {
                "step": int(self.state.step),
                "vocab_size": len(self.vocab),
                "merges": len(self.merge_history),
                "threshold": float(self.state.threshold),
                "curvature": float(self.state.curvature),
                "phase": self.current_phase,
                "steps_per_sec": chunk / dt if dt > 0 else float("inf"),
                # Bounded measurement windows for the bench trial protocol
                # (VERDICT r2 #2): actual merges and wall seconds per chunk.
                "chunk_merges": chunk_merges,
                "chunk_seconds": dt,
                # Mid-run (re)compiles visible in the artifact (VERDICT r3
                # #3): jit trace+compile seconds attributed to this chunk.
                "chunk_compile_s": max(0.0, round(
                    (now_compile := compile_seconds()) - prev_compile_s, 3)),
                # Sync rounds this chunk took (> 1 = queue exhaustion forced
                # mid-chunk resyncs; attributes slow chunks — VERDICT r4 #8).
                "chunk_syncs": E.DISPATCH_ROUNDS - prev_rounds,
                "pair_table_unique": int(self.enh_state.pair_unique),
                "min_dist": dstats["min"],
                "max_dist": dstats["max"],
                "mean_dist": dstats["mean"],
                "std_dist": dstats["std"],
            }
            # Advance by the raw reading, not the rounded/clamped stat:
            # accumulated rounding residue would misattribute to later
            # chunks (ADVICE r4 #4).
            prev_compile_s = now_compile
            prev_rounds = E.DISPATCH_ROUNDS
            if stat["pair_table_unique"] > self.enh_config.freq_table_size:
                logger.warning(
                    "pair table overflow: %d unique corpus pairs > table "
                    "size %d — lowest-count pairs dropped from this "
                    "snapshot (raise freq_table_size)",
                    stat["pair_table_unique"],
                    self.enh_config.freq_table_size)
            self.training_stats.append(stat)
            logger.info("step %(step)d: vocab=%(vocab_size)d phase=%(phase)d "
                        "c=%(curvature).4f thr=%(threshold).5f "
                        "%(steps_per_sec).1f steps/s", stat)
            for cb in self.callbacks:
                cb(stat)
            if bool(self.state.stopped):
                logger.info("No more merge candidates found. Stopping.")
                break
        self.merge_threshold = float(self.state.threshold)
        self.curvature = float(self.state.curvature)
        # Run summary with the headline metrics (BASELINE.md: merge steps/s
        # and corpus bytes/s/chip — corpus bytes converted into a trained
        # tokenizer per second of merge-loop time, per participating chip).
        corpus_bytes = sum(len(t.encode("utf-8")) for t in self.corpus_sample)
        n_chips = max(1, len(jax.devices()))
        merges = len(self.merge_history) - start_merges
        if train_seconds == 0.0 and first_chunk_seconds:
            train_seconds = first_chunk_seconds  # single-chunk run
        if train_seconds > 0:
            summary = {
                "train_seconds": train_seconds,
                "first_chunk_seconds": first_chunk_seconds,  # incl. compile
                "merges": merges,
                "merges_per_sec": merges / train_seconds,
                "corpus_bytes": corpus_bytes,
                "corpus_bytes_per_sec_per_chip":
                    corpus_bytes / train_seconds / n_chips,
            }
            # Kept OUT of training_stats: the per-step consumers
            # (cli/analysis.py curves, cli/benchmark_efficiency.py) read
            # every entry as a step record. Persisted by save() as
            # training_summary.json.
            self.training_summary = summary
            logger.info(
                "training summary: %(merges)d merges in %(train_seconds).1fs "
                "= %(merges_per_sec).1f merges/s, "
                "%(corpus_bytes_per_sec_per_chip).0f corpus bytes/s/chip",
                summary)

    # ----------------------------------------------------------------- persist
    @property
    def pair_frequencies(self) -> Dict:
        """String-keyed pair-frequency snapshot (reference surface,
        frequency_aware_…:92-112). Materialised from the device table."""
        keys = np.asarray(self.enh_state.pair_keys)  # (T, 2) id lanes
        counts = np.asarray(self.enh_state.pair_counts)
        out = {}
        for (a, b), c in zip(keys, counts):
            if a == int(scoring.PKEY_SENT) or c == 0:
                continue
            a, b = int(a), int(b)
            if a < len(self.vocab) and b < len(self.vocab):
                out[(self.vocab[a], self.vocab[b])] = int(c)
        return out

    def save(self, path: str) -> None:
        super().save(path)
        cfg = self.enh_config
        enhanced_config = {
            "use_frequency_aware": cfg.use_frequency,
            "use_hierarchical": cfg.use_hierarchical,
            "use_adaptive_curvature": cfg.use_adaptive_curvature,
            "use_compression_aware": cfg.use_compression,
            "alpha": cfg.alpha, "beta": cfg.beta, "gamma": cfg.gamma,
            "compression_weight": cfg.compression_weight,
            "curvature_lr": cfg.curvature_lr,
            "hierarchy_weight": cfg.hierarchy_weight,
            "distortion_weight": cfg.distortion_weight,
            "optimize_curvature_freq": cfg.curvature_freq,
            "current_phase": self.current_phase,
            "curvature": float(self.state.curvature),
            "language": self.language,
            # TPU-build knobs (framework extensions; the reference loader
            # reads only the keys it knows, so artifacts stay loadable there).
            "merge_batch": cfg.merge_batch,
            "min_pair_freq": cfg.min_pair_freq,
            "use_dense_channel": cfg.use_dense_channel,
            "max_token_len": cfg.base.max_token_len,
            "freq_table_size": cfg.freq_table_size,
            "queue_size": cfg.queue_size,
        }
        with open(os.path.join(path, "enhanced_config.json"), "w") as f:
            json.dump(enhanced_config, f)
        if cfg.use_frequency:
            freqs = {f"{a}␟{b}": c
                     for (a, b), c in self.pair_frequencies.items()}
            with open(os.path.join(path, "frequencies.json"), "w") as f:
                json.dump(freqs, f)
            with open(os.path.join(path, "freq_hyperparams.json"), "w") as f:
                json.dump({"alpha": cfg.alpha, "beta": cfg.beta,
                           "gamma": cfg.gamma}, f)
        if cfg.use_hierarchical:
            with open(os.path.join(path, "hierarchical_data.json"), "w") as f:
                json.dump({
                    "common_morphemes": sorted(self.morphology.common_morphemes),
                    "common_words": sorted(self.morphology.common_words),
                    "current_phase": self.current_phase,
                }, f)
        if cfg.use_adaptive_curvature:
            np.save(os.path.join(path, "curvature.npy"),
                    np.asarray(self.state.curvature))
            np.save(os.path.join(path, "merge_pairs.npy"),
                    np.asarray(self.state.merges)
                    [: int(self.state.num_merges)])

    @classmethod
    def load(cls, path: str, device=None) -> "EnhancedHyperbolicTokenizer":
        """Reconstruct an enhanced tokenizer from artifacts.

        Parity with the reference loader
        (enhanced_fast_hyperbolic_merge.py:1300-1427): restores feature
        flags, alpha/beta/gamma, trained curvature, phase, morphology common
        sets, and pair frequencies, with the reference's legacy-config
        fallback (a base ``config.json`` artifact loads with every enhanced
        feature off). Restored frequencies enter the device pair table; with
        no corpus to replay they stay frozen across continued training —
        exactly the reference's behavior, which freezes its frequency dict
        for a whole run (enhanced_…:266-290). Passing ``corpus_sample`` to
        a later ``optimize_merges`` re-grounds on a live corpus instead.
        """
        vocab, emb, merges, config = cls._parse_artifacts(path)
        epath = os.path.join(path, "enhanced_config.json")
        if os.path.exists(epath):
            with open(epath) as f:
                ecfg = json.load(f)
        else:
            # Legacy fallback (reference load:1330-1340): base artifacts
            # reconstruct with every enhanced feature disabled.
            ecfg = {"use_frequency_aware": False, "use_hierarchical": False,
                    "use_adaptive_curvature": False,
                    "use_compression_aware": False}
        # The reference's enhanced save writes NO config.json — its
        # enhanced_config.json carries the base keys too (enhanced_…:
        # 1248-1262). Fill missing base keys from it.
        for key in ("curvature", "merge_threshold", "max_vocab_size",
                    "use_approximate_search"):
            if key not in config and key in ecfg:
                config[key] = ecfg[key]

        n_init = len(vocab) - len(merges)
        tok = cls(
            vocab=vocab[:n_init],
            embeddings=emb[:n_init],
            curvature=float(ecfg.get("curvature",
                                     config.get("curvature", 1.0))),
            merge_threshold=config.get("merge_threshold", 0.1),
            max_vocab_size=config.get("max_vocab_size", 100_000),
            use_approximate_search=config.get("use_approximate_search", True),
            use_frequency_aware=ecfg.get("use_frequency_aware", False),
            use_hierarchical=ecfg.get("use_hierarchical", False),
            use_adaptive_curvature=ecfg.get("use_adaptive_curvature", False),
            use_compression_aware=ecfg.get("use_compression_aware", False),
            alpha=ecfg.get("alpha", 0.4),
            beta=ecfg.get("beta", 0.4),
            gamma=ecfg.get("gamma", 0.2),
            language=ecfg.get("language", "english"),
            curvature_lr=ecfg.get("curvature_lr", 0.01),
            hierarchy_weight=ecfg.get("hierarchy_weight", 1.0),
            distortion_weight=ecfg.get("distortion_weight", 0.1),
            optimize_curvature_freq=ecfg.get("optimize_curvature_freq", 100),
            compression_weight=ecfg.get("compression_weight", 0.7),
            merge_batch=ecfg.get("merge_batch", 8),
            min_pair_freq=ecfg.get("min_pair_freq", 1),
            use_dense_channel=ecfg.get("use_dense_channel", True),
            max_token_len=ecfg.get("max_token_len", 512),
            freq_table_size=ecfg.get("freq_table_size", 1 << 17),
            queue_size=ecfg.get("queue_size", 4096),
            corpus_max_tokens=cls.MIN_CORPUS_BUFFER,  # no corpus on disk
            normalizer=NormalizerConfig.from_json(config.get("normalizer")),
            merge_policy=config.get("merge_policy", "fixpoint"),
        )
        tok._restore_loaded_state(vocab, emb, merges)
        st = tok.enh_state.replace(base=tok.state)

        # Token features must cover the FULL loaded vocab (the ctor computed
        # only the initial prefix).
        t_hash, b_len, vflag = _token_features(vocab)
        v = len(vocab)
        st = st.replace(
            token_hash=st.token_hash.at[:v].set(jnp.asarray(t_hash)),
            byte_lengths=st.byte_lengths.at[:v].set(jnp.asarray(b_len)),
            has_vowel=st.has_vowel.at[:v].set(jnp.asarray(vflag)))

        # Phase (hierarchical curriculum position).
        tok.current_phase = int(ecfg.get("current_phase", 1))

        # Trained curvature: the saved scalar wins over the json float
        # (.npy from this framework; .pt from the reference's save).
        cval = None
        cnpy = os.path.join(path, "curvature.npy")
        cpt = os.path.join(path, "curvature.pt")
        if ecfg.get("use_adaptive_curvature"):
            if os.path.exists(cnpy):
                cval = float(np.load(cnpy))
            elif os.path.exists(cpt):
                import torch
                cval = float(torch.load(cpt, map_location="cpu",
                                        weights_only=True).detach())
        if cval is not None:
            tok.curvature = cval
            st = st.replace(base=st.base.replace(
                curvature=jnp.asarray(cval, jnp.float32)))

        # Morphology: rebuild validity sets from the persisted common sets.
        hpath = os.path.join(path, "hierarchical_data.json")
        if ecfg.get("use_hierarchical") and os.path.exists(hpath):
            with open(hpath) as f:
                hd = json.load(f)
            tok.morphology = morphology.from_common_sets(
                hd.get("common_morphemes", []), hd.get("common_words", []))
            mk, ms, wk, ws = tok.morphology.hash_tables()
            st = st.replace(
                morph_table=jnp.asarray(mk),
                morph_size=jnp.asarray(ms, jnp.int32),
                word_table=jnp.asarray(wk),
                word_size=jnp.asarray(ws, jnp.int32))
            tok.current_phase = int(hd.get("current_phase",
                                           tok.current_phase))
        st = st.replace(phase=jnp.asarray(tok.current_phase, jnp.int32))

        # Pair frequencies -> device pair table (frozen: no corpus on disk).
        fpath = os.path.join(path, "frequencies.json")
        if ecfg.get("use_frequency_aware") and os.path.exists(fpath):
            with open(fpath) as f:
                freqs = json.load(f)
            t2i: Dict[str, int] = {}
            for i, t in enumerate(vocab):
                t2i.setdefault(t, i)
            entries = []
            for key, count in freqs.items():
                # Our artifacts separate with U+241F; the reference's with
                # "|" (enhanced_…:1402 splits on it).
                sep = "␟" if "␟" in key else "|"
                parts = key.split(sep)
                if len(parts) != 2:
                    continue
                a, b = parts
                if a in t2i and b in t2i:
                    entries.append((t2i[a], t2i[b], int(count)))
            T = tok.enh_config.freq_table_size
            n_unique = len(entries)
            arr = np.asarray(sorted(entries)[:T], np.int32).reshape(-1, 3)
            keys = np.full((T, 2), scoring.PKEY_SENT, np.int32)
            counts = np.zeros((T,), np.int32)
            keys[:len(arr)] = arr[:, :2]
            counts[:len(arr)] = arr[:, 2]
            st = st.replace(
                pair_keys=jnp.asarray(keys),
                pair_counts=jnp.asarray(counts),
                max_pair_count=jnp.asarray(
                    int(counts.max(initial=0)), jnp.int32),
                pair_unique=jnp.asarray(n_unique, jnp.int32),
                # Stand-in for the sync-time snapshot (compression ratio
                # denominator): the adjacent-pair total is within one
                # token-per-line of the live token count.
                corpus_tokens=jnp.asarray(int(counts.sum()), jnp.int32),
                corpus_synced=st.base.num_merges)
            tok.enh_config = tok.enh_config.replace(
                has_corpus=True, frozen_freqs=True)

        tok.enh_state = st
        return tok


class FrequencyAwareHyperbolicTokenizer(EnhancedHyperbolicTokenizer):
    """Frequency-scored merges only (reference frequency_aware_…:29-396)."""

    def __init__(self, vocab, embeddings, alpha: float = 0.4, beta: float = 0.4,
                 gamma: float = 0.2, **kw):
        kw.setdefault("use_hierarchical", False)
        kw.setdefault("use_adaptive_curvature", False)
        kw.setdefault("use_compression_aware", False)
        super().__init__(vocab, embeddings, use_frequency_aware=True,
                         alpha=alpha, beta=beta, gamma=gamma, **kw)


class HierarchicalHyperbolicTokenizer(EnhancedHyperbolicTokenizer):
    """3-phase curriculum merges (reference hierarchical_…:41-513)."""

    def __init__(self, vocab, embeddings, **kw):
        kw.setdefault("use_frequency_aware", False)
        kw.setdefault("use_adaptive_curvature", False)
        kw.setdefault("use_compression_aware", False)
        super().__init__(vocab, embeddings, use_hierarchical=True, **kw)

    def _is_potential_morpheme(self, token: str) -> bool:
        return self.morphology.is_potential_morpheme(token)

    def _is_valid_word(self, token: str) -> bool:
        return self.morphology.is_valid_word(token)


class AdaptiveCurvatureTokenizer(EnhancedHyperbolicTokenizer):
    """Trainable-curvature merges (reference adaptive_curvature_…:31-437)."""

    def __init__(self, vocab, embeddings, curvature_lr: float = 0.01,
                 hierarchy_weight: float = 1.0, distortion_weight: float = 0.1,
                 optimize_curvature_freq: int = 100, **kw):
        kw.setdefault("use_frequency_aware", False)
        kw.setdefault("use_hierarchical", False)
        kw.setdefault("use_compression_aware", False)
        super().__init__(vocab, embeddings, use_adaptive_curvature=True,
                         curvature_lr=curvature_lr,
                         hierarchy_weight=hierarchy_weight,
                         distortion_weight=distortion_weight,
                         optimize_curvature_freq=optimize_curvature_freq, **kw)


class CompressionAwareTokenizer(EnhancedHyperbolicTokenizer):
    """Compression-gain-scored merges (reference compression_aware_…:28-340)."""

    def __init__(self, vocab, embeddings, compression_weight: float = 0.7,
                 **kw):
        kw.setdefault("use_frequency_aware", False)
        kw.setdefault("use_hierarchical", False)
        kw.setdefault("use_adaptive_curvature", False)
        super().__init__(vocab, embeddings, use_compression_aware=True,
                         compression_weight=compression_weight, **kw)


# Reference name-parity alias.
EnhancedFastHyperbolicTokenizer = EnhancedHyperbolicTokenizer
