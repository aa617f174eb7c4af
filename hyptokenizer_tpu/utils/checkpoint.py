"""Resumable mid-training checkpoints (net-new vs the reference).

The reference persists artifacts only at the end of training and cannot resume
a merge loop at step k (SURVEY §5.3-5.4). Here the full device state (a pytree
of arrays, including RNG key, thresholds, curvature Adam state and the corpus)
plus the host-side strings round-trip through an orbax checkpoint + JSON
sidecar, so training continues exactly where it stopped — including after a
host restart.

Format compatibility: the checkpoint template is the CURRENT EnhancedState
pytree. Checkpoints written before the two-lane pair-key / candidate-queue
redesign, or before the uint32 -> int32 key/hash switch (round 3 — Mosaic
lowers no unsigned reductions), do not restore into this version — delete and
retrain, or restore with the matching older build.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, tokenizer) -> None:
    """Checkpoint a (base or enhanced) tokenizer mid-training."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ocp = _ocp()
    state = getattr(tokenizer, "enh_state", None) or tokenizer.state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "device_state"), state, force=True)
    host = {
        "kind": type(tokenizer).__name__,
        "vocab": tokenizer.vocab,
        "merge_history": [list(m) for m in tokenizer.merge_history],
        "training_stats": tokenizer.training_stats,
        "curvature": float(tokenizer.state.curvature),
        "merge_threshold": float(tokenizer.state.threshold),
        "max_vocab_size": tokenizer.max_vocab_size,
        "step": int(tokenizer.state.step),
        "enhanced": hasattr(tokenizer, "enh_state"),
        "current_phase": getattr(tokenizer, "current_phase", None),
        # Corpus buffers shrink during training (enhanced._maybe_shrink_
        # corpus); restore slices the fresh template to match.
        "corpus_len": (int(tokenizer.enh_state.corpus.shape[0])
                       if hasattr(tokenizer, "enh_state") else None),
    }
    with open(os.path.join(path, "host_state.json"), "w") as f:
        json.dump(host, f)


def restore_checkpoint(path: str, tokenizer) -> None:
    """Restore device+host state into a compatibly-constructed tokenizer.

    The tokenizer must be constructed with the same static configuration
    (max_vocab_size, dims, feature flags) as at save time; array state and
    host strings are then replaced wholesale.
    """
    path = os.path.abspath(path)
    with open(os.path.join(path, "host_state.json")) as f:
        host = json.load(f)
    ocp = _ocp()
    template = getattr(tokenizer, "enh_state", None) or tokenizer.state
    saved_len = host.get("corpus_len")
    if saved_len is not None and hasattr(template, "corpus") and \
            template.corpus.shape[0] != saved_len:
        if saved_len > template.corpus.shape[0]:
            raise ValueError(
                f"checkpoint corpus ({saved_len}) larger than this "
                f"tokenizer's buffer ({template.corpus.shape[0]}); construct "
                "with a larger corpus_max_tokens")
        template = template.replace(corpus=template.corpus[:saved_len])
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "device_state"),
                                 template)
    if host["enhanced"]:
        if not hasattr(tokenizer, "enh_state"):
            raise ValueError("checkpoint is enhanced; construct an "
                             "EnhancedHyperbolicTokenizer to restore it")
        tokenizer.enh_state = restored
        tokenizer.state = restored.base
        tokenizer.current_phase = host.get("current_phase") or 1
    else:
        tokenizer.state = restored
    tokenizer.vocab = list(host["vocab"])
    tokenizer.merge_history = [tuple(m) for m in host["merge_history"]]
    tokenizer.training_stats = list(host["training_stats"])
    tokenizer._encoder = None
