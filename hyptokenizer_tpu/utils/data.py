"""Data pipeline (L0): text cleaning, vocab building, embedding init, IO.

Capability parity with ``scripts/preprocess_wiki.py:30-166`` (clean_text, BZ2
streaming, char-frequency initial vocab with min_count filter and the
``<pad> <bos> <eos> <unk>`` specials) and the embedding initialisation of
``scripts/train_hyperbolic_tokenizer.py:64-107`` (tangent Gaussian sigma=0.01
at the origin -> exp map -> projection).
"""

from __future__ import annotations

import bz2
import re
import unicodedata
from collections import Counter
from typing import IO, Iterable, List, Optional, Union

import jax
import numpy as np

SPECIAL_TOKENS = ["<pad>", "<bos>", "<eos>", "<unk>"]
_STRIP_RE = re.compile(r"[^a-z0-9\s\.\,]")
_WS_RE = re.compile(r"\s+")


def clean_text(text: str) -> str:
    """NFC normalise, lowercase, strip to [a-z0-9 space . ,], collapse ws.

    Parity: preprocess_wiki.py:30-52. (Note: accented chars are *removed*, not
    transliterated — NFC keeps 'é' composed and the regex deletes it; the
    reference's own test asserting 'café'->'cafe' fails against this, see
    SURVEY §4 / DEVIATIONS context.)
    """
    text = unicodedata.normalize("NFC", text)
    text = text.lower().strip()
    text = _STRIP_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text)
    return text


def open_text(path: str, mode: str = "r") -> IO:
    """BZ2-aware text open (preprocess_wiki.py:55-75)."""
    if path.endswith(".bz2"):
        if "r" in mode:
            return bz2.open(path, mode + "t", encoding="utf-8",
                            errors="ignore")
        return bz2.open(path, mode + "t", encoding="utf-8")
    return open(path, mode, encoding="utf-8")


def preprocess_lines(lines: Iterable[str], min_length: int = 0) -> Iterable[str]:
    """Clean lines, dropping those shorter than ``min_length`` post-cleaning."""
    for line in lines:
        cleaned = clean_text(line)
        if len(cleaned) >= min_length and cleaned:
            yield cleaned


def build_initial_vocab(lines: Iterable[str], min_count: int = 5) -> List[str]:
    """Char-frequency vocab with specials prepended (preprocess_wiki.py:126-166).

    Order parity: characters keep first-seen order (python dict semantics in
    the reference), filtered by ``min_count``.
    """
    counts: Counter = Counter()
    seen_order: List[str] = []
    seen = set()
    for line in lines:
        for ch in line:
            counts[ch] += 1
            if ch not in seen:
                seen.add(ch)
                seen_order.append(ch)
    vocab = [ch for ch in seen_order if counts[ch] >= min_count]
    return SPECIAL_TOKENS + vocab


def load_vocab(path: str) -> List[str]:
    """One token per line (train_hyperbolic_tokenizer.py:50-62)."""
    with open_text(path) as f:
        return [line.rstrip("\n") for line in f if line.rstrip("\n")]


def save_vocab(vocab: List[str], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for tok in vocab:
            f.write(tok + "\n")


def encode_corpus_chars(texts: Iterable[str], vocab: List[str],
                        max_tokens: int, unk_id: int = 3,
                        sep_id: int = -2, pad_id: int = -1,
                        pre_split: Optional[str] = None) -> np.ndarray:
    """Char-encode lines into a fixed-size id array with SEP between lines.

    The shared corpus representation of the enhanced scorer and the RSGD
    embedding trainer (PAD=-1 tail, SEP=-2 line separators; see
    tokenizer/scoring.py).

    ``pre_split``: optional regex (tokenizer/normalize.py) — SEPs are also
    inserted between the lossless segments of each line, so merge candidates
    (adjacent corpus pairs) never cross a segment boundary. This is the
    training-side counterpart of the encode path's pre-splitting: a tokenizer
    trained this way with ``normalizer=NormalizerConfig(pre_split=...)``
    tokenizes exactly the units it was trained on, and stays lossless (every
    character, separators included, belongs to a segment).
    """
    t2i = {}
    for i, t in enumerate(vocab):
        t2i.setdefault(t, i)
    ids: List[int] = []
    for text in texts:
        if pre_split is not None:
            from hyptokenizer_tpu.tokenizer.normalize import segments
            for seg in segments(text, pre_split):
                ids.extend(t2i.get(ch, unk_id) for ch in seg)
                ids.append(sep_id)
        else:
            ids.extend(t2i.get(ch, unk_id) for ch in text)
            ids.append(sep_id)
        if len(ids) >= max_tokens:
            break
    ids = ids[:max_tokens]
    arr = np.full((max_tokens,), pad_id, np.int32)
    arr[:len(ids)] = ids
    return arr


def initialize_embeddings(n: int, dim: int, curvature: float = 1.0,
                          sigma: float = 0.01, seed: int = 42) -> np.ndarray:
    """Tangent-Gaussian init at the origin -> exp map -> projection.

    Parity: train_hyperbolic_tokenizer.py:64-107 (sigma 0.01, zero time
    coordinate in the tangent, final re-projection).
    """
    from hyptokenizer_tpu.ops import lorentz as L
    pts = L.random_points(jax.random.PRNGKey(seed), n, dim, c=curvature,
                          sigma=sigma)
    return np.asarray(pts)
