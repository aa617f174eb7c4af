"""Conformant tokenize/encode/decode — the inference path.

Reproduces the reference's fixpoint merge application *exactly*
(tokenizer/hyperbolic_merge.py:414-471): character split, then repeated
left-to-right scans replacing the FIRST adjacent pair found in the merge-rule
table, until a full scan changes nothing. This is NOT priority-ordered BPE —
first-match-wins per scan position, multiple passes — and byte-identical token
ids require replicating it as-is (SURVEY §3.3).

A C++ fast path with identical semantics lives in native/fast_encode.cpp and is
used automatically when its shared library has been built (python fallback
otherwise). Conformance of the two paths against each other is tested in
tests/test_conformance.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Sequence, Tuple

from hyptokenizer_tpu.tokenizer import normalize as norm_lib
from hyptokenizer_tpu.tokenizer.normalize import NormalizerConfig

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_NATIVE_PATH = os.path.join(_NATIVE_DIR, "libfast_encode.so")


def ensure_native_built() -> bool:
    """Build the C++ encoder on demand (make -C native); False on failure."""
    if os.path.exists(_NATIVE_PATH):
        return True
    if not os.path.exists(os.path.join(_NATIVE_DIR, "fast_encode.cpp")):
        return False
    import subprocess
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(_NATIVE_PATH)

UNK_TOKEN = "<unk>"
UNK_FALLBACK_ID = 3  # reference hyperbolic_merge.py:459


def build_merge_rules(merge_history: Sequence[Tuple[str, str, str]]) -> Dict[Tuple[str, str], str]:
    """Merge-rule lookup table {(left, right): merged}.

    Insertion order matters only through dict-overwrite semantics: as in the
    reference (:425-428), a later duplicate (left, right) pair overwrites the
    earlier rule.
    """
    return {(a, b): m for a, b, m in merge_history}


def tokenize_priority_py(text: str,
                         rule_ranks: Dict[Tuple[str, str], Tuple[int, str]]
                         ) -> List[str]:
    """Priority-ordered (classic BPE) merge application.

    Repeatedly merges the adjacent pair with the LOWEST merge rank (training
    order), left-to-right within a rank. This reproduces the training
    trajectory of the chunked merge loop — its corpus replay applies merges
    chunk-by-chunk in rank order — where the reference's fixpoint scan
    (``tokenize_py``) can take a different merge path once later rules
    shadow earlier ones (e.g. ' th'+'e' blocking ' the').
    """
    tokens = list(text)
    while len(tokens) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(tokens) - 1):
            r = rule_ranks.get((tokens[i], tokens[i + 1]))
            if r is not None and (best_rank is None or r[0] < best_rank):
                best_rank = r[0]
                best_i = i
        if best_rank is None:
            break
        merged = rule_ranks[(tokens[best_i], tokens[best_i + 1])][1]
        tokens[best_i] = merged
        tokens.pop(best_i + 1)
    return tokens


def tokenize_py(text: str, merge_rules: Dict[Tuple[str, str], str]) -> List[str]:
    """Pure-python reference-semantics tokenizer (hyperbolic_merge.py:414-446)."""
    tokens = list(text)
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(tokens) - 1:
            pair = (tokens[i], tokens[i + 1])
            merged = merge_rules.get(pair)
            if merged is not None:
                tokens[i] = merged
                tokens.pop(i + 1)
                changed = True
            else:
                i += 1
    return tokens


class _NativeEncoder:
    """ctypes wrapper over native/fast_encode.cpp (built lazily via make)."""

    def __init__(self, lib_path: str):
        lib = ctypes.CDLL(lib_path)
        lib.he_create.restype = ctypes.c_void_p
        lib.he_create.argtypes = []
        lib.he_destroy.argtypes = [ctypes.c_void_p]
        lib.he_add_rule.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_char_p]
        lib.he_add_vocab.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.he_set_unk.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.he_encode.restype = ctypes.c_int
        lib.he_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        self._set_policy = getattr(lib, "he_set_policy", None)
        if self._set_policy is not None:
            self._set_policy.restype = None
            self._set_policy.argtypes = [ctypes.c_void_p, ctypes.c_int]
        self._set_presplit = getattr(lib, "he_set_presplit", None)
        if self._set_presplit is not None:
            self._set_presplit.restype = None
            self._set_presplit.argtypes = [ctypes.c_void_p, ctypes.c_int]
        self._batch = getattr(lib, "he_encode_batch", None)
        if self._batch is not None:
            self._batch.restype = ctypes.c_int64
            self._batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64]
        self._batch_seg = getattr(lib, "he_encode_batch_seg", None)
        if self._batch_seg is not None:
            self._batch_seg.restype = ctypes.c_int64
            self._batch_seg.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64]
        self._lib = lib
        self._h = lib.he_create()

    def __del__(self):
        try:
            self._lib.he_destroy(self._h)
        except Exception:
            pass

    def load(self, merge_history, token2idx, unk_id, merge_policy="fixpoint",
             presplit_mode=0):
        # Rules are added in merge-history order: the C ABI derives both the
        # fixpoint dict-overwrite table and the priority ranks from it.
        for a, b, m in merge_history:
            self._lib.he_add_rule(self._h, a.encode(), b.encode(), m.encode())
        for tok, idx in token2idx.items():
            self._lib.he_add_vocab(self._h, tok.encode(), idx)
        self._lib.he_set_unk(self._h, unk_id)
        if merge_policy == "priority":
            if self._set_policy is None:
                raise OSError("native library lacks he_set_policy; rebuild")
            self._set_policy(self._h, 1)
        if presplit_mode:
            if self._set_presplit is None:
                raise OSError("native library lacks he_set_presplit; rebuild")
            self._set_presplit(self._h, presplit_mode)

    def encode(self, text: str) -> List[int]:
        data = text.encode()
        cap = max(8, len(text) + 1)
        out = (ctypes.c_int * cap)()
        n = self._lib.he_encode(self._h, data, len(data), out, cap)
        if n < 0:
            raise RuntimeError("native encode failed")
        return list(out[:n])

    def encode_batch(self, texts: Sequence[str],
                     n_threads: int = 0) -> List[List[int]]:
        """Threaded batch encode: one C call for the whole list."""
        if self._batch is None or not texts:
            return [self.encode(t) for t in texts]
        blobs = [t.encode() for t in texts]
        data = b"".join(blobs)
        n = len(blobs)
        offsets = (ctypes.c_int64 * (n + 1))()
        pos = 0
        for i, b in enumerate(blobs):
            offsets[i] = pos
            pos += len(b)
        offsets[n] = pos
        # Token count never exceeds codepoint count <= byte count.
        cap = max(8, pos)
        out = (ctypes.c_int * cap)()
        out_offsets = (ctypes.c_int64 * (n + 1))()
        total = self._batch(self._h, data, offsets, n, n_threads, out,
                            out_offsets, cap)
        if total < 0:
            raise RuntimeError("native batch encode failed")
        flat = out[:total]
        return [flat[out_offsets[i]:out_offsets[i + 1]] for i in range(n)]

    def encode_batch_seg(self, texts: Sequence[str],
                         seg_starts_lists: Sequence[Sequence[int]],
                         n_threads: int = 0) -> List[List[int]]:
        """Batch encode with per-text segment-start byte offsets.

        Merges never cross a segment start — equivalent to encoding each
        segment separately and concatenating, in ONE native call. Offsets
        must be byte offsets (callers use the ASCII fast path where char
        offsets == byte offsets).
        """
        if self._batch_seg is None:
            raise OSError("native library lacks he_encode_batch_seg; rebuild")
        blobs = [t.encode() for t in texts]
        data = b"".join(blobs)
        n = len(blobs)
        offsets = (ctypes.c_int64 * (n + 1))()
        pos = 0
        for i, b in enumerate(blobs):
            offsets[i] = pos
            pos += len(b)
        offsets[n] = pos
        n_starts = sum(len(s) for s in seg_starts_lists)
        seg_starts = (ctypes.c_int64 * max(1, n_starts))()
        seg_ptr = (ctypes.c_int64 * (n + 1))()
        k = 0
        for i, starts in enumerate(seg_starts_lists):
            seg_ptr[i] = k
            for s in starts:
                seg_starts[k] = s
                k += 1
        seg_ptr[n] = k
        cap = max(8, pos)
        out = (ctypes.c_int * cap)()
        out_offsets = (ctypes.c_int64 * (n + 1))()
        total = self._batch_seg(self._h, data, offsets, n, n_threads,
                                seg_starts, seg_ptr, out, out_offsets, cap)
        if total < 0:
            raise RuntimeError("native batch encode failed")
        flat = out[:total]
        return [flat[out_offsets[i]:out_offsets[i + 1]] for i in range(n)]


class Encoder:
    """tokenize/encode/decode with reference semantics and a native fast path.

    ``normalizer`` opts into Unicode normalization and regex pre-splitting
    before the character split (normalize.py); the default (None) is exact
    reference semantics.
    """

    def __init__(self, vocab: Sequence[str],
                 merge_history: Sequence[Tuple[str, str, str]],
                 use_native: Optional[bool] = None,
                 normalizer: Optional[NormalizerConfig] = None,
                 merge_policy: str = "fixpoint"):
        if merge_policy not in ("fixpoint", "priority"):
            raise ValueError(f"unknown merge_policy {merge_policy!r}")
        self.normalizer = normalizer
        self.merge_policy = merge_policy
        self.vocab = list(vocab)
        self.merge_history = [tuple(m) for m in merge_history]
        self.merge_rules = build_merge_rules(self.merge_history)
        # Rank table for priority mode: first occurrence of a pair wins
        # (later duplicates cannot fire before the earlier rank anyway).
        self.rule_ranks: Dict[Tuple[str, str], Tuple[int, str]] = {}
        for k, (a, b, m) in enumerate(self.merge_history):
            self.rule_ranks.setdefault((a, b), (k, m))
        self.token2idx = {t: i for i, t in enumerate(self.vocab)}
        self.unk_id = self.token2idx.get(UNK_TOKEN, UNK_FALLBACK_ID)
        # Canonical pre-split patterns have a native ASCII segmenter: text
        # that passes isascii() encodes in one native call with boundaries
        # computed in C++ (no per-segment FFI/regex cost).
        self._native_presplit = 0
        if normalizer is not None and normalizer.pre_split is not None:
            self._native_presplit = {
                norm_lib.WHITESPACE: 1,
                norm_lib.WORDS_WITH_SPACE: 2,
            }.get(normalizer.pre_split, 0)
        # Two native handles: the primary one is ALWAYS presplit-free, so that
        # per-segment fallbacks (non-ASCII text, non-canonical patterns) never
        # hit the native ASCII-only segmenter and diverge from encode_py on
        # bytes >= 0x80. The presplit handle is consulted only on the
        # isascii() fast paths where its segmenter is exact.
        self._native = None
        self._native_pre = None
        if use_native is None:
            use_native = ensure_native_built()
        if use_native:
            try:
                native = _NativeEncoder(_NATIVE_PATH)
                native.load(self.merge_history, self.token2idx, self.unk_id,
                            merge_policy=self.merge_policy, presplit_mode=0)
                self._native = native
                if self._native_presplit:
                    pre = _NativeEncoder(_NATIVE_PATH)
                    pre.load(self.merge_history, self.token2idx, self.unk_id,
                             merge_policy=self.merge_policy,
                             presplit_mode=self._native_presplit)
                    self._native_pre = pre
            except OSError:
                self._native = None
                self._native_pre = None

    @property
    def native_available(self) -> bool:
        return self._native is not None

    def _tokenize_seg(self, seg: str) -> List[str]:
        if self.merge_policy == "priority":
            return tokenize_priority_py(seg, self.rule_ranks)
        return tokenize_py(seg, self.merge_rules)

    def tokenize(self, text: str) -> List[str]:
        segs = norm_lib.apply(text, self.normalizer)
        if len(segs) == 1:
            return self._tokenize_seg(segs[0])
        out: List[str] = []
        for seg in segs:
            out.extend(self._tokenize_seg(seg))
        return out

    def encode(self, text: str) -> List[int]:
        if self._native is None:
            return self.encode_py(text)
        if self.normalizer is None:
            return self._native.encode(text)
        normed = norm_lib.normalize(text, self.normalizer)
        if self._native_pre is not None and normed.isascii():
            return self._native_pre.encode(normed)  # segments natively
        segs = (list(norm_lib.segments(normed, self.normalizer.pre_split))
                if self.normalizer.pre_split else [normed])
        if len(segs) == 1:
            return self._native.encode(segs[0])
        out: List[int] = []
        for seg in segs:
            out.extend(self._native.encode(seg))
        return out

    def encode_batch(self, texts: Sequence[str],
                     n_threads: int = 0) -> List[List[int]]:
        """Encode many texts in one native call (threaded across texts).

        Semantics are exactly ``[self.encode(t) for t in texts]``; the native
        path amortises the FFI boundary and fans out across CPU threads
        (encoding is read-only on the rule table).
        """
        if self._native is None:
            return [self.encode_py(t) for t in texts]
        if self.normalizer is None:
            return self._native.encode_batch(texts, n_threads=n_threads)
        normed = [norm_lib.normalize(t, self.normalizer) for t in texts]
        if self.normalizer.pre_split and all(t.isascii() for t in normed):
            # ASCII fast paths: canonical patterns segment natively inside
            # the batch call; other patterns hand the native encoder segment
            # BOUNDARIES instead of segment substrings (char offset == byte
            # offset for ASCII).
            if self._native_pre is not None:
                return self._native_pre.encode_batch(normed,
                                                     n_threads=n_threads)
            if self._native._batch_seg is not None:
                starts = [
                    norm_lib.segment_starts(t, self.normalizer.pre_split)
                    for t in normed]
                return self._native.encode_batch_seg(normed, starts,
                                                     n_threads=n_threads)
        # General path: pre-split host-side, batch the segments, regroup.
        seg_lists = [norm_lib.apply(t, self.normalizer) for t in texts]
        flat = [s for segs in seg_lists for s in segs]
        enc = self._native.encode_batch(flat, n_threads=n_threads)
        out: List[List[int]] = []
        pos = 0
        for segs in seg_lists:
            ids: List[int] = []
            for _ in segs:
                ids.extend(enc[pos])
                pos += 1
            out.append(ids)
        return out

    def encode_py(self, text: str) -> List[int]:
        """Pure-python path (for conformance cross-checks)."""
        return [self.token2idx.get(t, self.unk_id) for t in self.tokenize(text)]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(self.vocab[i] for i in ids)
