// Fast tokenize/encode with exact reference semantics.
//
// Replicates the fixpoint merge application of the reference tokenizer
// (tokenizer/hyperbolic_merge.py:414-459): UTF-8 codepoint split, then
// repeated left-to-right scans replacing the FIRST adjacent pair found in the
// merge-rule table (continuing at the same position after a replacement, so
// right-cascades happen within a pass and left-context merges wait for the
// next pass), until a full scan changes nothing. This multi-pass order is
// observable (it differs from single-pass backtracking) and must not be
// "optimised" away.
//
// Internally tokens are interned to int32 ids; unknown codepoints map to a
// sentinel id (they can never match a rule, since every rule operand is an
// interned vocab string) and to <unk> on output. Encoding never mutates the
// table, so the batch entry point fans texts out across threads.
//
// C ABI (ctypes-friendly): he_create / he_add_rule / he_add_vocab /
// he_set_unk / he_encode / he_encode_batch / he_destroy. See
// hyptokenizer_tpu/tokenizer/encode.py for the python binding.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(uint64_t v) const noexcept {
    v ^= v >> 33;
    v *= 0xff51afd7ed558ccdULL;
    v ^= v >> 33;
    return static_cast<size_t>(v);
  }
};

struct Rule {
  int32_t merged;      // latest merged id (fixpoint: dict-overwrite semantics)
  int32_t rank;        // first insertion rank (priority: first-wins)
  int32_t merged_first;  // merged id of the first insertion (priority mode)
};

struct Encoder {
  std::unordered_map<std::string, int32_t> intern;   // token string -> intern id
  std::vector<int32_t> out_id;                       // intern id -> vocab id (-1 unk)
  std::unordered_map<uint64_t, Rule, PairHash> rules;  // (a,b) -> rule
  int32_t unk_id = 3;
  int32_t n_rules = 0;
  int32_t policy = 0;  // 0 = fixpoint (reference), 1 = priority (BPE rank)
  // Native pre-split for ASCII text: 0 = none, 1 = whitespace runs
  // (normalize.WHITESPACE), 2 = GPT-2-style words (normalize.WORDS_WITH_
  // SPACE). Callers must route non-ASCII text through the python paths —
  // the class tests below are ASCII-only.
  int32_t presplit = 0;

  int32_t intern_token(const std::string& s) {
    auto it = intern.find(s);
    if (it != intern.end()) return it->second;
    int32_t id = static_cast<int32_t>(out_id.size());
    intern.emplace(s, id);
    out_id.push_back(-1);
    return id;
  }
};

inline uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

// Sentinel for codepoints absent from the intern table. Interned ids are
// non-negative, so the sentinel can never match a rule operand — which is
// exactly the semantics of the reference's <unk> fallback (they also cannot
// merge with anything, since every rule operand is a vocab string).
constexpr int32_t kUnknown = INT32_MIN;

// Splits UTF-8 bytes into codepoint substrings (invalid bytes pass through
// as single bytes, matching python's per-character iteration of decoded
// text for well-formed input).
inline size_t utf8_len(unsigned char c) {
  if (c < 0x80) return 1;
  if ((c >> 5) == 0x6) return 2;
  if ((c >> 4) == 0xE) return 3;
  if ((c >> 3) == 0x1E) return 4;
  return 1;
}

// ASCII segmentation state machines reproducing tokenizer/normalize.py's
// canonical patterns via python `re` semantics (leftmost position, earliest
// alternative, greedy runs; unmatched characters form gap segments).
// Returns per-byte "segment starts here" flags.
namespace seg {

inline bool is_alpha(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
inline bool is_digit(unsigned char c) { return c >= '0' && c <= '9'; }
inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}
// [^\w\s] for ASCII: not alnum, not '_', not whitespace.
inline bool is_punct(unsigned char c) {
  return !is_alpha(c) && !is_digit(c) && c != '_' && !is_space(c) &&
         c < 0x80;
}

// WHITESPACE = r"\S+|\s+": alternating runs.
inline void whitespace_bounds(const char* s, size_t n,
                              std::vector<uint8_t>& bound) {
  bound.assign(n, 0);
  size_t i = 0;
  while (i < n) {
    bound[i] = 1;
    bool sp = is_space(static_cast<unsigned char>(s[i]));
    size_t j = i + 1;
    while (j < n && is_space(static_cast<unsigned char>(s[j])) == sp) ++j;
    i = j;
  }
}

// WORDS_WITH_SPACE = r"\s?[^\W\d_]+|\s?\d+|\s?[^\w\s]+|\s+" (ASCII classes).
inline void words_bounds(const char* s, size_t n,
                         std::vector<uint8_t>& bound) {
  bound.assign(n, 0);
  size_t i = 0;
  auto cls_run = [&](size_t j, bool (*cls)(unsigned char)) {
    size_t k = j;
    while (k < n && cls(static_cast<unsigned char>(s[k]))) ++k;
    return k;
  };
  while (i < n) {
    unsigned char c = static_cast<unsigned char>(s[i]);
    size_t start = i;
    size_t j = i;
    bool leading_space = false;
    if (is_space(c) && i + 1 < n) {
      unsigned char d = static_cast<unsigned char>(s[i + 1]);
      if (is_alpha(d) || is_digit(d) || is_punct(d)) {
        leading_space = true;
        j = i + 1;
        c = d;
      }
    }
    size_t end;
    if (is_alpha(c)) {
      end = cls_run(j, is_alpha);
    } else if (is_digit(c)) {
      end = cls_run(j, is_digit);
    } else if (is_punct(c)) {
      end = cls_run(j, is_punct);
    } else if (is_space(c) && !leading_space) {
      end = cls_run(i, is_space);  // \s+ (greedy run of spaces)
    } else {
      // Unmatched ('_' etc.): gap until the next position where an
      // alternative can start. A gap character joins the previous gap
      // segment; only mark a boundary when the gap begins.
      bound[start] = 1;
      size_t k = i + 1;
      while (k < n) {
        unsigned char g = static_cast<unsigned char>(s[k]);
        if (is_alpha(g) || is_digit(g) || is_punct(g) || is_space(g)) break;
        ++k;
      }
      i = k;
      continue;
    }
    bound[start] = 1;
    i = end;
  }
}

}  // namespace seg

// Priority merge for a short window [lo, hi) of toks: naive min-rank scan.
// For pre-split segments (~5 tokens) this beats the heap's allocation and
// push/pop overhead; O(L^2) lookups with tiny constants.
size_t priority_merge_window(const Encoder& e, std::vector<int32_t>& toks,
                             size_t lo, size_t hi, std::vector<int32_t>& out) {
  size_t len = hi - lo;
  if (len == 1) {
    out.push_back(toks[lo]);
    return 1;
  }
  size_t base = out.size();
  for (size_t k = lo; k < hi; ++k) out.push_back(toks[k]);
  while (true) {
    int32_t best_rank = INT32_MAX;
    size_t best_i = 0;
    const Rule* best_rule = nullptr;
    for (size_t k = base; k + 1 < out.size(); ++k) {
      auto it = e.rules.find(pair_key(out[k], out[k + 1]));
      if (it != e.rules.end() && it->second.rank < best_rank) {
        best_rank = it->second.rank;
        best_i = k;
        best_rule = &it->second;
      }
    }
    if (!best_rule) break;
    out[best_i] = best_rule->merged_first;
    out.erase(out.begin() + best_i + 1);
  }
  return out.size() - base;
}

// Classic BPE: merge the lowest-rank adjacent pair first (leftmost among
// equal ranks), until no rule applies. Doubly-linked list over positions +
// a lazily-validated min-heap of (rank, position) candidates: O(L log L).
// ``bound`` (optional, size n) marks segment starts: pairs whose right
// element starts a segment never merge (lossless pre-split semantics,
// tokenizer/normalize.py).
void priority_merge_heap(const Encoder& e, std::vector<int32_t>& toks,
                         const std::vector<uint8_t>* bound = nullptr) {
  size_t n = toks.size();
  if (n < 2 || e.rules.empty()) return;
  std::vector<int32_t> nxt(n), prv(n);
  for (size_t i = 0; i < n; ++i) {
    nxt[i] = static_cast<int32_t>(i) + 1;
    prv[i] = static_cast<int32_t>(i) - 1;
  }
  nxt[n - 1] = -1;
  using Item = std::pair<int32_t, int32_t>;  // (rank, pos) — min first
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> heap;
  auto push_pair = [&](int32_t pos) {
    int32_t np = nxt[pos];
    if (np < 0) return;
    if (bound && (*bound)[np]) return;  // right element starts a segment
    auto it = e.rules.find(pair_key(toks[pos], toks[np]));
    if (it != e.rules.end()) heap.emplace(it->second.rank, pos);
  };
  for (size_t i = 0; i + 1 < n; ++i) push_pair(static_cast<int32_t>(i));
  std::vector<bool> dead(n, false);
  while (!heap.empty()) {
    auto [rank, pos] = heap.top();
    heap.pop();
    if (dead[pos]) continue;
    int32_t np = nxt[pos];
    if (np < 0) continue;
    auto it = e.rules.find(pair_key(toks[pos], toks[np]));
    if (it == e.rules.end() || it->second.rank != rank) continue;  // stale
    toks[pos] = it->second.merged_first;
    dead[np] = true;
    nxt[pos] = nxt[np];
    if (nxt[np] >= 0) prv[nxt[np]] = pos;
    if (prv[pos] >= 0) push_pair(prv[pos]);
    push_pair(pos);
  }
  size_t w = 0;
  for (size_t i = 0; i < n; i = static_cast<size_t>(nxt[i])) {
    toks[w++] = toks[i];
    if (nxt[i] < 0) break;
  }
  toks.resize(w);
}

// Priority entry point: with boundaries, each segment merges independently —
// short segments (the pre-split common case) use the naive window merge,
// long ones a heap over just that window (copied out, heap applied, copied
// back via the shared out buffer).
void encode_tokens_priority(const Encoder& e, std::vector<int32_t>& toks,
                            const std::vector<uint8_t>* bound = nullptr) {
  size_t n = toks.size();
  if (n < 2 || e.rules.empty()) return;
  if (!bound) {
    priority_merge_heap(e, toks);
    return;
  }
  std::vector<int32_t> out;
  out.reserve(n);
  std::vector<int32_t> window;
  size_t i = 0;
  while (i < n) {
    size_t j = i + 1;
    while (j < n && !(*bound)[j]) ++j;
    if (j - i <= 64) {
      priority_merge_window(e, toks, i, j, out);
    } else {
      window.assign(toks.begin() + i, toks.begin() + j);
      priority_merge_heap(e, window);
      out.insert(out.end(), window.begin(), window.end());
    }
    i = j;
  }
  toks.swap(out);
}

// Tokenizes utf8[0:len) into interned token ids (read-only w.r.t. the
// Encoder — safe to call concurrently). Default policy: same fixpoint
// multi-pass first-match merge application as the python reference
// (hyperbolic_merge.py:414-446); policy 1 = priority (BPE rank) order.
//
// ``seg_starts`` (optional): sorted byte offsets (relative to utf8) where
// pre-split segments begin; merges never cross a segment start. Equivalent
// to encoding each segment separately and concatenating, without the
// per-segment call overhead.
void encode_tokens(const Encoder& e, const char* utf8, size_t len,
                   std::vector<int32_t>& toks, std::string& buf,
                   const int64_t* seg_starts = nullptr,
                   int64_t n_segs = 0,
                   std::vector<uint8_t>* bound_ws = nullptr,
                   std::vector<uint8_t>* byte_bound_ws = nullptr) {
  toks.clear();
  toks.reserve(len);
  // Byte-level segment-start flags: from explicit offsets, or computed by
  // the native ASCII segmenter when a presplit mode is configured.
  const std::vector<uint8_t>* byte_bound = nullptr;
  if (!seg_starts && e.presplit != 0 && byte_bound_ws && len > 0) {
    if (e.presplit == 1) {
      seg::whitespace_bounds(utf8, len, *byte_bound_ws);
    } else {
      seg::words_bounds(utf8, len, *byte_bound_ws);
    }
    byte_bound = byte_bound_ws;
  }
  std::vector<uint8_t>* bound = nullptr;
  if ((byte_bound || (seg_starts && n_segs > 0)) && bound_ws) {
    bound = bound_ws;
    bound->clear();
    bound->reserve(len);
  }

  size_t i = 0;
  int64_t seg_i = 0;
  while (i < len) {
    size_t n = utf8_len(static_cast<unsigned char>(utf8[i]));
    if (i + n > len) n = 1;
    buf.assign(utf8 + i, n);
    auto it = e.intern.find(buf);
    toks.push_back(it != e.intern.end() ? it->second : kUnknown);
    if (bound) {
      if (byte_bound) {
        bound->push_back((*byte_bound)[i]);
      } else {
        while (seg_i < n_segs &&
               seg_starts[seg_i] < static_cast<int64_t>(i)) {
          ++seg_i;
        }
        bound->push_back(seg_i < n_segs &&
                         seg_starts[seg_i] == static_cast<int64_t>(i));
      }
    }
    i += n;
  }

  if (e.policy == 1) {
    encode_tokens_priority(e, toks, bound);
    return;
  }

  bool changed = !toks.empty() && !e.rules.empty();
  if (!bound) {
    while (changed) {
      changed = false;
      size_t w = 0;  // write cursor (in-place compaction per pass)
      size_t r = 0;
      size_t n = toks.size();
      while (r < n) {
        int32_t cur = toks[r];
        // Cascade at this position: keep merging cur with the next token, as
        // the python loop does by not advancing i after a replacement.
        size_t nxt = r + 1;
        while (nxt < n) {
          auto it = e.rules.find(pair_key(cur, toks[nxt]));
          if (it == e.rules.end()) break;
          cur = it->second.merged;
          ++nxt;
          changed = true;
        }
        toks[w++] = cur;
        r = nxt;
      }
      toks.resize(w);
    }
    return;
  }
  // Fixpoint with segment boundaries: identical scan, but a pair whose right
  // element starts a segment never merges. Boundary flags compact alongside
  // tokens (a merged token inherits its left operand's flag).
  while (changed) {
    changed = false;
    size_t w = 0;
    size_t r = 0;
    size_t n = toks.size();
    while (r < n) {
      int32_t cur = toks[r];
      size_t nxt = r + 1;
      while (nxt < n && !(*bound)[nxt]) {
        auto it = e.rules.find(pair_key(cur, toks[nxt]));
        if (it == e.rules.end()) break;
        cur = it->second.merged;
        ++nxt;
        changed = true;
      }
      toks[w] = cur;
      (*bound)[w] = (*bound)[r];
      ++w;
      r = nxt;
    }
    toks.resize(w);
    bound->resize(w);
  }
}

inline int32_t to_vocab_id(const Encoder& e, int32_t tok) {
  int32_t v = tok >= 0 ? e.out_id[tok] : -1;
  return v >= 0 ? v : e.unk_id;
}

}  // namespace

extern "C" {

void* he_create() { return new Encoder(); }

void he_destroy(void* h) { delete static_cast<Encoder*>(h); }

void he_add_vocab(void* h, const char* token, int32_t vocab_id) {
  auto* e = static_cast<Encoder*>(h);
  int32_t id = e->intern_token(token);
  e->out_id[id] = vocab_id;
}

void he_add_rule(void* h, const char* left, const char* right,
                 const char* merged) {
  auto* e = static_cast<Encoder*>(h);
  int32_t a = e->intern_token(left);
  int32_t b = e->intern_token(right);
  int32_t m = e->intern_token(merged);
  int32_t rank = e->n_rules++;
  auto [it, inserted] = e->rules.emplace(pair_key(a, b), Rule{m, rank, m});
  if (!inserted) {
    // Fixpoint: later duplicates overwrite (dict semantics,
    // hyperbolic_merge.py:425-428). Priority: the first rank/merged wins
    // (an earlier rank always fires before a later duplicate could).
    it->second.merged = m;
  }
}

void he_set_unk(void* h, int32_t unk_id) {
  static_cast<Encoder*>(h)->unk_id = unk_id;
}

// 0 = fixpoint multi-pass first-match (reference semantics, default);
// 1 = priority-ordered (classic BPE by merge rank).
void he_set_policy(void* h, int32_t policy) {
  static_cast<Encoder*>(h)->policy = policy;
}

// Native ASCII pre-split: 0 = none, 1 = whitespace runs, 2 = GPT-2-style
// words (see tokenizer/normalize.py). Callers must route non-ASCII text
// through the python paths.
void he_set_presplit(void* h, int32_t mode) {
  static_cast<Encoder*>(h)->presplit = mode;
}

// Encodes utf8[0:len) into out (capacity cap). Returns the number of ids
// written, or -1 if cap is too small.
int32_t he_encode(void* h, const char* utf8, int32_t len, int32_t* out,
                  int32_t cap) {
  auto* e = static_cast<Encoder*>(h);
  std::vector<int32_t> toks;
  std::string buf;
  std::vector<uint8_t> bound_ws, byte_bound_ws;
  encode_tokens(*e, utf8, static_cast<size_t>(len), toks, buf, nullptr, 0,
                &bound_ws, &byte_bound_ws);
  if (static_cast<int32_t>(toks.size()) > cap) return -1;
  for (size_t k = 0; k < toks.size(); ++k) out[k] = to_vocab_id(*e, toks[k]);
  return static_cast<int32_t>(toks.size());
}

// Shared batch implementation; seg_starts/seg_ptr may be null (no
// pre-split). seg_starts holds byte offsets RELATIVE to each text's start;
// seg_ptr is a (n_texts+1) CSR index into seg_starts.
static int64_t encode_batch_impl(Encoder* e, const char* data,
                                 const int64_t* offsets, int32_t n_texts,
                                 int32_t n_threads,
                                 const int64_t* seg_starts,
                                 const int64_t* seg_ptr, int32_t* out,
                                 int64_t* out_offsets, int64_t cap) {
  if (n_texts <= 0) {
    if (out_offsets) out_offsets[0] = 0;
    return 0;
  }
  unsigned hw = std::thread::hardware_concurrency();
  size_t nt = n_threads > 0 ? static_cast<size_t>(n_threads)
                            : (hw ? hw : 1);
  nt = std::min(nt, static_cast<size_t>(n_texts));

  std::vector<std::vector<int32_t>> results(n_texts);
  auto worker = [&](size_t first, size_t last) {
    std::string buf;
    std::vector<uint8_t> bound_ws, byte_bound_ws;
    for (size_t t = first; t < last; ++t) {
      size_t len = static_cast<size_t>(offsets[t + 1] - offsets[t]);
      const int64_t* segs = nullptr;
      int64_t n_segs = 0;
      if (seg_starts && seg_ptr) {
        segs = seg_starts + seg_ptr[t];
        n_segs = seg_ptr[t + 1] - seg_ptr[t];
      }
      encode_tokens(*e, data + offsets[t], len, results[t], buf, segs,
                    n_segs, &bound_ws, &byte_bound_ws);
    }
  };
  if (nt <= 1) {
    worker(0, static_cast<size_t>(n_texts));
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    // Block partition: adjacent texts stay on one thread (cache-friendly for
    // line-shaped corpora where neighbours have similar cost).
    size_t per = (static_cast<size_t>(n_texts) + nt - 1) / nt;
    for (size_t k = 0; k < nt; ++k) {
      size_t first = k * per;
      size_t last = std::min(first + per, static_cast<size_t>(n_texts));
      if (first >= last) break;
      threads.emplace_back(worker, first, last);
    }
    for (auto& th : threads) th.join();
  }

  int64_t total = 0;
  out_offsets[0] = 0;
  for (int32_t t = 0; t < n_texts; ++t) {
    total += static_cast<int64_t>(results[t].size());
    out_offsets[t + 1] = total;
  }
  if (total > cap) return -1;
  for (int32_t t = 0; t < n_texts; ++t) {
    int32_t* dst = out + out_offsets[t];
    const auto& toks = results[t];
    for (size_t k = 0; k < toks.size(); ++k) dst[k] = to_vocab_id(*e, toks[k]);
  }
  return total;
}

// Encodes n_texts texts concatenated in data (text t = bytes
// offsets[t]..offsets[t+1]) using up to n_threads worker threads
// (0 = hardware concurrency). Writes ids to out and per-text boundaries to
// out_offsets[0..n_texts] (out_offsets[0] = 0). Returns the total id count,
// or -1 if it would exceed cap.
int64_t he_encode_batch(void* h, const char* data, const int64_t* offsets,
                        int32_t n_texts, int32_t n_threads, int32_t* out,
                        int64_t* out_offsets, int64_t cap) {
  return encode_batch_impl(static_cast<Encoder*>(h), data, offsets, n_texts,
                           n_threads, nullptr, nullptr, out, out_offsets,
                           cap);
}

// Batch encode with pre-split segment boundaries: seg_starts holds byte
// offsets (relative to each text's start, sorted) where segments begin;
// seg_ptr is a (n_texts+1) CSR index into seg_starts. Merges never cross a
// segment start — equivalent to encoding every segment separately, without
// per-segment FFI/allocation overhead.
int64_t he_encode_batch_seg(void* h, const char* data, const int64_t* offsets,
                            int32_t n_texts, int32_t n_threads,
                            const int64_t* seg_starts, const int64_t* seg_ptr,
                            int32_t* out, int64_t* out_offsets, int64_t cap) {
  return encode_batch_impl(static_cast<Encoder*>(h), data, offsets, n_texts,
                           n_threads, seg_starts, seg_ptr, out, out_offsets,
                           cap);
}

}  // extern "C"
