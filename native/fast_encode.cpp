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

// Classic BPE: merge the lowest-rank adjacent pair first (leftmost among
// equal ranks), until no rule applies. Doubly-linked list over positions +
// a lazily-validated min-heap of (rank, position) candidates: O(L log L).
void encode_tokens_priority(const Encoder& e, std::vector<int32_t>& toks) {
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

// Tokenizes utf8[0:len) into interned token ids (read-only w.r.t. the
// Encoder — safe to call concurrently). Default policy: same fixpoint
// multi-pass first-match merge application as the python reference
// (hyperbolic_merge.py:414-446); policy 1 = priority (BPE rank) order.
void encode_tokens(const Encoder& e, const char* utf8, size_t len,
                   std::vector<int32_t>& toks, std::string& buf) {
  toks.clear();
  toks.reserve(len);

  size_t i = 0;
  while (i < len) {
    size_t n = utf8_len(static_cast<unsigned char>(utf8[i]));
    if (i + n > len) n = 1;
    buf.assign(utf8 + i, n);
    auto it = e.intern.find(buf);
    toks.push_back(it != e.intern.end() ? it->second : kUnknown);
    i += n;
  }

  if (e.policy == 1) {
    encode_tokens_priority(e, toks);
    return;
  }

  bool changed = !toks.empty() && !e.rules.empty();
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

// Encodes utf8[0:len) into out (capacity cap). Returns the number of ids
// written, or -1 if cap is too small.
int32_t he_encode(void* h, const char* utf8, int32_t len, int32_t* out,
                  int32_t cap) {
  auto* e = static_cast<Encoder*>(h);
  std::vector<int32_t> toks;
  std::string buf;
  encode_tokens(*e, utf8, static_cast<size_t>(len), toks, buf);
  if (static_cast<int32_t>(toks.size()) > cap) return -1;
  for (size_t k = 0; k < toks.size(); ++k) out[k] = to_vocab_id(*e, toks[k]);
  return static_cast<int32_t>(toks.size());
}

// Encodes n_texts texts concatenated in data (text t = bytes
// offsets[t]..offsets[t+1]) using up to n_threads worker threads
// (0 = hardware concurrency). Writes ids to out and per-text boundaries to
// out_offsets[0..n_texts] (out_offsets[0] = 0). Returns the total id count,
// or -1 if it would exceed cap.
int64_t he_encode_batch(void* h, const char* data, const int64_t* offsets,
                        int32_t n_texts, int32_t n_threads, int32_t* out,
                        int64_t* out_offsets, int64_t cap) {
  auto* e = static_cast<Encoder*>(h);
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
    for (size_t t = first; t < last; ++t) {
      size_t len = static_cast<size_t>(offsets[t + 1] - offsets[t]);
      encode_tokens(*e, data + offsets[t], len, results[t], buf);
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

}  // extern "C"
