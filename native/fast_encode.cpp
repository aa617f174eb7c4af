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
// Internally tokens are interned to int32 ids; unknown codepoints get
// distinct negative ids (they can never match a rule, since every rule
// operand is an interned vocab string) and map to <unk> on output.
//
// C ABI (ctypes-friendly): he_create / he_add_rule / he_add_vocab /
// he_set_unk / he_encode / he_destroy. See hyptokenizer_tpu/tokenizer/
// encode.py for the python binding.

#include <cstdint>
#include <cstring>
#include <string>
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

struct Encoder {
  std::unordered_map<std::string, int32_t> intern;   // token string -> intern id
  std::vector<int32_t> out_id;                       // intern id -> vocab id (-1 unk)
  std::unordered_map<uint64_t, int32_t, PairHash> rules;  // (a,b) -> merged
  int32_t unk_id = 3;

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
  // Later duplicates overwrite (dict semantics, hyperbolic_merge.py:425-428).
  e->rules[pair_key(a, b)] = m;
}

void he_set_unk(void* h, int32_t unk_id) {
  static_cast<Encoder*>(h)->unk_id = unk_id;
}

// Encodes utf8[0:len) into out (capacity cap). Returns the number of ids
// written, or -1 if cap is too small.
int32_t he_encode(void* h, const char* utf8, int32_t len, int32_t* out,
                  int32_t cap) {
  auto* e = static_cast<Encoder*>(h);
  std::vector<int32_t> toks;
  toks.reserve(static_cast<size_t>(len));

  // Codepoint split + intern lookup (unknown codepoints are interned too, so
  // repeated unknowns are cheap; their out_id stays -1).
  size_t i = 0;
  std::string buf;
  while (i < static_cast<size_t>(len)) {
    size_t n = utf8_len(static_cast<unsigned char>(utf8[i]));
    if (i + n > static_cast<size_t>(len)) n = 1;
    buf.assign(utf8 + i, n);
    toks.push_back(e->intern_token(buf));
    i += n;
  }

  // Fixpoint multi-pass first-match merge application.
  bool changed = !toks.empty() && !e->rules.empty();
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
        auto it = e->rules.find(pair_key(cur, toks[nxt]));
        if (it == e->rules.end()) break;
        cur = it->second;
        ++nxt;
        changed = true;
      }
      toks[w++] = cur;
      r = nxt;
    }
    toks.resize(w);
  }

  if (static_cast<int32_t>(toks.size()) > cap) return -1;
  for (size_t k = 0; k < toks.size(); ++k) {
    int32_t v = e->out_id[toks[k]];
    out[k] = v >= 0 ? v : e->unk_id;
  }
  return static_cast<int32_t>(toks.size());
}

}  // extern "C"
