// First-party ARPA n-gram language model scorer (C ABI, ctypes-bound).
//
// TPU-native replacement for the kenlm C++ dependency the reference uses
// for second-pass rescoring (reference model.py:13, 755, 1107) and for the
// incremental BaseScore state machine of its first-pass-LM decode
// (model.py:1131-1180).  Scoring semantics match kenlm's Python API:
//   score(sentence, bos, eos)  -> sum of log10 conditional probabilities
//                                 with Katz backoff, <s> context if bos,
//                                 plus p(</s> | ...) if eos
//   base_score(state, word)    -> incremental single-word score + new state
// OOV words map to <unk>.
//
// Design: one exact-key hash table over all n-grams (no probing tricks —
// correctness first; the host side of rescoring is not the bottleneck),
// a string->id vocab hash, and a batched scoring entry point so a whole
// n-best list is scored in one FFI call.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxOrder = 8;

struct NgramKey {
  uint8_t len = 0;
  uint32_t ids[kMaxOrder] = {0};

  bool operator==(const NgramKey& o) const {
    if (len != o.len) return false;
    return std::memcmp(ids, o.ids, len * sizeof(uint32_t)) == 0;
  }
};

struct NgramKeyHash {
  size_t operator()(const NgramKey& k) const {
    // FNV-1a over the used prefix
    uint64_t h = 1469598103934665603ull;
    const unsigned char* p = reinterpret_cast<const unsigned char*>(k.ids);
    for (size_t i = 0; i < k.len * sizeof(uint32_t); ++i) {
      h ^= p[i];
      h *= 1099511628211ull;
    }
    h ^= k.len;
    h *= 1099511628211ull;
    return static_cast<size_t>(h);
  }
};

struct Entry {
  float logp = 0.f;      // log10 probability
  float backoff = 0.f;   // log10 backoff weight (0 if none)
};

struct Model {
  int order = 0;
  std::unordered_map<std::string, uint32_t> vocab;
  std::unordered_map<NgramKey, Entry, NgramKeyHash> grams;
  uint32_t unk_id = 0, bos_id = 0, eos_id = 0;
  bool has_unk = false;
};

uint32_t intern(Model* m, const std::string& w) {
  auto it = m->vocab.find(w);
  if (it != m->vocab.end()) return it->second;
  uint32_t id = static_cast<uint32_t>(m->vocab.size());
  m->vocab.emplace(w, id);
  return id;
}

// p(w | ctx) with backoff; ctx is the most recent (left-to-right) history.
double score_one(const Model* m, const uint32_t* ctx, int ctx_len,
                 uint32_t w) {
  if (ctx_len > m->order - 1) {
    ctx += ctx_len - (m->order - 1);
    ctx_len = m->order - 1;
  }
  double backoff_sum = 0.0;
  for (int use = ctx_len; use >= 0; --use) {
    NgramKey k;
    k.len = static_cast<uint8_t>(use + 1);
    for (int i = 0; i < use; ++i) k.ids[i] = ctx[ctx_len - use + i];
    k.ids[use] = w;
    auto it = m->grams.find(k);
    if (it != m->grams.end()) {
      return backoff_sum + it->second.logp;
    }
    if (use > 0) {
      // add backoff weight of the context we are abandoning
      NgramKey c;
      c.len = static_cast<uint8_t>(use);
      for (int i = 0; i < use; ++i) c.ids[i] = ctx[ctx_len - use + i];
      auto cit = m->grams.find(c);
      if (cit != m->grams.end()) backoff_sum += cit->second.backoff;
    }
  }
  // even the unigram is missing (word outside ARPA): fall back to <unk>
  if (m->has_unk) {
    NgramKey k;
    k.len = 1;
    k.ids[0] = m->unk_id;
    auto it = m->grams.find(k);
    if (it != m->grams.end()) return backoff_sum + it->second.logp;
  }
  return -100.0;  // hard floor, should not happen with well-formed ARPA
}

// next state = last min(order-1, ctx_len+1) words of (ctx + w)
void advance_state(const Model* m, const uint32_t* ctx, int ctx_len,
                   uint32_t w, uint32_t* out, int* out_len) {
  int keep = m->order - 1;
  std::vector<uint32_t> h(ctx, ctx + ctx_len);
  h.push_back(w);
  int start = static_cast<int>(h.size()) > keep
                  ? static_cast<int>(h.size()) - keep : 0;
  int n = static_cast<int>(h.size()) - start;
  for (int i = 0; i < n; ++i) out[i] = h[start + i];
  *out_len = n;
}

double score_ids(const Model* m, const uint32_t* ids, int n, int bos,
                 int eos) {
  uint32_t ctx[2 * kMaxOrder];
  int ctx_len = 0;
  if (bos) ctx[ctx_len++] = m->bos_id;
  double total = 0.0;
  for (int i = 0; i < n; ++i) {
    total += score_one(m, ctx, ctx_len, ids[i]);
    uint32_t nxt[kMaxOrder];
    int nlen = 0;
    advance_state(m, ctx, ctx_len, ids[i], nxt, &nlen);
    std::memcpy(ctx, nxt, nlen * sizeof(uint32_t));
    ctx_len = nlen;
  }
  if (eos) total += score_one(m, ctx, ctx_len, m->eos_id);
  return total;
}

// ---------------------------------------------------------------------------
// ARPA parsing
// ---------------------------------------------------------------------------
bool parse_arpa(Model* m, FILE* f) {
  char buf[1 << 16];
  std::vector<uint64_t> counts;
  // header
  bool in_data = false;
  while (std::fgets(buf, sizeof(buf), f)) {
    std::string line(buf);
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    if (line == "\\data\\") { in_data = true; continue; }
    if (in_data) {
      if (line.rfind("ngram ", 0) == 0) {
        // "ngram N=count"
        const char* eq = std::strchr(line.c_str(), '=');
        if (eq) counts.push_back(std::strtoull(eq + 1, nullptr, 10));
        continue;
      }
      if (!line.empty() && line[0] == '\\') {
        // first "\N-grams:" section header
        break;
      }
    }
  }
  if (counts.empty()) return false;
  m->order = static_cast<int>(counts.size());
  if (m->order > kMaxOrder) return false;
  uint64_t total = 0;
  for (uint64_t c : counts) total += c;
  m->grams.reserve(total * 2);

  // we are positioned just after reading a section header line in buf
  int cur_order = 0;
  {
    std::string line(buf);
    if (line.size() > 2 && line[0] == '\\')
      cur_order = std::atoi(line.c_str() + 1);
  }
  std::vector<char*> toks;
  while (cur_order >= 1 && cur_order <= m->order) {
    if (!std::fgets(buf, sizeof(buf), f)) break;
    // strip newline
    size_t len = std::strlen(buf);
    while (len && (buf[len - 1] == '\n' || buf[len - 1] == '\r'))
      buf[--len] = 0;
    if (len == 0) continue;
    if (buf[0] == '\\') {
      if (std::strcmp(buf, "\\end\\") == 0) break;
      cur_order = std::atoi(buf + 1);
      continue;
    }
    // line: logp \t w1 [w2 ...] [\t backoff]
    toks.clear();
    for (char* p = std::strtok(buf, " \t"); p; p = std::strtok(nullptr, " \t"))
      toks.push_back(p);
    if (static_cast<int>(toks.size()) < cur_order + 1) continue;
    Entry e;
    e.logp = std::strtof(toks[0], nullptr);
    bool has_backoff =
        static_cast<int>(toks.size()) >= cur_order + 2;
    if (has_backoff) e.backoff = std::strtof(toks[cur_order + 1], nullptr);
    NgramKey k;
    k.len = static_cast<uint8_t>(cur_order);
    for (int i = 0; i < cur_order; ++i)
      k.ids[i] = intern(m, toks[1 + i]);
    m->grams[k] = e;
  }

  auto it = m->vocab.find("<unk>");
  if (it != m->vocab.end()) { m->unk_id = it->second; m->has_unk = true; }
  m->bos_id = intern(m, "<s>");
  m->eos_id = intern(m, "</s>");
  return true;
}

}  // namespace

extern "C" {

void* lm_load_arpa(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  Model* m = new Model();
  bool ok = parse_arpa(m, f);
  std::fclose(f);
  if (!ok) { delete m; return nullptr; }
  return m;
}

void lm_free(void* h) { delete static_cast<Model*>(h); }

int32_t lm_order(void* h) { return static_cast<Model*>(h)->order; }

int64_t lm_num_ngrams(void* h) {
  return static_cast<int64_t>(static_cast<Model*>(h)->grams.size());
}

// returns id, or the <unk> id for OOV (-1 if no <unk> in the model)
int64_t lm_vocab_id(void* h, const char* word) {
  Model* m = static_cast<Model*>(h);
  auto it = m->vocab.find(word);
  if (it != m->vocab.end()) return it->second;
  return m->has_unk ? static_cast<int64_t>(m->unk_id) : -1;
}

double lm_score_ids(void* h, const uint32_t* ids, int32_t n, int32_t bos,
                    int32_t eos) {
  return score_ids(static_cast<Model*>(h), ids, n, bos, eos);
}

// Batched scoring: sentences given as a flat id array + offsets[n+1].
void lm_score_batch(void* h, const uint32_t* flat, const int64_t* offsets,
                    int32_t n_sents, int32_t bos, int32_t eos, double* out) {
  Model* m = static_cast<Model*>(h);
  for (int32_t i = 0; i < n_sents; ++i) {
    out[i] = score_ids(m, flat + offsets[i],
                       static_cast<int>(offsets[i + 1] - offsets[i]), bos,
                       eos);
  }
}

int32_t lm_state_capacity(void* h) {
  return static_cast<Model*>(h)->order - 1;
}

// Incremental API (kenlm BaseScore parity, reference model.py:1131-1180).
// in_state/out_state are caller-owned uint32 buffers of lm_state_capacity.
double lm_base_score(void* h, const uint32_t* in_state, int32_t in_len,
                     uint32_t word, uint32_t* out_state, int32_t* out_len) {
  Model* m = static_cast<Model*>(h);
  double s = score_one(m, in_state, in_len, word);
  advance_state(m, in_state, in_len, word, out_state, out_len);
  return s;
}

uint32_t lm_bos_id(void* h) { return static_cast<Model*>(h)->bos_id; }
uint32_t lm_eos_id(void* h) { return static_cast<Model*>(h)->eos_id; }

// Batched incremental scoring: n independent (state, word) pairs in one
// FFI crossing (for first-pass-LM beam decode, where every beam scores
// topn candidate continuations per step).
//   states:  [n, cap] uint32, lengths in state_lens
//   words:   [n]
//   out:     [n] log10 scores
// States are NOT advanced (candidates are hypothetical); use
// lm_advance_batch for the chosen survivors.
void lm_base_score_batch(void* h, const uint32_t* states,
                         const int32_t* state_lens, int32_t cap,
                         const uint32_t* words, int32_t n, double* out) {
  Model* m = static_cast<Model*>(h);
  for (int32_t i = 0; i < n; ++i) {
    out[i] = score_one(m, states + static_cast<int64_t>(i) * cap,
                       state_lens[i], words[i]);
  }
}

// Advance n states by one word each, in place.
void lm_advance_batch(void* h, uint32_t* states, int32_t* state_lens,
                      int32_t cap, const uint32_t* words, int32_t n) {
  Model* m = static_cast<Model*>(h);
  for (int32_t i = 0; i < n; ++i) {
    uint32_t nxt[kMaxOrder];
    int nlen = 0;
    uint32_t* s = states + static_cast<int64_t>(i) * cap;
    advance_state(m, s, state_lens[i], words[i], nxt, &nlen);
    std::memcpy(s, nxt, nlen * sizeof(uint32_t));
    state_lens[i] = nlen;
  }
}

}  // extern "C"
