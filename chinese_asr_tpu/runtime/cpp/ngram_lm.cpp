// First-party n-gram language model scorer (C ABI, ctypes-bound).
//
// TPU-native replacement for the kenlm C++ dependency the reference uses
// for second-pass rescoring (reference model.py:13, 755, 1107) and for the
// incremental BaseScore state machine of its first-pass-LM decode
// (model.py:1131-1180).  Scoring semantics match kenlm's Python API:
//   score(sentence, bos, eos)  -> sum of log10 conditional probabilities
//                                 with Katz backoff, <s> context if bos,
//                                 plus p(</s> | ...) if eos
//   base_score(state, word)    -> incremental single-word score + new state
// OOV words map to <unk>; with no <unk> in the model the unigram floor is
// -100 (kenlm's unknown_missing_logprob default), with context backoffs
// still applied.
//
// TWO on-disk formats load through the same handle:
//   * ARPA text  -> one exact-key hash table over all n-grams (correctness
//     first; host-side rescoring is not the bottleneck), a string->id
//     vocab hash, and batched scoring entry points so a whole n-best list
//     is scored in one FFI call.
//   * KenLM **binary** (.klm, PROBING layout) -> scored directly from the
//     memory image the way kenlm does: MurmurHash64A word hashes into the
//     probing vocab table, reversed-fold CombineWordHash n-gram keys into
//     per-order linear-probing tables.  This is the format of the
//     reference's shipped artifact zh_giga.no_cna_cmn.prune01244.klm
//     (reference gpd.py:121, main.py:126).  TRIE-family layouts
//     (bit-packed/quantized) are rejected with a convert hint.
//     lm_write_binary() is the matching build_binary equivalent, used both
//     as a converter and to validate the reader by roundtrip.
//
// KenLM binary layout implemented (from kenlm lm/binary_format.hh/cc,
// lm/vocab.hh/cc, lm/search_hashed.hh, util/probing_hash_table.hh):
//   [Sanity 88B]                magic[56] "mmap lm http://kheafield.com/
//                               code format version 5\n\0" zero-padded,
//                               f32 {0,1,-0.5}, u32 {1, 0xffffffff},
//                               pad4, u64 1
//   [FixedWidthParameters 20B]  u8 order, pad3, f32 probing_multiplier,
//                               i32 model_type (0=PROBING), u8 bool
//                               has_vocabulary, pad3, u32 search_version
//   [counts]                    order x u64, then pad to 8
//   [vocab]                     header {u64 version=0, u64 bound}, then a
//                               probing table of 12B {u64 murmur, u32 id}
//                               entries; buckets = max(c1+1, 1.5*c1);
//                               <unk> is NOT stored (lookup miss -> 0)
//   [search]                    unigram array (c1+2) x {f32 prob, f32
//                               backoff} indexed by word id; for n in
//                               2..order-1 a probing table of 16B
//                               {u64 key, f32 prob, f32 backoff}; longest
//                               order a probing table of 12B {u64 key,
//                               f32 prob}; all bucket counts
//                               max(cn+1, 1.5*cn), invalid key 0
//   [vocab words]               optional trailing "<unk>\0word\0..."
//                               (ignored on read; reader auto-detects the
//                               unigram +2/+1 slack via this marker)
// N-gram keys fold REVERSED (last word first, matching kenlm's
// ScoreExceptBackoff walking history backwards):
//   h = w[n-1]; for i = n-2..0: h = (h * 8978948897894561157) ^
//                                   ((1 + w[i]) * 17894857484156487943)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxOrder = 8;

// ---------------------------------------------------------------------------
// error reporting (ctypes has no exceptions)
// ---------------------------------------------------------------------------
thread_local std::string g_error;

void set_error(const std::string& e) { g_error = e; }

// ---------------------------------------------------------------------------
// ARPA model: exact-key hash table
// ---------------------------------------------------------------------------
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
  // kenlm synthesizes an <unk> unigram at unknown_missing_logprob (-100)
  // when the ARPA lacks one, so context backoffs still apply
  return backoff_sum - 100.0;
}

// next state = last min(order-1, ctx_len+1) words of (ctx + w)
void advance_state_impl(int order, const uint32_t* ctx, int ctx_len,
                        uint32_t w, uint32_t* out, int* out_len) {
  int keep = order - 1;
  std::vector<uint32_t> h(ctx, ctx + ctx_len);
  h.push_back(w);
  int start = static_cast<int>(h.size()) > keep
                  ? static_cast<int>(h.size()) - keep : 0;
  int n = static_cast<int>(h.size()) - start;
  for (int i = 0; i < n; ++i) out[i] = h[start + i];
  *out_len = n;
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

// ---------------------------------------------------------------------------
// KenLM binary (PROBING) format
// ---------------------------------------------------------------------------
const char kMagicBytes[] =
    "mmap lm http://kheafield.com/code format version 5\n";  // + implicit \0
constexpr size_t kMagicLen = sizeof(kMagicBytes);            // 52 incl. \0
constexpr size_t kMagicField = (kMagicLen + 7) & ~size_t(7); // ALIGN8 -> 56
constexpr size_t kSanitySize = kMagicField + 3 * 4 + 2 * 4 + 4 /*pad*/ + 8;
static_assert(kSanitySize == 88, "Sanity layout");
constexpr size_t kFixedParamsSize = 20;
constexpr float kProbingMultiplier = 1.5f;
constexpr int kVocabEntrySize = 12;    // {u64 murmur, u32 id}, pack(4)
constexpr int kMidEntrySize = 16;      // {u64 key, f32 prob, f32 backoff}
constexpr int kLongestEntrySize = 12;  // {u64 key, f32 prob}, pack(4)
constexpr size_t kVocabHeaderSize = 16;  // {u64 version=0, u64 bound}

inline size_t align8(size_t x) { return (x + 7) & ~size_t(7); }

inline size_t header_size(int order) {
  return align8(kSanitySize + kFixedParamsSize + 8 * size_t(order));
}

inline uint64_t probing_buckets(uint64_t entries) {
  // util::ProbingHashTable::Size: max(entries + 1, multiplier * entries)
  uint64_t mult = static_cast<uint64_t>(
      kProbingMultiplier * static_cast<float>(entries));
  return entries + 1 > mult ? entries + 1 : mult;
}

// util/murmur_hash.cc MurmurHash64A (Austin Appleby, public domain) —
// kenlm's HashForVocab is MurmurHash64A(word, len, 0)
uint64_t murmur64a(const void* key, size_t len, uint64_t seed) {
  const uint64_t m = 0xc6a4a7935bd1e995ull;
  const int r = 47;
  uint64_t h = seed ^ (len * m);
  const unsigned char* data = static_cast<const unsigned char*>(key);
  const unsigned char* end = data + (len / 8) * 8;
  while (data != end) {
    uint64_t k;
    std::memcpy(&k, data, 8);
    data += 8;
    k *= m; k ^= k >> r; k *= m;
    h ^= k; h *= m;
  }
  switch (len & 7) {
    case 7: h ^= uint64_t(data[6]) << 48; [[fallthrough]];
    case 6: h ^= uint64_t(data[5]) << 40; [[fallthrough]];
    case 5: h ^= uint64_t(data[4]) << 32; [[fallthrough]];
    case 4: h ^= uint64_t(data[3]) << 24; [[fallthrough]];
    case 3: h ^= uint64_t(data[2]) << 16; [[fallthrough]];
    case 2: h ^= uint64_t(data[1]) << 8;  [[fallthrough]];
    case 1: h ^= uint64_t(data[0]);
            h *= m;
  }
  h ^= h >> r; h *= m; h ^= h >> r;
  return h;
}

// lm/search_hashed.hh detail::CombineWordHash
inline uint64_t combine_word_hash(uint64_t current, uint32_t next) {
  return (current * 8978948897894561157ull) ^
         ((uint64_t(1) + next) * 17894857484156487943ull);
}

// reversed fold: last word is the hash seed (kenlm hashes from the
// predicted word backward through history)
uint64_t ngram_hash(const uint32_t* w, int n) {
  uint64_t h = w[n - 1];
  for (int i = n - 2; i >= 0; --i) h = combine_word_hash(h, w[i]);
  return h;
}

struct BinTable {
  const char* base = nullptr;
  uint64_t buckets = 0;
  int entry_size = 0;
};

struct BinModel {
  std::vector<char> data;            // whole file image
  int order = 0;
  uint64_t counts[kMaxOrder] = {0};
  BinTable vocab;                    // 12B entries
  const char* unigram = nullptr;     // (counts[0]+slack) x 8B prob/backoff
  BinTable mid[kMaxOrder];           // mid[n-2] for order n in 2..order-1
  BinTable longest;                  // 12B entries
  uint32_t bound = 0;                // 1 + highest assigned word id
  uint32_t bos_id = 0, eos_id = 0;
};

// probing find: bucket = key % buckets, linear probe, stop at key 0
bool probe_find(const BinTable& t, uint64_t key, float* prob,
                float* backoff) {
  if (!t.buckets) return false;
  uint64_t i = key % t.buckets;
  for (uint64_t n = 0; n <= t.buckets; ++n) {
    const char* e = t.base + i * t.entry_size;
    uint64_t k;
    std::memcpy(&k, e, 8);
    if (k == key) {
      if (prob) std::memcpy(prob, e + 8, 4);
      if (backoff) {
        if (t.entry_size >= 16) std::memcpy(backoff, e + 12, 4);
        else *backoff = 0.f;
      }
      return true;
    }
    if (k == 0) return false;
    if (++i == t.buckets) i = 0;
  }
  return false;  // table pathologically full
}

void probe_insert(char* base, uint64_t buckets, int entry_size,
                  uint64_t key, float prob, float backoff) {
  uint64_t i = key % buckets;
  for (;;) {
    char* e = base + i * entry_size;
    uint64_t k;
    std::memcpy(&k, e, 8);
    if (k == 0) {
      std::memcpy(e, &key, 8);
      std::memcpy(e + 8, &prob, 4);
      if (entry_size >= 16) std::memcpy(e + 12, &backoff, 4);
      return;
    }
    if (++i == buckets) i = 0;
  }
}

uint32_t bin_vocab_id(const BinModel* m, const char* word, size_t len) {
  uint64_t h = murmur64a(word, len, 0);
  uint64_t i = h % m->vocab.buckets;
  for (uint64_t n = 0; n <= m->vocab.buckets; ++n) {
    const char* e = m->vocab.base + i * kVocabEntrySize;
    uint64_t k;
    std::memcpy(&k, e, 8);
    if (k == h) {
      uint32_t id;
      std::memcpy(&id, e + 8, 4);
      return id;
    }
    if (k == 0) return 0;  // <unk>
    if (++i == m->vocab.buckets) i = 0;
  }
  return 0;
}

// p(w | ctx) with backoff over the probing tables (same walk as the ARPA
// score_one, hashed lookups instead of exact keys)
double bin_score_one(const BinModel* m, const uint32_t* ctx, int ctx_len,
                     uint32_t w) {
  if (ctx_len > m->order - 1) {
    ctx += ctx_len - (m->order - 1);
    ctx_len = m->order - 1;
  }
  uint64_t c1 = m->counts[0];
  double backoff_sum = 0.0;
  uint32_t key_buf[kMaxOrder];
  for (int use = ctx_len; use >= 0; --use) {
    const uint32_t* cctx = ctx + (ctx_len - use);
    int n = use + 1;
    bool found = false;
    float prob = 0.f;
    if (n == 1) {
      if (uint64_t(w) <= c1) {   // ids run 0..c1 (c1 when <unk> absent)
        std::memcpy(&prob, m->unigram + size_t(w) * 8, 4);
        found = true;            // every valid id has a unigram slot
      }
    } else {
      for (int i = 0; i < use; ++i) key_buf[i] = cctx[i];
      key_buf[use] = w;
      uint64_t h = ngram_hash(key_buf, n);
      const BinTable& t = (n == m->order) ? m->longest : m->mid[n - 2];
      found = probe_find(t, h, &prob, nullptr);
    }
    if (found) return backoff_sum + prob;
    if (use > 0) {
      // backoff weight of the abandoned context
      float bo = 0.f;
      if (use == 1) {
        uint32_t cw = cctx[0];
        if (uint64_t(cw) <= c1)
          std::memcpy(&bo, m->unigram + size_t(cw) * 8 + 4, 4);
      } else {
        uint64_t h = ngram_hash(cctx, use);
        probe_find(m->mid[use - 2], h, nullptr, &bo);
      }
      backoff_sum += bo;
    }
  }
  // unreachable for valid ids (unigram always hits); keep kenlm's floor
  return backoff_sum - 100.0;
}

BinModel* load_binary(FILE* f, long file_size) {
  std::unique_ptr<BinModel> m(new BinModel());
  m->data.resize(size_t(file_size));
  if (std::fread(m->data.data(), 1, size_t(file_size), f) !=
      size_t(file_size)) {
    set_error("short read");
    return nullptr;
  }
  const char* p = m->data.data();
  if (size_t(file_size) < kSanitySize + kFixedParamsSize) {
    set_error("file too small for a kenlm binary header");
    return nullptr;
  }
  if (std::memcmp(p, kMagicBytes, kMagicLen) != 0) {
    set_error("kenlm binary magic mismatch (unsupported format version; "
              "this reader implements 'format version 5')");
    return nullptr;
  }
  // sanity reference values (endianness / type-width check)
  float f0, f1, fm;
  std::memcpy(&f0, p + kMagicField, 4);
  std::memcpy(&f1, p + kMagicField + 4, 4);
  std::memcpy(&fm, p + kMagicField + 8, 4);
  if (f0 != 0.f || f1 != 1.f || fm != -0.5f) {
    set_error("kenlm binary sanity floats mismatch (foreign endianness?)");
    return nullptr;
  }
  const char* fp = p + kSanitySize;
  int order = static_cast<unsigned char>(fp[0]);
  int32_t model_type;
  std::memcpy(&model_type, fp + 8, 4);
  if (model_type != 0) {
    static const char* kNames[] = {"PROBING", "REST_PROBING", "TRIE",
                                   "QUANT_TRIE", "ARRAY_TRIE",
                                   "QUANT_ARRAY_TRIE"};
    std::string name = (model_type >= 0 && model_type < 6)
                           ? kNames[model_type] : "unknown";
    set_error("kenlm binary model_type " + std::to_string(model_type) +
              " (" + name + ") is not supported; only PROBING is. "
              "Rebuild with kenlm's `build_binary probing in.arpa out.klm`"
              " or load the ARPA directly.");
    return nullptr;
  }
  if (order < 1 || order > kMaxOrder) {
    set_error("unsupported order " + std::to_string(order));
    return nullptr;
  }
  m->order = order;
  if (size_t(file_size) < header_size(order) + align8(kVocabHeaderSize)) {
    set_error("kenlm binary truncated inside the header");
    return nullptr;
  }
  const char* cp = p + kSanitySize + kFixedParamsSize;
  for (int i = 0; i < order; ++i) {
    std::memcpy(&m->counts[i], cp + 8 * i, 8);
    // sanity before any bucket arithmetic: a corrupt count must fail
    // cleanly, not overflow size_t into out-of-bounds table pointers
    // (file_size/12 bounds any real entry count)
    if (m->counts[i] > uint64_t(file_size) / 12 + 1) {
      set_error("kenlm binary corrupt: ngram count " +
                std::to_string(m->counts[i]) + " exceeds file capacity");
      return nullptr;
    }
  }

  size_t off = header_size(order);
  // vocab: {u64 version, u64 bound} header + probing table
  uint64_t version, bound;
  std::memcpy(&version, p + off, 8);
  std::memcpy(&bound, p + off + 8, 8);
  if (version != 0 && bound == 0 && version <= m->counts[0] + 1) {
    // defensive: tolerate {bound, version} field order
    bound = version;
  }
  m->bound = static_cast<uint32_t>(bound);
  m->vocab.base = p + off + align8(kVocabHeaderSize);
  m->vocab.buckets = probing_buckets(m->counts[0]);
  m->vocab.entry_size = kVocabEntrySize;
  off += align8(kVocabHeaderSize) + m->vocab.buckets * kVocabEntrySize;

  // search: unigram + middles + longest.  kenlm allocates counts[0]+2
  // unigram slots ("+1 in case unknown doesn't appear, +1 slack"); accept
  // +1 layouts too by checking where the section chain ends (the file
  // either ends at the last table or continues with the vocab-words
  // section, whose first bytes are "<unk>\0").
  for (int slack = 2; slack >= 1; --slack) {
    size_t o = off + (m->counts[0] + slack) * 8;
    for (int n = 2; n < order; ++n)
      o += probing_buckets(m->counts[n - 1]) * kMidEntrySize;
    if (order >= 2) o += probing_buckets(m->counts[order - 1]) *
                         kLongestEntrySize;
    bool fits = o <= size_t(file_size);
    bool exact = o == size_t(file_size);
    bool words = fits && size_t(file_size) - o >= 6 &&
                 std::memcmp(p + o, "<unk>", 6) == 0;
    if (exact || words || slack == 1) {
      if (!fits) {
        set_error("kenlm binary truncated: section chain exceeds file");
        return nullptr;
      }
      m->unigram = p + off;
      size_t o2 = off + (m->counts[0] + slack) * 8;
      for (int n = 2; n < order; ++n) {
        m->mid[n - 2] = {p + o2, probing_buckets(m->counts[n - 1]),
                         kMidEntrySize};
        o2 += m->mid[n - 2].buckets * kMidEntrySize;
      }
      if (order >= 2) {
        m->longest = {p + o2, probing_buckets(m->counts[order - 1]),
                      kLongestEntrySize};
      }
      break;
    }
  }
  m->bos_id = bin_vocab_id(m.get(), "<s>", 3);
  m->eos_id = bin_vocab_id(m.get(), "</s>", 4);
  return m.release();
}

// ---------------------------------------------------------------------------
// binary writer (build_binary equivalent; also validates the reader)
// ---------------------------------------------------------------------------
bool write_binary(const Model* m, const char* path) {
  // kenlm-style word ids: <unk> -> 0, all other unigram-section words in
  // insertion order -> 1..  (intern order == unigram order: every word
  // appears in the ARPA unigram section first)
  std::vector<std::string> by_intern(m->vocab.size());
  for (const auto& kv : m->vocab) by_intern[kv.second] = kv.first;
  std::vector<uint32_t> remap(m->vocab.size(), 0);
  uint32_t next_id = 1;
  for (size_t i = 0; i < by_intern.size(); ++i) {
    if (m->has_unk && i == m->unk_id) { remap[i] = 0; continue; }
    remap[i] = next_id++;
  }
  uint64_t counts[kMaxOrder] = {0};
  for (const auto& kv : m->grams) counts[kv.first.len - 1]++;
  int order = m->order;

  size_t vocab_buckets = probing_buckets(counts[0]);
  size_t off_vocab = header_size(order);
  size_t off_search = off_vocab + align8(kVocabHeaderSize) +
                      vocab_buckets * kVocabEntrySize;
  size_t off_uni = off_search;
  size_t o = off_uni + (counts[0] + 2) * 8;
  size_t off_mid[kMaxOrder] = {0};
  uint64_t mid_buckets[kMaxOrder] = {0};
  for (int n = 2; n < order; ++n) {
    off_mid[n - 2] = o;
    mid_buckets[n - 2] = probing_buckets(counts[n - 1]);
    o += mid_buckets[n - 2] * kMidEntrySize;
  }
  size_t off_long = o;
  uint64_t long_buckets = order >= 2 ? probing_buckets(counts[order - 1]) : 0;
  o += long_buckets * kLongestEntrySize;

  std::vector<char> out(o, 0);
  char* p = out.data();
  // Sanity
  std::memcpy(p, kMagicBytes, kMagicLen);
  float f0 = 0.f, f1 = 1.f, fm = -0.5f;
  std::memcpy(p + kMagicField, &f0, 4);
  std::memcpy(p + kMagicField + 4, &f1, 4);
  std::memcpy(p + kMagicField + 8, &fm, 4);
  uint32_t one32 = 1, max32 = 0xffffffffu;
  std::memcpy(p + kMagicField + 12, &one32, 4);
  std::memcpy(p + kMagicField + 16, &max32, 4);
  uint64_t one64 = 1;
  std::memcpy(p + kSanitySize - 8, &one64, 8);
  // FixedWidthParameters
  char* fp = p + kSanitySize;
  fp[0] = static_cast<char>(order);
  std::memcpy(fp + 4, &kProbingMultiplier, 4);
  int32_t model_type = 0;  // PROBING
  std::memcpy(fp + 8, &model_type, 4);
  fp[12] = 0;  // has_vocabulary = false (reader side never needs strings)
  uint32_t search_version = 0;
  std::memcpy(fp + 16, &search_version, 4);
  for (int i = 0; i < order; ++i)
    std::memcpy(p + kSanitySize + kFixedParamsSize + 8 * i, &counts[i], 8);
  // vocab header + table
  uint64_t version = 0, bound = next_id;
  std::memcpy(p + off_vocab, &version, 8);
  std::memcpy(p + off_vocab + 8, &bound, 8);
  char* vtab = p + off_vocab + align8(kVocabHeaderSize);
  for (size_t i = 0; i < by_intern.size(); ++i) {
    if (m->has_unk && i == m->unk_id) continue;       // <unk> never stored
    // only unigram-section words are vocab entries
    NgramKey k;
    k.len = 1;
    k.ids[0] = static_cast<uint32_t>(i);
    if (m->grams.find(k) == m->grams.end()) continue;
    uint64_t h = murmur64a(by_intern[i].data(), by_intern[i].size(), 0);
    uint64_t b = h % vocab_buckets;
    for (;;) {
      char* e = vtab + b * kVocabEntrySize;
      uint64_t cur;
      std::memcpy(&cur, e, 8);
      if (cur == 0) {
        std::memcpy(e, &h, 8);
        std::memcpy(e + 8, &remap[i], 4);
        break;
      }
      if (++b == vocab_buckets) b = 0;
    }
  }
  // n-gram payloads
  uint32_t ids[kMaxOrder];
  for (const auto& kv : m->grams) {
    int n = kv.first.len;
    for (int i = 0; i < n; ++i) ids[i] = remap[kv.first.ids[i]];
    if (n == 1) {
      std::memcpy(p + off_uni + size_t(ids[0]) * 8, &kv.second.logp, 4);
      std::memcpy(p + off_uni + size_t(ids[0]) * 8 + 4, &kv.second.backoff,
                  4);
    } else if (n < order) {
      probe_insert(p + off_mid[n - 2], mid_buckets[n - 2], kMidEntrySize,
                   ngram_hash(ids, n), kv.second.logp, kv.second.backoff);
    } else {
      probe_insert(p + off_long, long_buckets, kLongestEntrySize,
                   ngram_hash(ids, n), kv.second.logp, 0.f);
    }
  }
  if (!m->has_unk) {
    // kenlm synthesizes <unk> at -100 when the ARPA lacks it
    float floor_p = -100.f, z = 0.f;
    std::memcpy(p + off_uni, &floor_p, 4);
    std::memcpy(p + off_uni + 4, &z, 4);
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) { set_error(std::string("cannot open for write: ") + path);
            return false; }
  bool ok = std::fwrite(out.data(), 1, out.size(), f) == out.size();
  std::fclose(f);
  if (!ok) set_error("short write");
  return ok;
}

// ---------------------------------------------------------------------------
// tagged handle: every C ABI entry point dispatches ARPA vs binary
// ---------------------------------------------------------------------------
struct Handle {
  Model* arpa = nullptr;
  BinModel* bin = nullptr;

  int order() const { return arpa ? arpa->order : bin->order; }
  uint32_t bos() const { return arpa ? arpa->bos_id : bin->bos_id; }
  uint32_t eos() const { return arpa ? arpa->eos_id : bin->eos_id; }
  double one(const uint32_t* ctx, int len, uint32_t w) const {
    return arpa ? score_one(arpa, ctx, len, w)
                : bin_score_one(bin, ctx, len, w);
  }
};

double score_ids_h(const Handle* h, const uint32_t* ids, int n, int bos,
                   int eos) {
  uint32_t ctx[2 * kMaxOrder];
  int ctx_len = 0;
  if (bos) ctx[ctx_len++] = h->bos();
  double total = 0.0;
  for (int i = 0; i < n; ++i) {
    total += h->one(ctx, ctx_len, ids[i]);
    uint32_t nxt[kMaxOrder];
    int nlen = 0;
    advance_state_impl(h->order(), ctx, ctx_len, ids[i], nxt, &nlen);
    std::memcpy(ctx, nxt, nlen * sizeof(uint32_t));
    ctx_len = nlen;
  }
  if (eos) total += h->one(ctx, ctx_len, h->eos());
  return total;
}

}  // namespace

extern "C" {

const char* lm_last_error() { return g_error.c_str(); }

void* lm_load_arpa(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { set_error(std::string("cannot open: ") + path); return nullptr; }
  // auto-detect: kenlm binaries start with the mmap magic
  char magic[8] = {0};
  size_t got = std::fread(magic, 1, 7, f);
  std::rewind(f);
  if (got == 7 && std::memcmp(magic, "mmap lm", 7) == 0) {
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::rewind(f);
    BinModel* bm = load_binary(f, size);
    std::fclose(f);
    if (!bm) return nullptr;
    Handle* h = new Handle();
    h->bin = bm;
    return h;
  }
  Model* m = new Model();
  bool ok = parse_arpa(m, f);
  std::fclose(f);
  if (!ok) { delete m; set_error("ARPA parse failed"); return nullptr; }
  Handle* h = new Handle();
  h->arpa = m;
  return h;
}

// write an ARPA-loaded model as a kenlm PROBING binary (.klm)
int32_t lm_write_binary(void* hv, const char* path) {
  Handle* h = static_cast<Handle*>(hv);
  if (!h->arpa) { set_error("write_binary needs an ARPA-loaded model");
                  return 0; }
  return write_binary(h->arpa, path) ? 1 : 0;
}

void lm_free(void* hv) {
  Handle* h = static_cast<Handle*>(hv);
  delete h->arpa;
  delete h->bin;
  delete h;
}

int32_t lm_order(void* h) { return static_cast<Handle*>(h)->order(); }

int64_t lm_num_ngrams(void* hv) {
  Handle* h = static_cast<Handle*>(hv);
  if (h->arpa) return static_cast<int64_t>(h->arpa->grams.size());
  int64_t total = 0;
  for (int i = 0; i < h->bin->order; ++i)
    total += static_cast<int64_t>(h->bin->counts[i]);
  return total;
}

// returns id, or the <unk> id for OOV (-1 if no <unk> in an ARPA model;
// binary models always resolve misses to 0 like kenlm)
int64_t lm_vocab_id(void* hv, const char* word) {
  Handle* h = static_cast<Handle*>(hv);
  if (h->bin)
    return bin_vocab_id(h->bin, word, std::strlen(word));
  Model* m = h->arpa;
  auto it = m->vocab.find(word);
  if (it != m->vocab.end()) return it->second;
  return m->has_unk ? static_cast<int64_t>(m->unk_id) : -1;
}

double lm_score_ids(void* h, const uint32_t* ids, int32_t n, int32_t bos,
                    int32_t eos) {
  return score_ids_h(static_cast<Handle*>(h), ids, n, bos, eos);
}

// Batched scoring: sentences given as a flat id array + offsets[n+1].
void lm_score_batch(void* hv, const uint32_t* flat, const int64_t* offsets,
                    int32_t n_sents, int32_t bos, int32_t eos, double* out) {
  Handle* h = static_cast<Handle*>(hv);
  for (int32_t i = 0; i < n_sents; ++i) {
    out[i] = score_ids_h(h, flat + offsets[i],
                         static_cast<int>(offsets[i + 1] - offsets[i]), bos,
                         eos);
  }
}

int32_t lm_state_capacity(void* h) {
  return static_cast<Handle*>(h)->order() - 1;
}

// Incremental API (kenlm BaseScore parity, reference model.py:1131-1180).
// in_state/out_state are caller-owned uint32 buffers of lm_state_capacity.
double lm_base_score(void* hv, const uint32_t* in_state, int32_t in_len,
                     uint32_t word, uint32_t* out_state, int32_t* out_len) {
  Handle* h = static_cast<Handle*>(hv);
  double s = h->one(in_state, in_len, word);
  advance_state_impl(h->order(), in_state, in_len, word, out_state, out_len);
  return s;
}

uint32_t lm_bos_id(void* h) { return static_cast<Handle*>(h)->bos(); }
uint32_t lm_eos_id(void* h) { return static_cast<Handle*>(h)->eos(); }

// Batched incremental scoring: n independent (state, word) pairs in one
// FFI crossing (for first-pass-LM beam decode, where every beam scores
// topn candidate continuations per step).
//   states:  [n, cap] uint32, lengths in state_lens
//   words:   [n]
//   out:     [n] log10 scores
// States are NOT advanced (candidates are hypothetical); use
// lm_advance_batch for the chosen survivors.
void lm_base_score_batch(void* hv, const uint32_t* states,
                         const int32_t* state_lens, int32_t cap,
                         const uint32_t* words, int32_t n, double* out) {
  Handle* h = static_cast<Handle*>(hv);
  for (int32_t i = 0; i < n; ++i) {
    out[i] = h->one(states + static_cast<int64_t>(i) * cap,
                    state_lens[i], words[i]);
  }
}

// Advance n states by one word each, in place.
void lm_advance_batch(void* hv, uint32_t* states, int32_t* state_lens,
                      int32_t cap, const uint32_t* words, int32_t n) {
  Handle* h = static_cast<Handle*>(hv);
  int order = h->order();
  for (int32_t i = 0; i < n; ++i) {
    uint32_t nxt[kMaxOrder];
    int nlen = 0;
    uint32_t* s = states + static_cast<int64_t>(i) * cap;
    advance_state_impl(order, s, state_lens[i], words[i], nxt, &nlen);
    std::memcpy(s, nxt, nlen * sizeof(uint32_t));
    state_lens[i] = nlen;
  }
}

}  // extern "C"
