// Native host-side tokenization kernels.
//
// The reference leans on HF tokenizers' Rust BPE for its hot host loop
// (SURVEY.md section 2.2). This library is our native equivalent for the two
// offline-capable paths:
//   * FNV-1a hashing tokenizer (deterministic, vocab-free) — mirrors
//     data/tokenizers.py HashTokenizer bit-for-bit;
//   * greedy longest-match WordPiece over a vocab.txt (BERT layout) with
//     basic whitespace+punctuation pre-tokenization and lowercasing.
//
// Exposed as a C ABI consumed via ctypes (data/native.py). Build:
//   g++ -O3 -shared -fPIC -std=c++17 tokenizer.cpp -o libsmtc_tokenizer.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <fstream>
#include <cctype>

extern "C" {

// ---------------------------------------------------------------------------
// FNV-1a hashing tokenizer
// ---------------------------------------------------------------------------

static inline uint32_t fnv1a(const char* s, size_t n) {
  uint32_t h = 2166136261u;
  for (size_t i = 0; i < n; ++i) {
    h ^= (uint8_t)s[i];
    h *= 16777619u;
  }
  return h;
}

// texts: concatenated UTF-8 buffer; offsets[n+1] delimit each text.
// out_ids/out_mask: (n, max_len) int32, caller-allocated.
void hash_encode_batch(const char* buf, const int64_t* offsets, int64_t n,
                       int32_t max_len, int32_t vocab_size, int32_t pad_id,
                       int32_t cls_id, int32_t sep_id, int32_t* out_ids,
                       int32_t* out_mask) {
  for (int64_t i = 0; i < n; ++i) {
    const char* s = buf + offsets[i];
    const char* end = buf + offsets[i + 1];
    int32_t* ids = out_ids + i * max_len;
    int32_t* mask = out_mask + i * max_len;
    for (int32_t j = 0; j < max_len; ++j) { ids[j] = pad_id; mask[j] = 0; }
    int32_t pos = 0;
    ids[pos] = cls_id; mask[pos] = 1; ++pos;
    const char* tok = s;
    while (tok < end && pos < max_len - 1) {
      while (tok < end && std::isspace((unsigned char)*tok)) ++tok;
      const char* tstart = tok;
      while (tok < end && !std::isspace((unsigned char)*tok)) ++tok;
      if (tok > tstart) {
        uint32_t h = fnv1a(tstart, (size_t)(tok - tstart));
        ids[pos] = 4 + (int32_t)(h % (uint32_t)(vocab_size - 4));
        mask[pos] = 1;
        ++pos;
      }
    }
    ids[pos] = sep_id; mask[pos] = 1;
  }
}

// ---------------------------------------------------------------------------
// WordPiece
// ---------------------------------------------------------------------------

struct WordPiece {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk = 100, cls = 101, sep = 102, pad = 0;
  int32_t max_chars_per_word = 100;
};

void* wp_load(const char* vocab_path) {
  auto* wp = new WordPiece();
  std::ifstream in(vocab_path);
  if (!in) { delete wp; return nullptr; }
  std::string line;
  int32_t idx = 0;
  while (std::getline(in, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    wp->vocab.emplace(line, idx++);
  }
  auto get = [&](const char* t, int32_t dflt) {
    auto it = wp->vocab.find(t);
    return it == wp->vocab.end() ? dflt : it->second;
  };
  wp->unk = get("[UNK]", 100);
  wp->cls = get("[CLS]", 101);
  wp->sep = get("[SEP]", 102);
  wp->pad = get("[PAD]", 0);
  return wp;
}

void wp_free(void* handle) { delete (WordPiece*)handle; }

static void wp_word(const WordPiece& wp, const std::string& word,
                    std::vector<int32_t>& out) {
  if ((int32_t)word.size() > wp.max_chars_per_word) { out.push_back(wp.unk); return; }
  size_t start = 0;
  std::vector<int32_t> pieces;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = wp.vocab.find(sub);
      if (it != wp.vocab.end()) { cur = it->second; break; }
      --end;
    }
    if (cur < 0) { out.push_back(wp.unk); return; }
    pieces.push_back(cur);
    start = end;
  }
  out.insert(out.end(), pieces.begin(), pieces.end());
}

// Basic tokenization (lowercase, split on space + punctuation) then WordPiece.
void wp_encode_batch(void* handle, const char* buf, const int64_t* offsets,
                     int64_t n, int32_t max_len, int32_t* out_ids,
                     int32_t* out_mask, int32_t* out_type_ids) {
  const WordPiece& wp = *(WordPiece*)handle;
  std::vector<int32_t> toks;
  std::string word;
  for (int64_t i = 0; i < n; ++i) {
    const char* s = buf + offsets[i];
    const char* end = buf + offsets[i + 1];
    toks.clear();
    word.clear();
    auto flush = [&]() {
      if (!word.empty()) { wp_word(wp, word, toks); word.clear(); }
    };
    for (const char* c = s; c < end; ++c) {
      unsigned char ch = (unsigned char)*c;
      if (std::isspace(ch)) { flush(); }
      else if (ch < 128 && std::ispunct(ch)) {
        flush();
        word.assign(1, (char)ch);
        flush();
      } else {
        word.push_back(ch < 128 ? (char)std::tolower(ch) : (char)ch);
      }
    }
    flush();
    int32_t* ids = out_ids + i * max_len;
    int32_t* mask = out_mask + i * max_len;
    int32_t* tts = out_type_ids ? out_type_ids + i * max_len : nullptr;
    for (int32_t j = 0; j < max_len; ++j) {
      ids[j] = wp.pad; mask[j] = 0;
      if (tts) tts[j] = 0;
    }
    int32_t pos = 0;
    ids[pos] = wp.cls; mask[pos] = 1; ++pos;
    for (size_t t = 0; t < toks.size() && pos < max_len - 1; ++t) {
      ids[pos] = toks[t]; mask[pos] = 1; ++pos;
    }
    ids[pos] = wp.sep; mask[pos] = 1;
  }
}

}  // extern "C"
