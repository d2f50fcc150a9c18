// Native CLIP BPE tokenizer engine.
//
// The reference tokenizes every benchmark prompt in Python through HF
// CLIPTokenizer / the vendored OpenCLIP SimpleTokenizer (open_clip/
// tokenizer.py). For 10k-30k-prompt benchmark sweeps that is the only
// CPU-bound inner loop the host runs between TPU dispatches, so this
// framework provides a C++ engine with a C ABI consumed via ctypes
// (safe_denoiser_tpu/text/native.py). Semantics mirror
// safe_denoiser_tpu/text/clip_tokenizer.py exactly (the Python
// implementation remains the reference and the fallback).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 bpe_tokenizer.cpp -o libsdtbpe.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// GPT-2 byte -> unicode codepoint table (reversible BPE alphabet).
std::vector<uint32_t> byte_to_unicode() {
  std::vector<uint32_t> table(256, 0);
  std::vector<bool> direct(256, false);
  for (int b = '!'; b <= '~'; ++b) direct[b] = true;
  for (int b = 0xA1; b <= 0xAC; ++b) direct[b] = true;
  for (int b = 0xAE; b <= 0xFF; ++b) direct[b] = true;
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (direct[b]) {
      table[b] = static_cast<uint32_t>(b);
    } else {
      table[b] = 256 + n;
      ++n;
    }
  }
  return table;
}

void append_utf8(std::string* out, uint32_t cp) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// Decode one UTF-8 codepoint; advances *i.
uint32_t next_cp(const std::string& s, size_t* i) {
  unsigned char c = s[*i];
  uint32_t cp;
  int extra;
  if (c < 0x80) {
    cp = c;
    extra = 0;
  } else if ((c >> 5) == 0x6) {
    cp = c & 0x1F;
    extra = 1;
  } else if ((c >> 4) == 0xE) {
    cp = c & 0x0F;
    extra = 2;
  } else {
    cp = c & 0x07;
    extra = 3;
  }
  ++*i;
  for (int k = 0; k < extra && *i < s.size(); ++k, ++*i) {
    cp = (cp << 6) | (s[*i] & 0x3F);
  }
  return cp;
}

bool is_ws(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f' ||
         cp == '\v' || cp == 0xA0 || cp == 0x2028 || cp == 0x2029 ||
         (cp >= 0x2000 && cp <= 0x200A) || cp == 0x3000 || cp == 0x1680 ||
         cp == 0x205F;
}
// Letter class of the Python tokenizer's pattern: [a-zA-Z] plus U+00C0..U+FFFF.
bool is_letter(uint32_t cp) {
  return (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
         (cp >= 0x00C0 && cp <= 0xFFFF);
}
bool is_digit(uint32_t cp) { return cp >= '0' && cp <= '9'; }

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003 ^
           std::hash<std::string>()(p.second);
  }
};

struct Engine {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  std::vector<uint32_t> b2u = byte_to_unicode();

  std::vector<int32_t> bpe(const std::string& token) {
    auto it = cache.find(token);
    if (it != cache.end()) return it->second;

    // split into unicode characters; append </w> to the last
    std::vector<std::string> word;
    size_t i = 0;
    while (i < token.size()) {
      size_t start = i;
      next_cp(token, &i);
      word.push_back(token.substr(start, i - start));
    }
    if (word.empty()) return {};
    word.back() += "</w>";

    while (word.size() > 1) {
      int best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t j = 0; j + 1 < word.size(); ++j) {
        auto r = ranks.find({word[j], word[j + 1]});
        if (r != ranks.end() && r->second < best_rank) {
          best_rank = r->second;
          best_i = j;
        }
      }
      if (best_rank == INT32_MAX) break;
      std::string merged = word[best_i] + word[best_i + 1];
      // merge every occurrence of this bigram (left to right), like the
      // reference BPE loop
      std::vector<std::string> next;
      for (size_t j = 0; j < word.size();) {
        if (j + 1 < word.size() && word[j] == word[best_i] &&
            word[j + 1] == word[best_i + 1]) {
          next.push_back(merged);
          j += 2;
        } else {
          next.push_back(word[j]);
          ++j;
        }
      }
      word.swap(next);
    }

    std::vector<int32_t> ids;
    ids.reserve(word.size());
    for (const auto& piece : word) {
      auto v = vocab.find(piece);
      ids.push_back(v == vocab.end() ? -1 : v->second);
    }
    cache.emplace(token, ids);
    return ids;
  }

  // whitespace-clean + lowercase + CLIP word pattern + byte-level BPE
  std::vector<int32_t> encode(const std::string& input) {
    std::vector<int32_t> out;
    // lowercase ASCII; collapse whitespace runs handled by the scanner
    std::string text = input;
    for (auto& ch : text) {
      if (ch >= 'A' && ch <= 'Z') ch += 32;
    }

    size_t i = 0;
    const size_t n = text.size();
    while (i < n) {
      size_t start = i;
      uint32_t cp = next_cp(text, &i);
      if (is_ws(cp)) continue;

      std::string tok;
      if (cp == '\'') {
        // contractions: 's 't 're 've 'm 'll 'd
        size_t save = i;
        if (i < n) {
          size_t j = i;
          uint32_t c1 = next_cp(text, &j);
          if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') {
            tok = text.substr(start, j - start);
            i = j;
          } else if (c1 == 'r' || c1 == 'v' || c1 == 'l') {
            size_t k = j;
            if (k < n) {
              uint32_t c2 = next_cp(text, &k);
              if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
                  (c1 == 'l' && c2 == 'l')) {
                tok = text.substr(start, k - start);
                i = k;
              }
            }
          }
        }
        if (tok.empty()) {
          // fall through: apostrophe joins an "other" run
          i = save;
          size_t j = i;
          while (j < n) {
            size_t k = j;
            uint32_t c = next_cp(text, &k);
            if (is_ws(c) || is_letter(c) || is_digit(c)) break;
            j = k;
          }
          tok = text.substr(start, j - start);
          i = j;
        }
      } else if (is_letter(cp)) {
        size_t j = i;
        while (j < n) {
          size_t k = j;
          uint32_t c = next_cp(text, &k);
          if (!is_letter(c)) break;
          j = k;
        }
        tok = text.substr(start, j - start);
        i = j;
      } else if (is_digit(cp)) {
        tok = text.substr(start, i - start);  // single digit per token
      } else {
        size_t j = i;
        while (j < n) {
          size_t k = j;
          uint32_t c = next_cp(text, &k);
          if (is_ws(c) || is_letter(c) || is_digit(c)) break;
          j = k;
        }
        tok = text.substr(start, j - start);
        i = j;
      }

      // byte-level remap to the BPE alphabet, then merge
      std::string mapped;
      for (unsigned char b : tok) append_utf8(&mapped, b2u[b]);
      for (int32_t id : bpe(mapped)) out.push_back(id);
    }
    return out;
  }
};

}  // namespace

extern "C" {

// vocab_blob: token strings joined by '\n' (index = id).
// merges_blob: "first second" pairs joined by '\n' (index = rank).
void* sdt_bpe_create(const char* vocab_blob, const char* merges_blob) {
  auto* e = new Engine();
  {
    const char* p = vocab_blob;
    int32_t id = 0;
    while (*p) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
      e->vocab.emplace(std::string(p, len), id++);
      if (!nl) break;
      p = nl + 1;
    }
  }
  {
    const char* p = merges_blob;
    int32_t rank = 0;
    while (*p) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
      std::string line(p, len);
      size_t sp = line.find(' ');
      if (sp != std::string::npos) {
        e->ranks.emplace(
            std::make_pair(line.substr(0, sp), line.substr(sp + 1)), rank++);
      }
      if (!nl) break;
      p = nl + 1;
    }
  }
  return e;
}

void sdt_bpe_destroy(void* handle) { delete static_cast<Engine*>(handle); }

// Returns the number of ids written (<= max_out).
int32_t sdt_bpe_encode(void* handle, const char* text, int32_t* out,
                       int32_t max_out) {
  auto ids = static_cast<Engine*>(handle)->encode(text);
  int32_t n = static_cast<int32_t>(ids.size());
  if (n > max_out) n = max_out;
  memcpy(out, ids.data(), sizeof(int32_t) * n);
  return n;
}

}  // extern "C"
