// moondream-tpu native byte-level BPE tokenizer.
//
// Role: the reference tokenizes through the HF `tokenizers` Rust library
// (reference moondream.py:89). This is the in-repo native equivalent: a
// GPT-2-style byte-level BPE encoder/decoder (the scheme both moondream
// tokenizer generations use) with the standard regex pretokenizer,
// driven by vocab/merge tables the Python wrapper extracts from any
// tokenizer.json. Parity is tested against the HF library on a tokenizer
// trained locally (tests/test_native_bpe.py).
//
// Exposed C ABI:
//   bpe_create(token_bytes, token_lens, n_tokens,
//              merge_left, merge_right, n_merges, use_regex) -> handle
//     token i's byte string is its RAW byte sequence (the wrapper undoes
//     the GPT-2 byte-to-unicode mapping); merge k pairs token ids
//     (merge_left[k], merge_right[k]) with rank k.
//   bpe_encode(handle, utf8, len, out_ids, max_out) -> n_ids (or -1)
//   bpe_decode(handle, ids, n_ids, out_utf8, max_out) -> n_bytes (or -1)
//   bpe_destroy(handle)
//
// Build: make -C native

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<uint32_t, uint32_t>& p) const {
    return (static_cast<size_t>(p.first) << 32) ^ p.second;
  }
};

struct Bpe {
  std::vector<std::string> id_to_bytes;
  std::unordered_map<std::string, uint32_t> bytes_to_id;
  std::unordered_map<std::pair<uint32_t, uint32_t>, uint32_t, PairHash> rank;
  std::unordered_map<std::pair<uint32_t, uint32_t>, uint32_t, PairHash> merged;
  bool use_regex = true;
};

// ---------------------------------------------------------------- unicode
// Decode one UTF-8 codepoint; advances i. Invalid bytes yield 0xFFFD and
// advance by one (byte-level BPE then still sees the raw bytes).
uint32_t decode_cp(const uint8_t* s, size_t len, size_t& i) {
  uint8_t c = s[i];
  if (c < 0x80) { i += 1; return c; }
  if ((c >> 5) == 0x6 && i + 1 < len) {
    uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
    i += 2; return cp;
  }
  if ((c >> 4) == 0xE && i + 2 < len) {
    uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
    i += 3; return cp;
  }
  if ((c >> 3) == 0x1E && i + 3 < len) {
    uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
                  ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    i += 4; return cp;
  }
  i += 1;
  return 0xFFFD;
}

// Compact \p{L} test over the BMP blocks that matter in practice (Latin,
// Greek, Cyrillic, Hebrew, Arabic, Indic, Thai, CJK, Kana, Hangul, ...).
bool is_letter(uint32_t cp) {
  if (cp < 128)
    return (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z');
  struct Range { uint32_t lo, hi; };
  static const Range kRanges[] = {
      {0x00AA, 0x00AA}, {0x00B5, 0x00B5}, {0x00BA, 0x00BA},
      {0x00C0, 0x00D6}, {0x00D8, 0x00F6}, {0x00F8, 0x02C1},
      {0x0370, 0x0374}, {0x0376, 0x0377}, {0x037A, 0x037D},
      {0x0386, 0x0386}, {0x0388, 0x03F5}, {0x03F7, 0x0481},
      {0x048A, 0x052F}, {0x0531, 0x0556}, {0x0561, 0x0587},
      {0x05D0, 0x05EA}, {0x0620, 0x064A}, {0x0671, 0x06D3},
      {0x06FA, 0x06FC}, {0x0712, 0x072F}, {0x0750, 0x077F},
      {0x0904, 0x0939}, {0x0958, 0x0961}, {0x0985, 0x09B9},
      {0x0A05, 0x0A39}, {0x0A85, 0x0AB9}, {0x0B05, 0x0B39},
      {0x0B85, 0x0BB9}, {0x0C05, 0x0C39}, {0x0C85, 0x0CB9},
      {0x0D05, 0x0D39}, {0x0E01, 0x0E30}, {0x0E40, 0x0E46},
      {0x0E81, 0x0EB0}, {0x10A0, 0x10FA}, {0x1100, 0x1159},
      {0x1E00, 0x1FBC}, {0x1FC2, 0x1FCC}, {0x1FD0, 0x1FDB},
      {0x1FE0, 0x1FEC}, {0x1FF2, 0x1FFC}, {0x2C60, 0x2C7F},
      {0x3041, 0x3096}, {0x30A1, 0x30FA}, {0x3105, 0x312D},
      {0x3131, 0x318E}, {0x31A0, 0x31BA}, {0x3400, 0x4DBF},
      {0x4E00, 0x9FFF}, {0xA000, 0xA48C}, {0xA500, 0xA60B},
      {0xA717, 0xA71F}, {0xAC00, 0xD7A3}, {0xF900, 0xFA6D},
      {0xFB00, 0xFB06}, {0xFB13, 0xFB17}, {0xFB1F, 0xFB28},
      {0xFE70, 0xFEFC}, {0xFF21, 0xFF3A}, {0xFF41, 0xFF5A},
      {0xFF66, 0xFFDC},
  };
  for (const auto& r : kRanges)
    if (cp >= r.lo && cp <= r.hi) return true;
  if (cp >= 0x10000) return true;  // supplementary planes: mostly letters
  return false;
}

bool is_number(uint32_t cp) {
  if (cp < 128) return cp >= '0' && cp <= '9';
  struct Range { uint32_t lo, hi; };
  static const Range kRanges[] = {
      {0x00B2, 0x00B3}, {0x00B9, 0x00B9}, {0x00BC, 0x00BE},
      {0x0660, 0x0669}, {0x06F0, 0x06F9}, {0x0966, 0x096F},
      {0x09E6, 0x09EF}, {0x0A66, 0x0A6F}, {0x0AE6, 0x0AEF},
      {0x0B66, 0x0B6F}, {0x0BE6, 0x0BEF}, {0x0C66, 0x0C6F},
      {0x0CE6, 0x0CEF}, {0x0D66, 0x0D6F}, {0x0E50, 0x0E59},
      {0x2070, 0x2079}, {0x2080, 0x2089}, {0xFF10, 0xFF19},
  };
  for (const auto& r : kRanges)
    if (cp >= r.lo && cp <= r.hi) return true;
  return false;
}

bool is_space(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
         cp == '\f' || cp == 0x0B || cp == 0x85 || cp == 0xA0 ||
         (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 || cp == 0x2029 ||
         cp == 0x202F || cp == 0x205F || cp == 0x3000 || cp == 0x1680;
}

// GPT-2 pretokenizer:
//   's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+
// Implemented as a hand scanner over decoded codepoints. Returns byte
// spans (start, end).
void pretokenize(const uint8_t* s, size_t len,
                 std::vector<std::pair<size_t, size_t>>& out) {
  // decode once, remembering byte offsets
  std::vector<uint32_t> cps;
  std::vector<size_t> offs;  // byte offset of each cp; offs.back() == len
  size_t i = 0;
  while (i < len) {
    offs.push_back(i);
    cps.push_back(decode_cp(s, len, i));
  }
  offs.push_back(len);
  const size_t n = cps.size();

  // Case-sensitive, like the GPT-2 regex: 's|'t|'re|'ve|'m|'ll|'d
  // ("'S" is NOT a contraction suffix — it splits as ' + S).
  auto is_apos_suffix = [&](size_t p, size_t& adv) -> bool {
    if (cps[p] != '\'') return false;
    if (p + 1 < n) {
      uint32_t c1 = cps[p + 1];
      if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') { adv = 2; return true; }
      if (p + 2 < n) {
        uint32_t c2 = cps[p + 2];
        if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
            (c1 == 'l' && c2 == 'l')) { adv = 3; return true; }
      }
    }
    return false;
  };

  auto is_other = [&](uint32_t cp) {
    return !is_space(cp) && !is_letter(cp) && !is_number(cp);
  };

  size_t p = 0;
  while (p < n) {
    const size_t start = p;
    size_t adv = 0;
    if (is_apos_suffix(p, adv)) {
      p += adv;  // alternative 1: contraction suffixes
    } else if (cps[p] == ' ' && p + 1 < n && is_letter(cps[p + 1])) {
      ++p;  // ` ?\p{L}+`
      while (p < n && is_letter(cps[p])) ++p;
    } else if (cps[p] == ' ' && p + 1 < n && is_number(cps[p + 1])) {
      ++p;  // ` ?\p{N}+`
      while (p < n && is_number(cps[p])) ++p;
    } else if (cps[p] == ' ' && p + 1 < n && is_other(cps[p + 1])) {
      ++p;  // ` ?[^\s\p{L}\p{N}]+`
      while (p < n && is_other(cps[p])) ++p;
    } else if (is_space(cps[p])) {
      size_t q = p;
      while (q < n && is_space(cps[q])) ++q;
      // `\s+(?!\S)` with backtracking: before a non-space, leave the
      // last space to prefix the next token; single non-' ' whitespace
      // before non-space falls through to plain `\s+` of length 1
      if (q < n && q - p > 1)
        p = q - 1;
      else if (q < n && q - p == 1)
        p = q;  // single tab/newline/etc before a word (or lone ' ' at n-1)
      else
        p = q;  // trailing whitespace run
    } else if (is_letter(cps[p])) {
      while (p < n && is_letter(cps[p])) ++p;
    } else if (is_number(cps[p])) {
      while (p < n && is_number(cps[p])) ++p;
    } else {
      while (p < n && is_other(cps[p])) ++p;
    }
    if (p == start) ++p;  // safety
    out.emplace_back(offs[start], offs[p]);
  }
}

}  // namespace

extern "C" {

void* bpe_create(const uint8_t* token_bytes, const int32_t* token_lens,
                 int32_t n_tokens, const int32_t* merge_left,
                 const int32_t* merge_right, int32_t n_merges,
                 int32_t use_regex) {
  auto* b = new Bpe();
  b->use_regex = use_regex != 0;
  b->id_to_bytes.resize(n_tokens);
  size_t off = 0;
  for (int32_t t = 0; t < n_tokens; ++t) {
    b->id_to_bytes[t].assign(reinterpret_cast<const char*>(token_bytes + off),
                             token_lens[t]);
    off += token_lens[t];
    b->bytes_to_id.emplace(b->id_to_bytes[t], t);
  }
  for (int32_t m = 0; m < n_merges; ++m) {
    std::pair<uint32_t, uint32_t> key(merge_left[m], merge_right[m]);
    b->rank.emplace(key, m);
    const std::string joined =
        b->id_to_bytes[merge_left[m]] + b->id_to_bytes[merge_right[m]];
    auto it = b->bytes_to_id.find(joined);
    if (it != b->bytes_to_id.end()) b->merged.emplace(key, it->second);
  }
  return b;
}

void bpe_destroy(void* h) { delete static_cast<Bpe*>(h); }

namespace {

// BPE-merge one pretoken's bytes into ids appended to out. Returns false
// (without touching out) when a byte has no vocab id — a byte-level BPE
// vocab normally covers all 256 bytes, so this means the tables are
// incomplete and the encode must fail loudly rather than drop text.
bool bpe_word(const Bpe& b, const uint8_t* s, size_t len,
              std::vector<int32_t>& out) {
  std::vector<uint32_t> parts;
  parts.reserve(len);
  for (size_t i = 0; i < len; ++i) {
    auto it = b.bytes_to_id.find(std::string(1, static_cast<char>(s[i])));
    if (it == b.bytes_to_id.end()) return false;
    parts.push_back(it->second);
  }
  while (parts.size() > 1) {
    uint32_t best_rank = UINT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = b.rank.find({parts[i], parts[i + 1]});
      if (it != b.rank.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == UINT32_MAX) break;
    auto it = b.merged.find({parts[best_i], parts[best_i + 1]});
    if (it == b.merged.end()) break;
    parts[best_i] = it->second;
    parts.erase(parts.begin() + best_i + 1);
  }
  for (uint32_t id : parts) out.push_back(static_cast<int32_t>(id));
  return true;
}

}  // namespace

// Returns n_ids; -1 when out_ids is too small; -2 when a byte in the input
// has no vocab id (incomplete byte alphabet — caller must not use the
// partial result).
int32_t bpe_encode(void* h, const uint8_t* utf8, int32_t len,
                   int32_t* out_ids, int32_t max_out) {
  const Bpe& b = *static_cast<Bpe*>(h);
  std::vector<int32_t> ids;
  if (b.use_regex) {
    std::vector<std::pair<size_t, size_t>> spans;
    pretokenize(utf8, len, spans);
    for (const auto& sp : spans)
      if (!bpe_word(b, utf8 + sp.first, sp.second - sp.first, ids)) return -2;
  } else {
    if (!bpe_word(b, utf8, len, ids)) return -2;
  }
  if (static_cast<int32_t>(ids.size()) > max_out) return -1;
  std::memcpy(out_ids, ids.data(), ids.size() * sizeof(int32_t));
  return static_cast<int32_t>(ids.size());
}

int32_t bpe_decode(void* h, const int32_t* ids, int32_t n_ids,
                   uint8_t* out_utf8, int32_t max_out) {
  const Bpe& b = *static_cast<Bpe*>(h);
  std::string s;
  for (int32_t i = 0; i < n_ids; ++i) {
    if (ids[i] < 0 || ids[i] >= static_cast<int32_t>(b.id_to_bytes.size()))
      continue;
    s += b.id_to_bytes[ids[i]];
  }
  if (static_cast<int32_t>(s.size()) > max_out) return -1;
  std::memcpy(out_utf8, s.data(), s.size());
  return static_cast<int32_t>(s.size());
}

}  // extern "C"
