// BPE merge-loop trainer (the hot O(vocab x corpus) part of BpeTrainer).
//
// The reference relies on sentencepiece's C++ trainer
// (/root/reference/tal/asr/tokenizers/sentencepiece.py:6-15 recipe); this is
// the native trainer for this framework's BPE (text/bpe.py). It is
// BIT-COMPATIBLE with the Python BpeTrainer merge loop, including its
// tie-breaking: each round counts pair frequencies by scanning the corpus in
// insertion order and picks the most frequent pair, ties broken by FIRST
// APPEARANCE in that round's scan (Python Counter.most_common insertion-order
// semantics). Duplicate sequences created by a merge fold into the first
// occurrence, preserving the Python dict-rebuild order.
//
// Interface (ctypes): symbols are int32 ids; base characters are
// 0..n_base-1, merge i creates piece n_base+i. Sequences are concatenated in
// `seqs` with lengths in `seq_lens` and frequencies in `freqs`.
//
// Returns the number of merges written to out_merges (pairs: a, b per merge).
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(uint64_t v) const { return std::hash<uint64_t>()(v); }
};

inline uint64_t key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

struct SeqHash {
  size_t operator()(const std::vector<int32_t>& s) const {
    size_t h = 1469598103934665603ull;
    for (int32_t v : s) {
      h ^= static_cast<uint32_t>(v);
      h *= 1099511628211ull;
    }
    return h;
  }
};

}  // namespace

extern "C" int bpe_train(const int32_t* seqs, const int32_t* seq_lens,
                         const int64_t* freqs, int n_seqs, int n_base,
                         int budget, int32_t* out_merges) {
  std::vector<std::vector<int32_t>> corpus;
  std::vector<int64_t> cfreq;
  corpus.reserve(n_seqs);
  cfreq.reserve(n_seqs);
  {
    // Fold duplicate input sequences (Python Counter over tuples).
    std::unordered_map<std::vector<int32_t>, int, SeqHash> seen;
    const int32_t* p = seqs;
    for (int i = 0; i < n_seqs; ++i) {
      std::vector<int32_t> s(p, p + seq_lens[i]);
      p += seq_lens[i];
      auto it = seen.find(s);
      if (it == seen.end()) {
        seen.emplace(s, static_cast<int>(corpus.size()));
        corpus.push_back(std::move(s));
        cfreq.push_back(freqs[i]);
      } else {
        cfreq[it->second] += freqs[i];
      }
    }
  }

  int n_merges = 0;
  int32_t next_id = n_base;

  std::unordered_map<uint64_t, int64_t, PairHash> pair_freq;
  std::unordered_map<uint64_t, int64_t, PairHash> first_seen;
  pair_freq.reserve(1 << 16);
  first_seen.reserve(1 << 16);

  for (int round = 0; round < budget; ++round) {
    pair_freq.clear();
    first_seen.clear();
    int64_t order = 0;
    for (size_t si = 0; si < corpus.size(); ++si) {
      const auto& s = corpus[si];
      const int64_t f = cfreq[si];
      for (size_t i = 0; i + 1 < s.size(); ++i) {
        const uint64_t k = key(s[i], s[i + 1]);
        auto it = pair_freq.find(k);
        if (it == pair_freq.end()) {
          pair_freq.emplace(k, f);
          first_seen.emplace(k, order++);
        } else {
          it->second += f;
        }
      }
    }
    if (pair_freq.empty()) break;

    uint64_t best_key = 0;
    int64_t best_f = -1, best_order = 0;
    for (const auto& kv : pair_freq) {
      const int64_t ord = first_seen[kv.first];
      if (kv.second > best_f ||
          (kv.second == best_f && ord < best_order)) {
        best_f = kv.second;
        best_order = ord;
        best_key = kv.first;
      }
    }
    if (best_f < 2) break;

    const int32_t a = static_cast<int32_t>(best_key >> 32);
    const int32_t b = static_cast<int32_t>(best_key & 0xffffffffu);
    out_merges[2 * n_merges] = a;
    out_merges[2 * n_merges + 1] = b;
    ++n_merges;

    // Rebuild the corpus applying the merge, folding duplicates into their
    // first occurrence (Python's new_corpus dict rebuild).
    std::vector<std::vector<int32_t>> next_corpus;
    std::vector<int64_t> next_freq;
    next_corpus.reserve(corpus.size());
    next_freq.reserve(corpus.size());
    std::unordered_map<std::vector<int32_t>, int, SeqHash> seen;
    seen.reserve(corpus.size() * 2);
    std::vector<int32_t> out;
    for (size_t si = 0; si < corpus.size(); ++si) {
      const auto& s = corpus[si];
      out.clear();
      size_t i = 0;
      while (i < s.size()) {
        if (i + 1 < s.size() && s[i] == a && s[i + 1] == b) {
          out.push_back(next_id);
          i += 2;
        } else {
          out.push_back(s[i]);
          ++i;
        }
      }
      auto it = seen.find(out);
      if (it == seen.end()) {
        seen.emplace(out, static_cast<int>(next_corpus.size()));
        next_corpus.push_back(out);
        next_freq.push_back(cfreq[si]);
      } else {
        next_freq[it->second] += cfreq[si];
      }
    }
    corpus.swap(next_corpus);
    cfreq.swap(next_freq);
    ++next_id;
  }
  return n_merges;
}
