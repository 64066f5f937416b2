// Native BPE encoder hot loop.
//
// The reference tokenizes through the sentencepiece C++ library
// (/root/reference/tal/asr/tokenizers/sentencepiece.py:2). Our BPE model
// (tal_asrd_tpu/text/bpe.py) is pure data (pieces + merges); this engine
// accelerates the per-word greedy lowest-rank merge loop, which dominates
// corpus tokenization time in Python.
//
// Interface (ctypes): the Python layer interns characters/pieces to int32
// ids and flattens the merge table; encode_word performs greedy merging over
// symbol ids.
//
//   load_merges(pairs[n*2], merged_ids[n], n) -> handle
//     pairs[i*2], pairs[i*2+1]: the two symbol ids of merge rank i;
//     merged_ids[i]: the symbol id produced by that merge.
//   encode_word(handle, syms, len, out, cap) -> out_len
//     Greedily applies the lowest-rank applicable merge until none applies.
//   free_merges(handle)
//
// Build: g++ -O3 -shared -fPIC -o libfastbpe.so fastbpe.cpp

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

using std::size_t;

namespace {

struct MergeTable {
  // (a, b) -> (rank, merged_id)
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> merges;
};

inline uint64_t key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

}  // namespace

extern "C" {

void* load_merges(const int32_t* pairs, const int32_t* merged_ids, int64_t n) {
  auto* table = new MergeTable();
  table->merges.reserve(static_cast<size_t>(n) * 2);
  for (int64_t i = 0; i < n; ++i) {
    table->merges.emplace(key(pairs[i * 2], pairs[i * 2 + 1]),
                          std::make_pair(static_cast<int32_t>(i),
                                         merged_ids[i]));
  }
  return table;
}

void free_merges(void* handle) {
  delete static_cast<MergeTable*>(handle);
}

int64_t encode_word(void* handle, const int32_t* syms, int64_t len,
                    int32_t* out, int64_t cap) {
  const auto& merges = static_cast<MergeTable*>(handle)->merges;
  std::vector<int32_t> buf(syms, syms + len);
  while (buf.size() > 1) {
    int32_t best_rank = INT32_MAX;
    size_t best_i = 0;
    int32_t best_id = -1;
    for (size_t i = 0; i + 1 < buf.size(); ++i) {
      auto it = merges.find(key(buf[i], buf[i + 1]));
      if (it != merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_i = i;
        best_id = it->second.second;
      }
    }
    if (best_id < 0) break;
    buf[best_i] = best_id;
    buf.erase(buf.begin() + best_i + 1);
  }
  if (static_cast<int64_t>(buf.size()) > cap) return -1;
  for (size_t i = 0; i < buf.size(); ++i) out[i] = buf[i];
  return static_cast<int64_t>(buf.size());
}

}  // extern "C"
