// Native edit-distance engine for the WER/WDER evaluation suite.
//
// The reference scores WER with the `editdistance` C extension and derives
// WDER substitution/equal alignments from the `edit_distance` package's
// SequenceMatcher opcodes (/root/reference/tal/wder.py:2,5,189,198). Both
// are O(n*m) dynamic programs over word sequences; hour-long unaligned
// episodes reach ~10k words per side, far too slow for Python. This engine
// provides:
//
//   levenshtein(a, n, b, m)            -> edit distance (2-row DP)
//   edit_opcodes(a, n, b, m, out, cap) -> full alignment as opcodes via
//                                         Hirschberg's divide-and-conquer
//                                         (O(n*m) time, O(n+m) memory)
//
// Sequences are int32 symbol ids (the Python layer interns words).
// Opcode encoding per row of `out` (5 ints): {op, a0, a1, b0, b1} with
// op: 0=equal 1=replace 2=delete(a only) 3=insert(b only).
//
// Tie-breaking is fixed and documented: diagonal (match/substitute) is
// preferred, then insertion, then deletion — the preference order of the
// pypi `edit_distance` package's lowest_cost_action, whose opcodes the
// reference consumes (tal/wder.py:198). The Python fallback
// (tal_asrd_tpu/eval/editdist.py) implements the same order, so both give
// identical opcode streams. Bit-parity vs the actual package is staged in
// tests/fixtures/generate_fixtures.py (package unavailable here).
//
// Build: g++ -O3 -shared -fPIC -o libeditdist.so editdist.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using std::int32_t;
using std::int64_t;
using std::vector;

// Forward DP: cost[j] = edit distance from a[0..n) prefix to b[0..j) prefix.
void dp_forward(const int32_t* a, int64_t n, const int32_t* b, int64_t m,
                vector<int64_t>& row) {
  row.resize(m + 1);
  for (int64_t j = 0; j <= m; ++j) row[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    int64_t prev_diag = row[0];
    row[0] = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t cur = row[j];
      int64_t sub = prev_diag + (a[i - 1] == b[j - 1] ? 0 : 1);
      int64_t del = row[j] + 1;      // consume a[i-1]
      int64_t ins = row[j - 1] + 1;  // consume b[j-1]
      row[j] = std::min(sub, std::min(del, ins));
      prev_diag = cur;
    }
  }
}

// Reverse DP: cost[j] = edit distance from a[i..n) suffix to b[j..m) suffix,
// stored as row over j offsets of the *reversed* problem.
void dp_reverse(const int32_t* a, int64_t n, const int32_t* b, int64_t m,
                vector<int64_t>& row) {
  row.resize(m + 1);
  for (int64_t j = 0; j <= m; ++j) row[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    int64_t prev_diag = row[0];
    row[0] = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t cur = row[j];
      int64_t sub = prev_diag + (a[n - i] == b[m - j] ? 0 : 1);
      int64_t del = row[j] + 1;
      int64_t ins = row[j - 1] + 1;
      row[j] = std::min(sub, std::min(del, ins));
      prev_diag = cur;
    }
  }
}

// Per-position path ops, later run-length-compressed into opcodes.
// 'M' match, 'S' substitute, 'D' delete (a), 'I' insert (b).
void align_small(const int32_t* a, int64_t n, const int32_t* b, int64_t m,
                 vector<char>& ops) {
  // Full DP with backtrace (only used for small subproblems, n <= 1 after
  // Hirschberg splitting, but kept general for n*m <= kSmall).
  vector<int64_t> cost((n + 1) * (m + 1));
  auto C = [&](int64_t i, int64_t j) -> int64_t& { return cost[i * (m + 1) + j]; };
  for (int64_t j = 0; j <= m; ++j) C(0, j) = j;
  for (int64_t i = 1; i <= n; ++i) {
    C(i, 0) = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t sub = C(i - 1, j - 1) + (a[i - 1] == b[j - 1] ? 0 : 1);
      int64_t del = C(i - 1, j) + 1;
      int64_t ins = C(i, j - 1) + 1;
      C(i, j) = std::min(sub, std::min(del, ins));
    }
  }
  // Backtrace from (n, m): tie preference diag > insert > delete — the
  // preference order of the pypi `edit_distance` package's
  // lowest_cost_action (the reference consumes its opcodes, tal/wder.py:198):
  // substitution/equal whenever the diagonal ties for the minimum, else
  // insert whenever it ties, else delete. (Its match-count tiebreak clauses
  // are vacuous: best_match_count is still -1 when the insert branch tests.)
  vector<char> rev;
  int64_t i = n, j = m;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 &&
        C(i, j) == C(i - 1, j - 1) + (a[i - 1] == b[j - 1] ? 0 : 1)) {
      rev.push_back(a[i - 1] == b[j - 1] ? 'M' : 'S');
      --i; --j;
    } else if (j > 0 && C(i, j) == C(i, j - 1) + 1) {
      rev.push_back('I');
      --j;
    } else {
      rev.push_back('D');
      --i;
    }
  }
  ops.insert(ops.end(), rev.rbegin(), rev.rend());
}

const int64_t kSmallCells = 1 << 16;

void hirschberg(const int32_t* a, int64_t n, const int32_t* b, int64_t m,
                vector<char>& ops) {
  if (n == 0) {
    ops.insert(ops.end(), m, 'I');
    return;
  }
  if (m == 0) {
    ops.insert(ops.end(), n, 'D');
    return;
  }
  if ((n + 1) * (m + 1) <= kSmallCells || n == 1) {
    align_small(a, n, b, m, ops);
    return;
  }
  int64_t mid = n / 2;
  vector<int64_t> fwd, rev;
  dp_forward(a, mid, b, m, fwd);
  dp_reverse(a + mid, n - mid, b, m, rev);
  // Split point: argmin_j fwd[j] + rev[m - j]; ties -> smallest j keeps the
  // deterministic diag>del>ins preference globally consistent with the
  // full-DP backtrace.
  int64_t best_j = 0;
  int64_t best = INT64_MAX;
  for (int64_t j = 0; j <= m; ++j) {
    int64_t c = fwd[j] + rev[m - j];
    if (c < best) { best = c; best_j = j; }
  }
  hirschberg(a, mid, b, best_j, ops);
  hirschberg(a + mid, n - mid, b + best_j, m - best_j, ops);
}

}  // namespace

extern "C" {

int64_t levenshtein(const int32_t* a, int64_t n, const int32_t* b, int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  vector<int64_t> row;
  dp_forward(a, n, b, m, row);
  return row[m];
}

// Writes up to `cap` opcode rows of 5 ints; returns the number of rows
// (or -1 if cap was insufficient).
int64_t edit_opcodes(const int32_t* a, int64_t n, const int32_t* b, int64_t m,
                     int32_t* out, int64_t cap) {
  vector<char> ops;
  ops.reserve(n + m);
  hirschberg(a, n, b, m, ops);

  int64_t rows = 0;
  int64_t i = 0, j = 0;
  size_t k = 0;
  while (k < ops.size()) {
    char op = ops[k];
    int64_t i0 = i, j0 = j;
    while (k < ops.size() && ops[k] == op) {
      if (op == 'M' || op == 'S') { ++i; ++j; }
      else if (op == 'D') { ++i; }
      else { ++j; }
      ++k;
    }
    if (rows >= cap) return -1;
    int32_t* row = out + rows * 5;
    row[0] = (op == 'M') ? 0 : (op == 'S') ? 1 : (op == 'D') ? 2 : 3;
    row[1] = static_cast<int32_t>(i0);
    row[2] = static_cast<int32_t>(i);
    row[3] = static_cast<int32_t>(j0);
    row[4] = static_cast<int32_t>(j);
    ++rows;
  }
  return rows;
}

}  // extern "C"
