// Monotonic shortest-path duration extraction (native kernel).
//
// The reference builds a ~(M*N)^2 sparse adjacency matrix and runs generic
// Dijkstra (/root/reference/utils/aligner/duration_extraction.py:14-85).
// The graph is a DAG with only right/down/down-right moves, so the shortest
// path is a simple O(M*N) dynamic program — orders of magnitude faster and
// allocation-free. Semantics match the reference exactly, including the
// "last token visited per mel row wins" assignment when the path moves
// right within a row.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmonotonic_align.so \
//            monotonic_align.cc

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

using std::size_t;

extern "C" {

// cost: (rows x cols) row-major = 1 - posterior (entering-node edge weight;
// cost[0][0] is the start node and is NOT counted, matching dijkstra from
// node 0 with d[0]=0).
// durations: (cols,) out — frames assigned per token column.
void monotonic_duration(const float* cost, int rows, int cols,
                        int32_t* durations) {
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> prev(cols, INF), cur(cols, INF);
  // moves: 0=right (i, j-1 -> i, j), 1=down (i-1, j), 2=diag (i-1, j-1)
  std::vector<uint8_t> choice(static_cast<size_t>(rows) * cols, 0);

  prev[0] = 0.0;  // start node (0,0), cost excluded
  for (int j = 1; j < cols; ++j) {
    prev[j] = prev[j - 1] + cost[j];
    choice[j] = 0;
  }
  for (int i = 1; i < rows; ++i) {
    const float* crow = cost + static_cast<size_t>(i) * cols;
    uint8_t* chrow = choice.data() + static_cast<size_t>(i) * cols;
    for (int j = 0; j < cols; ++j) {
      double best = prev[j];       // down
      uint8_t ch = 1;
      if (j > 0) {
        if (prev[j - 1] < best) { best = prev[j - 1]; ch = 2; }   // diag
        if (cur[j - 1] < best) { best = cur[j - 1]; ch = 0; }     // right
      }
      cur[j] = best + crow[j];
      chrow[j] = ch;
    }
    std::swap(prev, cur);
  }

  // backtrack; per mel row keep the LAST token j on the path
  // (reference duration_extraction.py:74-84 dict overwrite semantics)
  std::vector<int32_t> row_token(rows, -1);
  int i = rows - 1, j = cols - 1;
  while (true) {
    if (row_token[i] < 0) row_token[i] = j;  // first visit per row while
                                             // walking backwards = last
                                             // visit walking forwards
    if (i == 0 && j == 0) break;
    switch (choice[static_cast<size_t>(i) * cols + j]) {
      case 0: j -= 1; break;
      case 1: i -= 1; break;
      default: i -= 1; j -= 1; break;
    }
  }
  for (int jj = 0; jj < cols; ++jj) durations[jj] = 0;
  for (int ii = 0; ii < rows; ++ii) durations[row_token[ii]] += 1;
}

// Batched variant over independent items (parallelizable by the caller).
void monotonic_duration_batch(const float* costs, const int32_t* rows,
                              const int32_t* cols, const int64_t* offsets,
                              int n_items, int32_t* durations,
                              const int64_t* dur_offsets) {
  for (int k = 0; k < n_items; ++k) {
    monotonic_duration(costs + offsets[k], rows[k], cols[k],
                       durations + dur_offsets[k]);
  }
}

}  // extern "C"
