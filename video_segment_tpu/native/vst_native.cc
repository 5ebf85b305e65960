// Native host kernels for the streaming runtime.
//
// The TPU owns the numeric path; these are the host-side hot loops the
// reference implements in C++ and that NumPy cannot express efficiently:
//  - multi_label_cc: per-frame N4 connected components of a multi-label
//    image (one union-find pass), the core of the spatial-connectedness
//    enforcement (reference tube analysis,
//    dense_segmentation_graph.h:666-904).
//  - rle_encode_rows: run-length extraction of a label image.
//
// Built as a plain shared library, bound via ctypes (no pybind11 in this
// image).

#include <cstdint>
#include <vector>

namespace {

// Union-find with path halving.
inline int32_t find(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

inline void unite(std::vector<int32_t>& parent, int32_t a, int32_t b) {
  a = find(parent, a);
  b = find(parent, b);
  if (a != b) parent[b < a ? a : b] = (b < a ? b : a);
}

}  // namespace

extern "C" {

// labels: (h, w) int32 region labels.  comp out: (h, w) int32 component ids,
// compacted to [0, n_components), components never span different labels.
// Returns n_components.
int32_t multi_label_cc(const int32_t* labels, int32_t h, int32_t w,
                       int32_t* comp) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);

  for (int32_t y = 0; y < h; ++y) {
    const int32_t* row = labels + static_cast<int64_t>(y) * w;
    const int64_t base = static_cast<int64_t>(y) * w;
    for (int32_t x = 1; x < w; ++x) {
      if (row[x] == row[x - 1]) {
        unite(parent, static_cast<int32_t>(base + x),
              static_cast<int32_t>(base + x - 1));
      }
    }
    if (y > 0) {
      const int32_t* prev = labels + static_cast<int64_t>(y - 1) * w;
      for (int32_t x = 0; x < w; ++x) {
        if (row[x] == prev[x]) {
          unite(parent, static_cast<int32_t>(base + x),
                static_cast<int32_t>(base + x - w));
        }
      }
    }
  }

  // Compact roots to dense component ids.
  int32_t next = 0;
  std::vector<int32_t> comp_of(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t r = find(parent, static_cast<int32_t>(i));
    if (comp_of[r] < 0) comp_of[r] = next++;
    comp[i] = comp_of[r];
  }
  return next;
}

// Run-length encode a label image: for each run emit (label, y, left, right).
// out must have capacity 4 * max_runs int64; returns the number of runs, or
// -1 if capacity was insufficient.
int64_t rle_encode_rows(const int64_t* labels, int32_t h, int32_t w,
                        int64_t* out, int64_t max_runs) {
  int64_t runs = 0;
  for (int32_t y = 0; y < h; ++y) {
    const int64_t* row = labels + static_cast<int64_t>(y) * w;
    int32_t x = 0;
    while (x < w) {
      const int64_t v = row[x];
      int32_t start = x;
      while (x < w && row[x] == v) ++x;
      if (runs == max_runs) return -1;
      int64_t* rec = out + runs * 4;
      rec[0] = v;
      rec[1] = y;
      rec[2] = start;
      rec[3] = x - 1;
      ++runs;
    }
  }
  return runs;
}

}  // extern "C"
