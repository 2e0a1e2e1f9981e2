// Native CSR -> blocked-ELL packer for conjugategradient_tpu.
//
// The blocked-ELL device layout (types.BlockedEllMatrix) stores, per block
// of bm rows, kmax dense (bm, bn) tiles plus the column-block index of each
// tile.  Packing a large CSR matrix into that layout is an O(nnz) host pass
// that the pure-Python implementation (types.BlockedEllMatrix.from_csr_host)
// does with a per-row-block Python loop; this native version replaces it for
// ingest-speed parity with the reference's native loader path
// (test/mm_reader.cpp builds its CSR natively too).
//
// Two-call protocol (C ABI, ctypes-consumed from io/native.py):
//   cg_ell_plan(indices, indptr, nrows, ncols, bm, bn, &nrb, &kmax)
//       first pass: number of row blocks and the max distinct column-blocks
//       any row block touches (>= 1).
//   cg_ell_pack_f32 / cg_ell_pack_f64(data, indices, indptr, nrows, ncols,
//       bm, bn, kmax, blocks, block_cols)
//       second pass: fill caller-allocated blocks (nrb*kmax*bm*bn, zeroed
//       here) and block_cols (nrb*kmax, padded tiles point at block 0).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int64_t cdiv(int64_t a, int64_t b) { return (a + b - 1) / b; }

// Collect the sorted unique column-block list of one row block.
void row_block_cols(const int32_t* indices, const int64_t* indptr,
                    int64_t row_lo, int64_t row_hi, int64_t bn,
                    std::vector<int32_t>& out) {
  out.clear();
  for (int64_t r = row_lo; r < row_hi; ++r)
    for (int64_t j = indptr[r]; j < indptr[r + 1]; ++j)
      out.push_back(static_cast<int32_t>(indices[j] / bn));
  std::sort(out.begin(), out.end());
  out.erase(std::unique(out.begin(), out.end()), out.end());
}

template <typename T>
int pack(const double* data, const int32_t* indices, const int64_t* indptr,
         int64_t nrows, int64_t /*ncols*/, int64_t bm, int64_t bn,
         int64_t kmax, T* blocks, int32_t* block_cols) {
  const int64_t nrb = cdiv(nrows, bm);
  std::memset(blocks, 0, sizeof(T) * nrb * kmax * bm * bn);
  std::memset(block_cols, 0, sizeof(int32_t) * nrb * kmax);

  std::vector<int32_t> cols_i;
  for (int64_t i = 0; i < nrb; ++i) {
    const int64_t row_lo = i * bm;
    const int64_t row_hi = std::min(row_lo + bm, nrows);
    row_block_cols(indices, indptr, row_lo, row_hi, bn, cols_i);
    if (static_cast<int64_t>(cols_i.size()) > kmax) return 2;  // plan mismatch
    for (size_t k = 0; k < cols_i.size(); ++k)
      block_cols[i * kmax + static_cast<int64_t>(k)] = cols_i[k];

    T* tile_base = blocks + i * kmax * bm * bn;
    for (int64_t r = row_lo; r < row_hi; ++r) {
      const int64_t rl = r - row_lo;
      for (int64_t j = indptr[r]; j < indptr[r + 1]; ++j) {
        const int32_t cb = static_cast<int32_t>(indices[j] / bn);
        const int64_t slot =
            std::lower_bound(cols_i.begin(), cols_i.end(), cb) - cols_i.begin();
        const int64_t cl = indices[j] - static_cast<int64_t>(cb) * bn;
        tile_base[slot * bm * bn + rl * bn + cl] += static_cast<T>(data[j]);
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int cg_ell_plan(const int32_t* indices, const int64_t* indptr, int64_t nrows,
                int64_t /*ncols*/, int64_t bm, int64_t bn, int64_t* nrb_out,
                int64_t* kmax_out) {
  const int64_t nrb = cdiv(nrows, bm);
  int64_t kmax = 1;
  std::vector<int32_t> cols_i;
  for (int64_t i = 0; i < nrb; ++i) {
    const int64_t row_lo = i * bm;
    const int64_t row_hi = std::min(row_lo + bm, nrows);
    row_block_cols(indices, indptr, row_lo, row_hi, bn, cols_i);
    kmax = std::max<int64_t>(kmax, static_cast<int64_t>(cols_i.size()));
  }
  *nrb_out = nrb;
  *kmax_out = kmax;
  return 0;
}

int cg_ell_pack_f32(const double* data, const int32_t* indices,
                    const int64_t* indptr, int64_t nrows, int64_t ncols,
                    int64_t bm, int64_t bn, int64_t kmax, float* blocks,
                    int32_t* block_cols) {
  return pack<float>(data, indices, indptr, nrows, ncols, bm, bn, kmax, blocks,
                     block_cols);
}

int cg_ell_pack_f64(const double* data, const int32_t* indices,
                    const int64_t* indptr, int64_t nrows, int64_t ncols,
                    int64_t bm, int64_t bn, int64_t kmax, double* blocks,
                    int32_t* block_cols) {
  return pack<double>(data, indices, indptr, nrows, ncols, bm, bn, kmax,
                      blocks, block_cols);
}

}  // extern "C"
