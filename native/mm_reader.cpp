// Native MatrixMarket -> CSR parser for conjugategradient_tpu.
//
// The reference ships a native C++ parser as part of its harness
// (test/mm_reader.cpp: header grammar :109-144, real-coordinate-symmetric
// body :45-107).  This is the rebuild: a standalone shared library with a
// C ABI consumed from Python via ctypes (conjugategradient_tpu/io/native.py),
// supporting the full symmetry set (general/symmetric/skew-symmetric/
// hermitian-as-real), integer and pattern fields, 1-based -> 0-based index
// conversion, symmetric mirror expansion of off-diagonals, duplicate
// summing, and a stable row-major CSR build.  The reference's known bugs
// (non-strict sort comparator, swallowed line between header and comments)
// are deliberately not reproduced.
//
// Build: make -C native   (produces libcgtpu_io.so)
//
// ABI (all functions C linkage):
//   int  cg_mm_open(const char* path, void** handle,
//                   int64_t* nrows, int64_t* ncols, int64_t* nnz_expanded);
//        -> 0 on success; on failure returns nonzero and *handle (if set)
//           carries an error string retrievable via cg_mm_error.
//   int  cg_mm_fill(void* handle, double* data, int32_t* indices,
//                   int64_t* indptr);
//        -> copies CSR arrays into caller buffers sized from cg_mm_open.
//   const char* cg_mm_error(void* handle);
//   void cg_mm_close(void* handle);

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

namespace {

struct Handle {
  std::vector<double> data;
  std::vector<int32_t> indices;
  std::vector<int64_t> indptr;
  int64_t nrows = 0, ncols = 0;
  std::string error;
};

// Tokenize one line in place; returns number of tokens found (up to max).
int split_tokens(char* line, char** toks, int max) {
  int n = 0;
  char* p = line;
  while (n < max) {
    while (*p && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (!*p) break;
    toks[n++] = p;
    while (*p && !std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (*p) *p++ = '\0';
  }
  return n;
}

bool read_content_line(FILE* f, std::string& buf) {
  buf.clear();
  char chunk[1 << 16];
  while (std::fgets(chunk, sizeof chunk, f)) {
    buf = chunk;
    // strip trailing newline; skip comments and blank lines
    while (!buf.empty() && (buf.back() == '\n' || buf.back() == '\r'))
      buf.pop_back();
    bool blank = true;
    for (char c : buf)
      if (!std::isspace(static_cast<unsigned char>(c))) { blank = false; break; }
    if (blank || buf[0] == '%') continue;
    return true;
  }
  return false;
}

std::string lower(std::string s) {
  for (char& c : s) c = static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
  return s;
}

}  // namespace

extern "C" {

const char* cg_mm_error(void* handle) {
  if (!handle) return "no handle";
  return static_cast<Handle*>(handle)->error.c_str();
}

void cg_mm_close(void* handle) { delete static_cast<Handle*>(handle); }

int cg_mm_open(const char* path, void** handle_out, int64_t* nrows,
               int64_t* ncols, int64_t* nnz_expanded) {
  Handle* h = new Handle();
  *handle_out = h;

  FILE* f = std::fopen(path, "r");
  if (!f) {
    h->error = "cannot open file";
    return 1;
  }

  char line[1 << 16];
  if (!std::fgets(line, sizeof line, f)) {
    h->error = "empty file";
    std::fclose(f);
    return 1;
  }
  char* toks[8];
  int nt = split_tokens(line, toks, 8);
  if (nt < 5 || std::strcmp(toks[0], "%%MatrixMarket") != 0) {
    h->error = "not a MatrixMarket banner";
    std::fclose(f);
    return 1;
  }
  std::string obj = lower(toks[1]), fmt = lower(toks[2]), field = lower(toks[3]),
              sym = lower(toks[4]);
  if (obj != "matrix" || fmt != "coordinate") {
    h->error = "only matrix/coordinate supported by the native parser";
    std::fclose(f);
    return 1;
  }
  if (field != "real" && field != "integer" && field != "pattern") {
    h->error = "unsupported field: " + field;
    std::fclose(f);
    return 1;
  }
  bool symmetric = (sym == "symmetric" || sym == "hermitian");
  bool skew = (sym == "skew-symmetric");
  if (!symmetric && !skew && sym != "general") {
    h->error = "unsupported symmetry: " + sym;
    std::fclose(f);
    return 1;
  }
  bool pattern = (field == "pattern");

  std::string content;
  if (!read_content_line(f, content)) {
    h->error = "missing size line";
    std::fclose(f);
    return 1;
  }
  int64_t nr = 0, nc = 0, nnz = 0;
  {
    std::vector<char> mut(content.begin(), content.end());
    mut.push_back('\0');
    char* t[4];
    if (split_tokens(mut.data(), t, 4) < 3) {
      h->error = "bad size line";
      std::fclose(f);
      return 1;
    }
    nr = std::strtoll(t[0], nullptr, 10);
    nc = std::strtoll(t[1], nullptr, 10);
    nnz = std::strtoll(t[2], nullptr, 10);
  }
  if (nr <= 0 || nc <= 0 || nnz < 0) {
    h->error = "invalid dimensions";
    std::fclose(f);
    return 1;
  }

  std::vector<int64_t> rows, cols;
  std::vector<double> vals;
  rows.reserve(symmetric || skew ? 2 * nnz : nnz);
  cols.reserve(rows.capacity());
  vals.reserve(rows.capacity());

  for (int64_t i = 0; i < nnz; ++i) {
    if (!read_content_line(f, content)) {
      h->error = "unexpected EOF in entries";
      std::fclose(f);
      return 1;
    }
    std::vector<char> mut(content.begin(), content.end());
    mut.push_back('\0');
    char* t[4];
    int ntok = split_tokens(mut.data(), t, 4);
    if (ntok < (pattern ? 2 : 3)) {
      h->error = "malformed entry line";
      std::fclose(f);
      return 1;
    }
    int64_t r = std::strtoll(t[0], nullptr, 10) - 1;  // 1-based -> 0-based
    int64_t c = std::strtoll(t[1], nullptr, 10) - 1;
    double v = pattern ? 1.0 : std::strtod(t[2], nullptr);
    if (r < 0 || r >= nr || c < 0 || c >= nc) {
      h->error = "entry index out of range";
      std::fclose(f);
      return 1;
    }
    rows.push_back(r);
    cols.push_back(c);
    vals.push_back(v);
    if ((symmetric || skew) && r != c) {  // mirror expansion of off-diagonals
      rows.push_back(c);
      cols.push_back(r);
      vals.push_back(skew ? -v : v);
    }
  }
  std::fclose(f);

  // stable row-major sort via permutation (strict weak ordering)
  const int64_t m = static_cast<int64_t>(rows.size());
  std::vector<int64_t> perm(m);
  std::iota(perm.begin(), perm.end(), 0);
  std::sort(perm.begin(), perm.end(), [&](int64_t a, int64_t b) {
    if (rows[a] != rows[b]) return rows[a] < rows[b];
    if (cols[a] != cols[b]) return cols[a] < cols[b];
    return a < b;  // stability for duplicates
  });

  // CSR build, summing duplicates
  h->nrows = nr;
  h->ncols = nc;
  h->indptr.assign(nr + 1, 0);
  h->data.reserve(m);
  h->indices.reserve(m);
  int64_t prev_r = -1, prev_c = -1;
  for (int64_t k = 0; k < m; ++k) {
    int64_t idx = perm[k];
    int64_t r = rows[idx], c = cols[idx];
    if (r == prev_r && c == prev_c) {
      h->data.back() += vals[idx];
    } else {
      h->data.push_back(vals[idx]);
      h->indices.push_back(static_cast<int32_t>(c));
      h->indptr[r + 1]++;
      prev_r = r;
      prev_c = c;
    }
  }
  for (int64_t r = 0; r < nr; ++r) h->indptr[r + 1] += h->indptr[r];

  *nrows = nr;
  *ncols = nc;
  *nnz_expanded = static_cast<int64_t>(h->data.size());
  return 0;
}

int cg_mm_fill(void* handle, double* data, int32_t* indices, int64_t* indptr) {
  Handle* h = static_cast<Handle*>(handle);
  if (!h) return 1;
  std::memcpy(data, h->data.data(), h->data.size() * sizeof(double));
  std::memcpy(indices, h->indices.data(), h->indices.size() * sizeof(int32_t));
  std::memcpy(indptr, h->indptr.data(), h->indptr.size() * sizeof(int64_t));
  return 0;
}

}  // extern "C"
