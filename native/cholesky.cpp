// Sparse numeric Cholesky (up-looking LL^T) for the host setup path.
//
// Reference role: core/factorization/cholesky_kernels.hpp +
// elimination-forest-driven numeric factorization (symbolic.cpp) — the
// TPU framework keeps factorization a host setup pass (like the
// reference's reference/omp backends) and ships the factors to device
// triangular solvers.  Algorithm: textbook up-looking Cholesky with
// elimination-tree reach (T. Davis, "Direct Methods for Sparse Linear
// Systems"), O(flops(L)) time, O(nnz(L)) memory — replaces the round-3
// dense densify-and-np.linalg.cholesky (O(n^2) memory, toy-scale only).
//
// Input: CSR of the FULL symmetric matrix (sorted column indices).
// Output: L in CSC (columns sorted by construction: row k is appended to
// each reached column j while k sweeps upward).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct CholResult {
  int64_t n = 0;
  std::vector<int64_t> col_ptr;   // CSC pointers of L (n+1)
  std::vector<int64_t> row_idx;   // CSC row indices (sorted per column)
  std::vector<double> val;        // CSC values
};

// elimination tree of the symmetric pattern (Liu's algorithm with path
// compression), using only the strictly-lower part of each CSR row
void etree(int64_t n, const int64_t* indptr, const int64_t* indices,
           std::vector<int64_t>& parent) {
  parent.assign(n, -1);
  std::vector<int64_t> ancestor(n, -1);
  for (int64_t k = 0; k < n; ++k) {
    for (int64_t t = indptr[k]; t < indptr[k + 1]; ++t) {
      int64_t i = indices[t];
      if (i >= k) continue;
      while (i != -1 && i != k) {
        int64_t next = ancestor[i];
        ancestor[i] = k;
        if (next == -1) {
          parent[i] = k;
          break;
        }
        i = next;
      }
    }
  }
}

}  // namespace

extern "C" {

// returns 0 on success, 1 = not positive definite (breakdown row in
// *info), 2 = allocation failure.  handle receives a CholResult*.
int gko_chol_factor(int64_t n, const int64_t* indptr,
                    const int64_t* indices, const double* values,
                    void** handle, int64_t* info) {
  *handle = nullptr;
  *info = -1;
  try {
    auto* res = new CholResult();
    res->n = n;
    std::vector<int64_t> parent;
    etree(n, indptr, indices, parent);

    // per-column storage of L, appended in increasing row order
    std::vector<std::vector<int64_t>> col_rows(n);
    std::vector<std::vector<double>> col_vals(n);
    std::vector<double> diag(n, 0.0);

    std::vector<double> x(n, 0.0);       // sparse accumulator
    std::vector<int64_t> stack(n);       // ereach result
    std::vector<int64_t> flag(n, -1);    // visitation mark per row k

    for (int64_t k = 0; k < n; ++k) {
      // ereach: pattern of L(k, 0:k) in topological order at
      // stack[top..n-1]; scatter A(k, 0:k] into x along the way
      int64_t top = n;
      flag[k] = k;
      double d = 0.0;  // A(k,k)
      for (int64_t t = indptr[k]; t < indptr[k + 1]; ++t) {
        int64_t i = indices[t];
        if (i > k) continue;
        if (i == k) {
          d = values[t];
          continue;
        }
        x[i] = values[t];
        int64_t len = 0;
        while (flag[i] != k) {  // walk up the etree until marked
          stack[len++] = i;
          flag[i] = k;
          i = parent[i];
        }
        while (len > 0) stack[--top] = stack[--len];
      }
      // sparse triangular solve along the reach (topological order)
      for (int64_t s = top; s < n; ++s) {
        int64_t j = stack[s];
        double lkj = x[j] / diag[j];
        x[j] = 0.0;
        // x -= lkj * L(j+1:, j): entries of column j below row j are
        // exactly the rows appended so far (all < k by construction)
        const auto& rj = col_rows[j];
        const auto& vj = col_vals[j];
        for (size_t p = 0; p < rj.size(); ++p) x[rj[p]] -= vj[p] * lkj;
        d -= lkj * lkj;
        col_rows[j].push_back(k);
        col_vals[j].push_back(lkj);
      }
      if (!(d > 0.0)) {
        *info = k;
        delete res;
        return 1;
      }
      diag[k] = std::sqrt(d);
    }

    // assemble CSC with the diagonal first in each column
    int64_t lnnz = n;
    for (int64_t j = 0; j < n; ++j) lnnz += (int64_t)col_rows[j].size();
    res->col_ptr.resize(n + 1);
    res->row_idx.reserve(lnnz);
    res->val.reserve(lnnz);
    res->col_ptr[0] = 0;
    for (int64_t j = 0; j < n; ++j) {
      res->row_idx.push_back(j);
      res->val.push_back(diag[j]);
      for (size_t p = 0; p < col_rows[j].size(); ++p) {
        res->row_idx.push_back(col_rows[j][p]);
        res->val.push_back(col_vals[j][p]);
      }
      res->col_ptr[j + 1] = (int64_t)res->row_idx.size();
    }
    *handle = res;
    *info = lnnz;
    return 0;
  } catch (...) {
    return 2;
  }
}

void gko_chol_sizes(void* handle, int64_t* n, int64_t* lnnz) {
  auto* res = static_cast<CholResult*>(handle);
  *n = res->n;
  *lnnz = (int64_t)res->row_idx.size();
}

void gko_chol_fill(void* handle, int64_t* col_ptr, int64_t* row_idx,
                   double* val) {
  auto* res = static_cast<CholResult*>(handle);
  std::memcpy(col_ptr, res->col_ptr.data(),
              res->col_ptr.size() * sizeof(int64_t));
  std::memcpy(row_idx, res->row_idx.data(),
              res->row_idx.size() * sizeof(int64_t));
  std::memcpy(val, res->val.data(), res->val.size() * sizeof(double));
}

void gko_chol_free(void* handle) {
  delete static_cast<CholResult*>(handle);
}

}  // extern "C"
