// Native host-side core for nbldpc_tpu (SURVEY.md §2.1 C1/C2/C4).
//
// The reference genre implements its GF(q) tables, parity-check-matrix
// handling and encoder Gaussian elimination in C++; this library is the
// framework's native equivalent for the HOST side of the pipeline (device
// compute is Pallas/XLA). Python keeps byte-identical fallbacks
// (nbldpc_tpu/gf.py, encode.py, codegen.py); tests assert equality.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -o libnbldpc_host.so nbldpc_host.cpp

#include <cstdint>
#include <cstring>
#include <vector>
#include <queue>

extern "C" {

// ---------------------------------------------------------------------------
// GF(2^p) tables from a primitive polynomial (LFSR construction identical to
// gf.py). Returns 0 on success, -1 if poly is not primitive for q.
// exp: [2*(q-1)], log: [q], inv: [q], mul: [q*q] (row-major), all int32.
// ---------------------------------------------------------------------------
int nb_gf_tables(int q, int poly, int32_t* exp_t, int32_t* log_t,
                 int32_t* inv_t, int32_t* mul_t) {
  int L = q - 1;
  int x = 1;
  for (int i = 0; i < L; ++i) {
    exp_t[i] = x;
    log_t[x] = i;
    x <<= 1;
    if (x & q) x ^= poly;
  }
  if (x != 1) return -1;  // not primitive
  for (int i = 0; i < L; ++i) exp_t[L + i] = exp_t[i];
  log_t[0] = 0;  // sentinel (unused)
  inv_t[0] = 0;
  for (int a = 1; a < q; ++a) inv_t[a] = exp_t[(L - log_t[a]) % L];
  for (int a = 0; a < q; ++a) {
    for (int b = 0; b < q; ++b) {
      mul_t[a * q + b] =
          (a == 0 || b == 0) ? 0 : exp_t[(log_t[a] + log_t[b]) % L];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// GF(q) row reduction with the same pivoting order as encode.py
// (first nonzero row per column, scale pivot to 1, eliminate everywhere).
// R: [m*n] int32 in/out. pivots: [m] out. Returns rank.
// mul: [q*q], inv: [q] tables from nb_gf_tables.
// ---------------------------------------------------------------------------
int nb_gf_row_reduce(int q, int64_t m, int64_t n, int32_t* R,
                     const int32_t* mul, const int32_t* inv,
                     int32_t* pivots) {
  int64_t r = 0;
  for (int64_t c = 0; c < n && r < m; ++c) {
    int64_t pr = -1;
    for (int64_t i = r; i < m; ++i) {
      if (R[i * n + c]) { pr = i; break; }
    }
    if (pr < 0) continue;
    if (pr != r) {
      for (int64_t j = 0; j < n; ++j) std::swap(R[r * n + j], R[pr * n + j]);
    }
    int32_t s = inv[R[r * n + c]];
    for (int64_t j = 0; j < n; ++j) R[r * n + j] = mul[R[r * n + j] * q + s];
    for (int64_t i = 0; i < m; ++i) {
      int32_t f = R[i * n + c];
      if (i == r || !f) continue;
      for (int64_t j = 0; j < n; ++j)
        R[i * n + j] ^= mul[(int64_t)f * q + R[r * n + j]];
    }
    pivots[r] = (int32_t)c;
    ++r;
  }
  return (int)r;
}

// ---------------------------------------------------------------------------
// Bipartite BFS for PEG code construction (codegen.py::_peg_structure inner
// loop): distances from variable v to every check over the current subgraph.
// Adjacency in CSR: vn_ptr[n+1]/vn_adj (vn -> checks), cn_ptr[m+1]/cn_adj
// (check -> vns). dist: [m] out, set to INT32_MAX when unreachable.
// ---------------------------------------------------------------------------
void nb_peg_bfs(int n, int m, const int32_t* vn_ptr, const int32_t* vn_adj,
                const int32_t* cn_ptr, const int32_t* cn_adj, int v,
                int32_t* dist) {
  const int32_t INF = INT32_MAX;
  std::vector<uint8_t> seen_v(n, 0), seen_c(m, 0);
  for (int i = 0; i < m; ++i) dist[i] = INF;
  // frontier entries: node id, flag (0 = variable, 1 = check), depth
  std::queue<std::pair<int32_t, int32_t>> fr;  // (node | (flag<<30), depth)
  seen_v[v] = 1;
  fr.push({v, 0});
  while (!fr.empty()) {
    auto [packed, d] = fr.front();
    fr.pop();
    bool is_check = packed & (1 << 30);
    int node = packed & ~(1 << 30);
    if (!is_check) {
      for (int32_t k = vn_ptr[node]; k < vn_ptr[node + 1]; ++k) {
        int c = vn_adj[k];
        if (!seen_c[c]) {
          seen_c[c] = 1;
          dist[c] = d + 1;
          fr.push({c | (1 << 30), d + 1});
        }
      }
    } else {
      for (int32_t k = cn_ptr[node]; k < cn_ptr[node + 1]; ++k) {
        int u = cn_adj[k];
        if (!seen_v[u]) {
          seen_v[u] = 1;
          fr.push({u, d + 1});
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// GF(q) matrix-vector syndrome on host (validation utility):
// s[m] = XOR_j mul[H[m,j], c[j]] over nonzeros given in CSR.
// ---------------------------------------------------------------------------
void nb_syndrome(int q, int m, const int32_t* row_ptr, const int32_t* row_col,
                 const int32_t* row_val, const int32_t* mul,
                 const int32_t* cw, int32_t* syn) {
  for (int i = 0; i < m; ++i) {
    int32_t s = 0;
    for (int32_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k)
      s ^= mul[(int64_t)row_val[k] * q + cw[row_col[k]]];
    syn[i] = s;
  }
}

}  // extern "C"
