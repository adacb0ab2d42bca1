// Host-side native kernels for annchor_tpu.
//
// The reference gets its "native" speed from numba-JIT kernels and the
// pynndescent `kantorovich` network-simplex (reference:
// annchor/utils.py:12-14, 82-86).  Neither exists in this stack, and the
// exact optimal-transport solve is inherently sequential (pivoting), so it
// stays on the host as C++ while everything batched/parallel runs on TPU.
//
//  * emd_*: exact 1-Wasserstein (Kantorovich) distance between
//    histograms under a dense cost matrix, via successive shortest
//    augmenting paths with node potentials (exact for real-valued
//    supplies; equivalent optimum to network simplex).
//  * lev_batch: plain two-row DP edit distance, fallback used when the
//    python-Levenshtein extension is unavailable.
//
// Built with: g++ -O3 -shared -fPIC  (see annchor_tpu/native/__init__.py)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kInf = 1e300;
constexpr double kFlowTol = 1e-14;

// Exact transportation problem:
//   minimise sum_ij f_ij C_ij  s.t.  sum_j f_ij = a_i, sum_i f_ij = b_j
// a and b must each sum to ~1 (caller normalises).
// Successive shortest paths with Johnson potentials; Dijkstra with
// linear-scan extraction (node count n+m <= a few hundred).
double emd_ssp(const double* a_in, const double* b_in, int n, int m,
               const double* C) {
  std::vector<double> ra(a_in, a_in + n);
  std::vector<double> rb(b_in, b_in + m);
  std::vector<double> f(static_cast<size_t>(n) * m, 0.0);
  std::vector<double> pi(n + m, 0.0);

  std::vector<double> dist(n + m);
  std::vector<int> parent(n + m);
  std::vector<char> done(n + m);

  double remaining = 0.0;
  for (int i = 0; i < n; ++i) remaining += ra[i];
  const double tol = remaining * 1e-12 + 1e-14;

  int max_rounds = 16 * (n + m) + 64;
  while (remaining > tol && max_rounds-- > 0) {
    // --- Dijkstra over the residual graph with reduced costs.
    std::fill(dist.begin(), dist.end(), kInf);
    std::fill(parent.begin(), parent.end(), -1);
    std::fill(done.begin(), done.end(), 0);
    for (int i = 0; i < n; ++i)
      if (ra[i] > kFlowTol) dist[i] = 0.0;

    int t = -1;
    for (int iter = 0; iter < n + m; ++iter) {
      int u = -1;
      double best = kInf;
      for (int v = 0; v < n + m; ++v)
        if (!done[v] && dist[v] < best) { best = dist[v]; u = v; }
      if (u < 0) break;
      done[u] = 1;
      if (u >= n && rb[u - n] > kFlowTol) {
        // first settled sink with remaining demand is the nearest one
        t = u;
        break;
      }
      if (u < n) {
        // source u -> every sink j (uncapacitated forward arc)
        const double base = dist[u] + pi[u];
        const double* Cu = C + static_cast<size_t>(u) * m;
        for (int j = 0; j < m; ++j) {
          // Never re-relax a settled node: with tied costs the reduced
          // cost can be -1e-16 in floating point, and re-parenting a
          // done node creates parent-pointer cycles.
          if (done[n + j]) continue;
          const double nd = base + Cu[j] - pi[n + j];
          if (nd < dist[n + j]) { dist[n + j] = nd; parent[n + j] = u; }
        }
      } else {
        // sink (u-n) -> source i exists iff flow f[i][u-n] > 0
        const int j = u - n;
        const double base = dist[u] + pi[u];
        for (int i = 0; i < n; ++i) {
          if (done[i]) continue;
          if (f[static_cast<size_t>(i) * m + j] > kFlowTol) {
            const double nd = base - C[static_cast<size_t>(i) * m + j] - pi[i];
            if (nd < dist[i]) { dist[i] = nd; parent[i] = u; }
          }
        }
      }
    }

    if (t < 0) break;  // infeasible / numerically drained
    const double bestd = dist[t];

    // --- update potentials
    for (int v = 0; v < n + m; ++v)
      pi[v] += (dist[v] < kInf ? std::min(dist[v], bestd) : bestd);

    // --- bottleneck along the path (path length bounded by node count)
    double delta = rb[t - n];
    int v = t;
    int guard = n + m + 2;
    while (guard-- > 0) {
      const int p = parent[v];
      if (v >= n) {  // arrived via forward arc p -> v
        if (parent[p] == -1 && p < n) { delta = std::min(delta, ra[p]); break; }
      } else {       // arrived via backward arc p(sink) -> v(source)
        delta = std::min(delta, f[static_cast<size_t>(v) * m + (p - n)]);
      }
      v = p;
    }

    // --- augment
    v = t;
    guard = n + m + 2;
    while (guard-- > 0) {
      const int p = parent[v];
      if (v >= n) {
        f[static_cast<size_t>(p) * m + (v - n)] += delta;
        if (parent[p] == -1 && p < n) { ra[p] -= delta; break; }
      } else {
        f[static_cast<size_t>(v) * m + (p - n)] -= delta;
      }
      v = p;
    }
    rb[t - n] -= delta;
    remaining -= delta;
  }

  double total = 0.0;
  for (int i = 0; i < n; ++i) {
    const double* fi = f.data() + static_cast<size_t>(i) * m;
    const double* Ci = C + static_cast<size_t>(i) * m;
    for (int j = 0; j < m; ++j) total += fi[j] * Ci[j];
  }
  return total;
}

// Normalise histograms to unit mass (matches pynndescent kantorovich
// semantics used by the reference, annchor/utils.py:82-86), compress
// away zero-mass bins (digit images are ~50% zeros, and the solver is
// quadratic in the support size), then solve.
double emd_normalised(const double* x, const double* y, int nbins,
                      const double* C) {
  double sx = 0.0, sy = 0.0;
  for (int i = 0; i < nbins; ++i) { sx += x[i]; sy += y[i]; }
  if (sx <= 0.0 || sy <= 0.0) return 0.0;

  std::vector<double> a, b;
  std::vector<int> ia, ib;
  a.reserve(nbins); b.reserve(nbins); ia.reserve(nbins); ib.reserve(nbins);
  for (int i = 0; i < nbins; ++i)
    if (x[i] > 0.0) { a.push_back(x[i] / sx); ia.push_back(i); }
  for (int j = 0; j < nbins; ++j)
    if (y[j] > 0.0) { b.push_back(y[j] / sy); ib.push_back(j); }

  const int n = static_cast<int>(a.size());
  const int m = static_cast<int>(b.size());
  std::vector<double> Csub(static_cast<size_t>(n) * m);
  for (int i = 0; i < n; ++i) {
    const double* Ci = C + static_cast<size_t>(ia[i]) * nbins;
    for (int j = 0; j < m; ++j) Csub[static_cast<size_t>(i) * m + j] = Ci[ib[j]];
  }
  return emd_ssp(a.data(), b.data(), n, m, Csub.data());
}

// Stripe a batch of m independent jobs over the host cores (the
// reference fans the same workloads over joblib worker processes,
// reference annchor/utils.py:152-177; threads avoid its serialisation
// overhead).  Degrades to the calling thread when only one core
// exists or the batch is small.
template <typename Fn>
void parallel_for(long m, Fn&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  long nthreads = std::min<long>(hw ? hw : 1, (m + 63) / 64);
  if (nthreads <= 1) {
    for (long k = 0; k < m; ++k) fn(k);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (long t = 0; t < nthreads; ++t) {
    pool.emplace_back([=]() {
      for (long k = t; k < m; k += nthreads) fn(k);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

double emd_single(const double* a, const double* b, long nbins,
                  const double* cost) {
  return emd_normalised(a, b, static_cast<int>(nbins), cost);
}

// Distances for pairs (I[k] into X, J[k] into Y).  X: (nx, nbins), Y:
// (ny, nbins), both row-major float64.  out: (m,).
int emd_batch(const double* X, long nx, const double* Y, long ny, long nbins,
              const double* cost, const long* I, const long* J, long m,
              double* out) {
  for (long k = 0; k < m; ++k)
    if (I[k] < 0 || I[k] >= nx || J[k] < 0 || J[k] >= ny) return -1;
  parallel_for(m, [=](long k) {
    out[k] = emd_normalised(X + I[k] * nbins, Y + J[k] * nbins,
                            static_cast<int>(nbins), cost);
  });
  return 0;
}

// Fallback edit distance: two-row DP over int32 codepoints.
static int lev_pair(const int32_t* a, int la, const int32_t* b, int lb,
                    std::vector<int32_t>& prev, std::vector<int32_t>& cur) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  prev.resize(lb + 1);
  cur.resize(lb + 1);
  for (int j = 0; j <= lb; ++j) prev[j] = j;
  for (int i = 1; i <= la; ++i) {
    cur[0] = i;
    const int32_t ca = a[i - 1];
    for (int j = 1; j <= lb; ++j) {
      const int32_t sub = prev[j - 1] + (ca != b[j - 1]);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

int lev_batch(const int32_t* codes, const int32_t* lengths, long n, long L,
              const long* I, const long* J, long m, int32_t* out) {
  for (long k = 0; k < m; ++k)
    if (I[k] < 0 || I[k] >= n || J[k] < 0 || J[k] >= n) return -1;
  parallel_for(m, [=](long k) {
    thread_local std::vector<int32_t> prev, cur;
    const long i = I[k], j = J[k];
    out[k] = lev_pair(codes + i * L, lengths[i], codes + j * L, lengths[j],
                      prev, cur);
  });
  return 0;
}

}  // extern "C"
