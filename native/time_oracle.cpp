// Timing main for the native oracle: 20 timed phi/psi solves on a unit RHS,
// the native counterpart of the reference oracle's timing harness
// (lanl-implementation/time_npts.c).
//
// Usage: ./time_oracle [N] [NBLOCKS] [BATCH]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" int cfd_phi_psi_solve(const double* dl, const double* d,
                                 const double* du, const double* rhs,
                                 double* x, int64_t n, int64_t batch,
                                 int64_t nblocks);

int main(int argc, char** argv) {
  const int64_t n = argc > 1 ? atoll(argv[1]) : 256;
  const int64_t nblocks = argc > 2 ? atoll(argv[2]) : 4;
  const int64_t batch = argc > 3 ? atoll(argv[3]) : 4096;

  std::vector<double> dl(n, 0.25), d(n, 1.0), du(n, 0.25);
  dl[0] = du[n - 1] = 0.0;
  std::vector<double> rhs(n * batch, 1.0), x(n * batch);

  const int iters = 20;
  cfd_phi_psi_solve(dl.data(), d.data(), du.data(), rhs.data(), x.data(), n,
                    batch, nblocks);  // warm-up
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it)
    cfd_phi_psi_solve(dl.data(), d.data(), du.data(), rhs.data(), x.data(),
                      n, batch, nblocks);
  auto t1 = std::chrono::steady_clock::now();
  const double s =
      std::chrono::duration<double>(t1 - t0).count() / (double)iters;
  printf("n=%lld nblocks=%lld batch=%lld time=%.6f s  %.2f Mpt/s\n",
         (long long)n, (long long)nblocks, (long long)batch, s,
         (double)(n * batch) / s / 1e6);
  return 0;
}
