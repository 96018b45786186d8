// Accuracy main for the native oracle: d/dx sin(x) on [0, 2pi] vs cos(x),
// printed as average absolute error — the native counterpart of the
// reference oracle's accuracy harness (lanl-implementation/test_npts.c).
//
// Usage: ./test_oracle [N] [NBLOCKS] [BATCH]

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" int cfd_compact_dfdx_pade4(const double* f, double* dfdx,
                                      int64_t n, int64_t batch,
                                      int64_t nblocks, double dx);

int main(int argc, char** argv) {
  const int64_t n = argc > 1 ? atoll(argv[1]) : 128;
  const int64_t nblocks = argc > 2 ? atoll(argv[2]) : 4;
  const int64_t batch = argc > 3 ? atoll(argv[3]) : 8;
  const double L = 2.0 * M_PI;
  const double dx = L / (double)(n - 1);

  std::vector<double> f(n * batch), df(n * batch);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t b = 0; b < batch; ++b) f[i * batch + b] = sin(i * dx);

  if (cfd_compact_dfdx_pade4(f.data(), df.data(), n, batch, nblocks, dx)) {
    fprintf(stderr, "solver error\n");
    return 1;
  }
  double err = 0.0;
  for (int64_t i = 0; i < n; ++i)
    for (int64_t b = 0; b < batch; ++b)
      err += fabs(df[i * batch + b] - cos(i * dx));
  err /= (double)(n * batch);
  printf("n=%lld nblocks=%lld batch=%lld avg_abs_err=%.3e\n",
         (long long)n, (long long)nblocks, (long long)batch, err);
  return err < 1e-3 ? 0 : 2;
}
