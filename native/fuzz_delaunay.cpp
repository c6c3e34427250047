// Standalone sanitizer driver for the native mesh engine (not shipped in
// libmeshcore.so): exercises cdt_triangulate / laplacian_smooth /
// refine_midpoint on randomized polygon + lattice inputs, mirroring how
// data/triangulate.py calls them. Build and run under ASan/UBSan:
//   make fuzz   (see Makefile)
#include <cstdint>
#include <cstdio>
#include <cmath>
#include <random>
#include <vector>

extern "C" {
int64_t cdt_triangulate(const double*, int64_t, const int64_t*, int64_t,
                        int64_t*, int64_t);
void laplacian_smooth(double*, int64_t, const int64_t*, int64_t,
                      const uint8_t*, int64_t);
int64_t refine_midpoint(const double*, int64_t, const int64_t*, int64_t,
                        double*, int64_t*, int64_t*);
}

int main() {
  std::mt19937_64 gen(1234);
  std::uniform_real_distribution<double> uni(0, 1);
  int failures = 0;
  for (int trial = 0; trial < 200; ++trial) {
    // random polygon boundary (closed ring) + interior jittered lattice
    int nb = 8 + (int)(uni(gen) * 120);
    double cx = uni(gen) * 1e4, cy = uni(gen) * 1e4, R = 50 + uni(gen) * 3000;
    std::vector<double> pts;
    for (int i = 0; i < nb; ++i) {
      double th = 2 * M_PI * i / nb;
      double r = R * (0.4 + 0.8 * uni(gen));  // spiky
      pts.push_back(cx + r * std::cos(th));
      pts.push_back(cy + r * std::sin(th));
    }
    int ni = (int)(uni(gen) * 400);
    for (int i = 0; i < ni; ++i) {
      pts.push_back(cx + (uni(gen) - 0.5) * 2 * R);
      pts.push_back(cy + (uni(gen) - 0.5) * 2 * R);
    }
    // occasionally add exact duplicates / collinear points (stress predicates)
    if (trial % 5 == 0 && ni > 2) {
      pts.push_back(pts[2 * nb]);
      pts.push_back(pts[2 * nb + 1]);
      pts.push_back((pts[0] + pts[2]) / 2);
      pts.push_back((pts[1] + pts[3]) / 2);
    }
    int64_t n = (int64_t)pts.size() / 2;
    std::vector<int64_t> segs;
    for (int i = 0; i < nb; ++i) {
      segs.push_back(i);
      segs.push_back((i + 1) % nb);
    }
    int64_t cap = 4 * (n > 4 ? n : 4);
    std::vector<int64_t> tris(cap * 3);
    int64_t m = cdt_triangulate(pts.data(), n, segs.data(), nb, tris.data(), cap);
    if (m < 0) { std::printf("trial %d: code %lld (n=%lld nb=%d)\n", trial, (long long)m, (long long)n, nb); ++failures; continue; }
    // validate indices in range
    for (int64_t i = 0; i < 3 * m; ++i)
      if (tris[i] < 0 || tris[i] >= n) { std::printf("BAD INDEX trial %d\n", trial); return 1; }
    std::vector<uint8_t> fixed(n, 0);
    for (int i = 0; i < nb; ++i) fixed[i] = 1;
    laplacian_smooth(pts.data(), n, tris.data(), m, fixed.data(), 3);
    std::vector<double> rp((n + 3 * m) * 2);
    std::vector<int64_t> rt(4 * m * 3);
    int64_t np_out = 0;
    int64_t mr = refine_midpoint(pts.data(), n, tris.data(), m, rp.data(),
                                 rt.data(), &np_out);
    if (mr != 4 * m || np_out > n + 3 * m) { std::printf("BAD REFINE trial %d\n", trial); return 1; }
  }
  std::printf("ok (%d recoverable failures / 200 trials)\n", failures);
  return 0;
}
