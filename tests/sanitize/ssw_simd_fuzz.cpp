// Fuzz gate: the AVX2 striped forward pass must be bit-exact vs the
// scalar ssw_forward for (score, ref_end, read_end) across random pairs
// of mixed lengths/similarities (including N codes and all-mismatch).
#define RABBIT_ENGINE_FUZZ
#include "../../rabbitsalign_tpu/native/engine.cpp"

#include <random>

int main() {
#ifndef __AVX2__
    printf("no AVX2; nothing to fuzz\n");
    return 0;
#else
    std::mt19937 rng(42);
    engine::SswScratch s;
    long n_checked = 0;
    for (int iter = 0; iter < 4000; ++iter) {
        int m = 1 + rng() % 512;
        int n = 1 + rng() % 2048;
        std::vector<u8> q(m), r(n);
        int mode = iter % 5;
        for (auto& c : q) c = rng() % 5 == 4 ? 4 : rng() % 4;
        for (auto& c : r) c = rng() % 13 == 12 ? 4 : rng() % 4;
        if (mode == 1 && n > m) {
            // plant the query with mutations
            int st = rng() % (n - m);
            for (int i = 0; i < m; ++i)
                r[st + i] = rng() % 10 == 0 ? rng() % 4 : q[i];
        } else if (mode == 2) {
            for (auto& c : q) c = 0;  // all-A vs random
        } else if (mode == 3) {
            for (auto& c : q) c = 0;
            for (auto& c : r) c = 1;  // all-mismatch -> zero score
        }
        auto fwd = engine::ssw_forward(q.data(), m, r.data(), n, 2, 8, 12, 1,
                                       s.H, s.F, s.bestH);
        i64 best, re, qe;
        bool ok = engine::ssw_forward_simd(q.data(), m, r.data(), n, 2, 8, 12,
                                           1, s.simd, best, re, qe);
        if (!ok) continue;
        n_checked++;
        if (best != fwd.score || re != fwd.ref_end || qe != fwd.read_end) {
            printf("AVX2 MISMATCH iter=%d m=%d n=%d mode=%d: scalar "
                   "(%ld,%ld,%ld) simd (%ld,%ld,%ld)\n",
                   iter, m, n, mode, (long)fwd.score, (long)fwd.ref_end,
                   (long)fwd.read_end, (long)best, (long)re, (long)qe);
            return 1;
        }
#ifdef __AVX512BW__
        if (engine::ssw_forward_simd512(q.data(), m, r.data(), n, 2, 8, 12, 1,
                                        s.simd, best, re, qe) &&
            (best != fwd.score || re != fwd.ref_end || qe != fwd.read_end)) {
            printf("AVX512 MISMATCH iter=%d m=%d n=%d mode=%d: scalar "
                   "(%ld,%ld,%ld) simd (%ld,%ld,%ld)\n",
                   iter, m, n, mode, (long)fwd.score, (long)fwd.ref_end,
                   (long)fwd.read_end, (long)best, (long)re, (long)qe);
            return 1;
        }
#endif
    }
    printf("ssw simd fuzz: %ld pairs bit-exact\n", n_checked);
    return 0;
#endif
}
