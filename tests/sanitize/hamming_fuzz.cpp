// Fuzz gate: the sparse-mismatch Hamming fast path must be bit-exact vs
// the dense per-base scan (hamming_fastpath_dense, the original
// algorithm and the oracle here) across random pairs covering every
// mismatch density, ragged lengths, and degenerate scoring parameters
// (match == 0, mismatch == 0, end_bonus == 0, negatives).
#define RABBIT_ENGINE_FUZZ
#include "../../rabbitsalign_tpu/native/engine.cpp"

#include <cstdio>
#include <random>

static bool same(const engine::AlignmentInfoC& a,
                 const engine::AlignmentInfoC& b) {
    return a.sw_score == b.sw_score && a.edit_distance == b.edit_distance &&
           a.ref_start == b.ref_start && a.ref_end == b.ref_end &&
           a.query_start == b.query_start && a.query_end == b.query_end &&
           a.cigar.ops == b.cigar.ops;
}

int main() {
    std::mt19937 rng(2024);
    const u8 bases[4] = {'A', 'C', 'G', 'T'};
    // (match, mismatch, end_bonus): production defaults + degenerates;
    // negative rows route the sparse path to the dense fallback, so they
    // assert the routing rather than the replay
    const int params[][3] = {{2, 8, 10},  {1, 4, 0},  {2, 8, 0},
                             {0, 8, 10},  {0, 0, 0},  {1, 0, 5},
                             {0, 4, 7},   {5, 1, 1},  {-1, 2, 3},
                             {2, -3, 1}};
    long n_true = 0, n_false = 0;
    for (long iter = 0; iter < 300000; ++iter) {
        i64 n = iter % 7 == 0 ? (i64)(rng() % 4)         // tiny incl. 0
                              : (i64)(1 + rng() % 512);  // up to SSW cap
        std::vector<u8> q(std::max<i64>(n, 1)), r(std::max<i64>(n, 1));
        // mismatch density sweep: mostly near the 5% gate where the
        // interesting segment structure lives
        int densities[] = {0, 1, 2, 4, 7, 10, 50, 900};
        int dens = densities[iter % 8];  // mismatches per ~1000 bases
        for (i64 i = 0; i < n; ++i) {
            q[i] = bases[rng() % 4];
            r[i] = (int)(rng() % 1000) < dens ? bases[rng() % 4] : q[i];
        }
        const int* pp = params[iter % 10];
        engine::AlignmentInfoC a, b;
        bool ra = engine::hamming_fastpath(q.data(), r.data(), n, pp[0],
                                           pp[1], pp[2], a);
        bool rb = engine::hamming_fastpath_dense(q.data(), r.data(), n, pp[0],
                                                 pp[1], pp[2], b);
        if (ra != rb || (ra && !same(a, b))) {
            printf("MISMATCH iter=%ld n=%ld params=(%d,%d,%d) ra=%d rb=%d "
                   "score %d/%d ed %d/%d qs %d/%d qe %d/%d\n",
                   iter, (long)n, pp[0], pp[1], pp[2], (int)ra, (int)rb,
                   a.sw_score, b.sw_score, a.edit_distance, b.edit_distance,
                   a.query_start, b.query_start, a.query_end, b.query_end);
            return 1;
        }
        ra ? ++n_true : ++n_false;
    }
    printf("hamming fuzz OK (%ld aligned, %ld gated)\n", n_true, n_false);
    return 0;
}
