// Fuzz gate: the engine's striped SSW port (sw_striped_byte/word +
// ssw_align_c) must be bit-exact vs the REAL reference library
// (/root/reference/ext/ssw/ssw.c, compiled read-only into this binary):
// score, begin/end coordinates, flag, and the banded_sw cigar, across
// random parameter combinations (including O == E, which exposes the
// striped lazy-F pruning semantics textbook DP misses — see
// engine.cpp's striped-pass comment) and adversarial inputs (N codes,
// tandem repeats, byte-saturating scores that force the word rerun).
#define RABBIT_ENGINE_FUZZ
#include "../../rabbitsalign_tpu/native/engine.cpp"

extern "C" {
#include "/root/reference/ext/ssw/ssw.h"
}

#include <random>

static void check(const std::vector<u8>& q, const std::vector<u8>& r, int A,
                  int B, int O, int E, engine::SswScratch& s, long& n_checked) {
    int m = (int)q.size(), n = (int)r.size();
    // reference ssw: 5x5 matrix, maskLen = readLen/2 (ssw_cpp style)
    int8_t mat[25];
    for (int i = 0; i < 5; ++i)
        for (int j = 0; j < 5; ++j)
            mat[i * 5 + j] = (i == j && i < 4) ? (int8_t)A : (int8_t)(-B);
    std::vector<int8_t> q8(q.begin(), q.end()), r8(r.begin(), r.end());
    s_profile* prof = ssw_init(q8.data(), m, mat, 5, 2);
    int maskLen = m / 2 < 15 ? 15 : m / 2;
    // flag/filters exactly as ssw_cpp's default Filter (the reference
    // Aligner's path): begin+cigar requested, score_filter 0,
    // distance_filter 32767
    s_align* ra = ssw_align(prof, r8.data(), n, (uint8_t)O, (uint8_t)E, 0x0f,
                            0, 32767, maskLen);
    engine::SswResultC ours =
        engine::ssw_align_c(q.data(), m, r.data(), n, A, B, O, E, s);

    auto die = [&](const char* what) {
        fprintf(stderr,
                "MISMATCH (%s) A=%d B=%d O=%d E=%d m=%d n=%d\n"
                "  ref: score=%d rb=%d re=%d qb=%d qe=%d flag=%d\n"
                "  our: score=%lld rb=%lld re=%lld qb=%lld qe=%lld flag=%d\n",
                what, A, B, O, E, m, n, ra->score1, ra->ref_begin1,
                ra->ref_end1, ra->read_begin1, ra->read_end1, ra->flag,
                (long long)ours.score1, (long long)ours.ref_begin,
                (long long)ours.ref_end, (long long)ours.read_begin,
                (long long)ours.read_end, ours.flag);
        fprintf(stderr, "  q:");
        for (auto c : q) fputc("ACGTN"[c], stderr);
        fprintf(stderr, "\n  r:");
        for (auto c : r) fputc("ACGTN"[c], stderr);
        fprintf(stderr, "\n  ref cigar:");
        for (int i = 0; i < ra->cigarLen; ++i)
            fprintf(stderr, " %u%c", ra->cigar[i] >> 4, "MIDNSHP=X"[ra->cigar[i] & 0xf]);
        fprintf(stderr, "\n  our cigar:");
        for (auto op : ours.cigar.ops)
            fprintf(stderr, " %u%c", (unsigned)op >> 4, "MIDNSHP=X"[op & 0xf]);
        fprintf(stderr, "\n");
        exit(1);
    };
    if (ra->score1 == 0) {
        // zero-score edge: our port returns the fixed sentinel
        if (ours.score1 != 0) die("zero-score");
    } else {
        if (ours.score1 != ra->score1 || ours.ref_begin != ra->ref_begin1 ||
            ours.ref_end != ra->ref_end1 ||
            ours.read_begin != ra->read_begin1 ||
            ours.read_end != ra->read_end1 || ours.flag != ra->flag)
            die("coords");
        // cigar comparison (M/I/D ints, same packing)
        if ((int)ours.cigar.ops.size() != ra->cigarLen) die("cigar-len");
        for (int i = 0; i < ra->cigarLen; ++i)
            if ((uint32_t)ours.cigar.ops[i] != ra->cigar[i]) die("cigar");
    }
    align_destroy(ra);
    init_destroy(prof);
    n_checked++;
}

int main() {
    std::mt19937 rng(4242);
    engine::SswScratch s;
    long n_checked = 0;
    for (int iter = 0; iter < 6000; ++iter) {
        int A = 1 + rng() % 4, B = 2 + rng() % 11;
        int O = 1 + rng() % 24;
        int E = 1 + rng() % std::min(O, 6);
        int mode = iter % 6;
        int m = 1 + rng() % (mode == 5 ? 700 : 300);
        int n = 1 + rng() % 900;
        std::vector<u8> q(m), r(n);
        for (auto& c : q) c = rng() % 13 == 12 ? 4 : rng() % 4;
        for (auto& c : r) c = rng() % 23 == 22 ? 4 : rng() % 4;
        if (mode == 1 && n > m) {
            int st = rng() % (n - m);
            for (int i = 0; i < m; ++i)
                r[st + i] = rng() % 10 == 0 ? rng() % 4 : q[i];
        } else if (mode == 2) {
            // tandem repeats on both sides: tie-heavy, multi-gap
            int u = 3 + rng() % 24;
            for (int i = 0; i < m; ++i) q[i] = (u8)((i % u) % 4);
            for (int i = 0; i < n; ++i) r[i] = (u8)((i % u) % 4);
        } else if (mode == 3) {
            for (auto& c : q) c = 0;
            for (auto& c : r) c = 1;  // all-mismatch -> zero score
        } else if (mode == 5 && n > m) {
            // long high-identity pair: drives byte saturation -> word
            int st = rng() % (n - m);
            for (int i = 0; i < m; ++i)
                r[st + i] = rng() % 40 == 0 ? rng() % 4 : q[i];
        }
        check(q, r, A, B, O, E, s, n_checked);
    }
    printf("ssw striped-exact fuzz: %ld pairs OK (vs reference ssw.c)\n",
           n_checked);
    return 0;
}
