// Fuzz + A/B timing gate: the AVX-512 8-lane lockstep syncmer automaton
// (syncmers_of_x8_impl) must be bit-exact vs the scalar automaton for
// random reads with Ns, homopolymer runs (equal-hash ties -> rescans),
// unit repeats, and ragged lane lengths, for both window widths (w=5
// r<=250 profiles, w=7 r400). Also reports an in-process A/B timing
// (alternating rounds, so ambient load hits both sides roughly equally).
#include "../../rabbitsalign_tpu/native/seednam.cpp"

#include <chrono>
#include <cstdio>
#include <random>

static void gen_read(std::mt19937& rng, std::vector<u8>& out, int mode,
                     int len) {
    static const char* B = "ACGT";
    out.resize(len);
    if (mode == 0) {  // random with sparse Ns
        for (auto& c : out) c = rng() % 31 == 30 ? 'N' : B[rng() % 4];
    } else if (mode == 1) {  // homopolymer-heavy: tie city
        int i = 0;
        while (i < len) {
            int run = 1 + rng() % 40;
            char b = B[rng() % 4];
            for (; run && i < len; --run, ++i) out[i] = b;
        }
    } else if (mode == 2) {  // short-unit repeats
        int u = 1 + rng() % 6;
        std::vector<char> unit(u);
        for (auto& c : unit) c = B[rng() % 4];
        for (int i = 0; i < len; ++i)
            out[i] = rng() % 53 == 52 ? 'N' : unit[i % u];
    } else {  // random, no Ns
        for (auto& c : out) c = B[rng() % 4];
    }
}

int main(int argc, char** argv) {
#ifndef SEEDNAM_AVX512
    printf("no AVX-512; nothing to fuzz\n");
    return 0;
#else
    std::mt19937 rng(7);
    struct P { int k, s, t; };
    P profs[2] = {{20, 16, 3}, {23, 17, 3}};  // w=5, w=7
    long n_checked = 0, n_sync = 0, n_link = 0;
    for (int iter = 0; iter < 3000; ++iter) {
        P p = profs[iter % 2];
        std::vector<u8> reads[8];
        const u8* seqs[8];
        i64 lens[8];
        for (int l = 0; l < 8; ++l) {
            int mode = (iter + l) % 4;
            int len = (iter % 7 == 3) ? rng() % 30        // degenerate
                                      : 30 + rng() % 370;
            if (iter % 11 == 5 && l >= 6) len = 0;        // empty lanes
            gen_read(rng, reads[l], mode, len);
            seqs[l] = reads[l].data();
            lens[l] = (i64)reads[l].size();
        }
        std::vector<Syncmer> got[8], want;
        std::vector<Syncmer>* outs[8];
        for (int l = 0; l < 8; ++l) outs[l] = &got[l];
        if (p.k - p.s + 1 == 5)
            syncmers_of_x8_impl<5>(seqs, lens, p.k, p.s, p.t, outs);
        else
            syncmers_of_x8_impl<7>(seqs, lens, p.k, p.s, p.t, outs);
        for (int l = 0; l < 8; ++l) {
            syncmers_of(seqs[l], lens[l], p.k, p.s, p.t, want);
            if (want.size() != got[l].size()) {
                printf("FAIL iter=%d lane=%d count %zu != %zu\n", iter, l,
                       got[l].size(), want.size());
                return 1;
            }
            for (size_t j = 0; j < want.size(); ++j) {
                if (want[j].hash != got[l][j].hash ||
                    want[j].pos != got[l][j].pos) {
                    printf("FAIL iter=%d lane=%d j=%zu (%llu,%lld) != "
                           "(%llu,%lld)\n",
                           iter, l, j, (unsigned long long)got[l][j].hash,
                           (long long)got[l][j].pos,
                           (unsigned long long)want[j].hash,
                           (long long)want[j].pos);
                    return 1;
                }
            }
            n_checked++;
            n_sync += (long)want.size();

            // the 8-lane linker vs the scalar linker on the same
            // syncmers (window widths from the r100/r150/r250/r400
            // profiles, plus a tight max_dist to exercise the
            // pos-window mask and an all-ones qmask)
            struct LP { int wmin, wmax, maxd; u64 qm; };
            LP lps[3] = {{5, 11, 80, 0xFFULL},
                         {3, 7, 25, ~0ULL},
                         {9, 23, 255, 0x3FFULL}};
            i64 nsy = (i64)want.size();
            pad_syncmers(want);
            for (const LP& lp : lps) {
                std::vector<QueryRandstrobe> qa, qb;
                link_strobes(want.data(), nsy, lp.wmin, lp.wmax, lp.qm,
                             lp.maxd, p.k, iter % 2, qa);
                link_strobes_x8(want.data(), nsy, lp.wmin, lp.wmax, lp.qm,
                                lp.maxd, p.k, iter % 2, qb);
                if (qa.size() != qb.size()) {
                    printf("LINK FAIL iter=%d lane=%d count %zu != %zu\n",
                           iter, l, qb.size(), qa.size());
                    return 1;
                }
                for (size_t j = 0; j < qa.size(); ++j) {
                    if (qa[j].hash != qb[j].hash || qa[j].start != qb[j].start
                        || qa[j].end != qb[j].end
                        || qa[j].is_reverse != qb[j].is_reverse) {
                        printf("LINK FAIL iter=%d lane=%d j=%zu\n", iter, l,
                               j);
                        return 1;
                    }
                }
                n_link += (long)qa.size();
            }
        }
    }
    printf("syncmer x8 fuzz: %ld reads, %ld syncmers, %ld linked randstrobes,"
           " bit-exact\n", n_checked, n_sync, n_link);

    // ---- A/B timing: 48k x 150 bp, alternating rounds ----------------
    if (argc > 1) {
        const int NR = 48000, LEN = 150, ROUNDS = 6;
        std::vector<std::vector<u8>> reads(NR);
        for (auto& r : reads) gen_read(rng, r, 3, LEN);
        double t_scalar = 1e9, t_x8 = 1e9;
        std::vector<Syncmer> tmp;
        for (int round = 0; round < ROUNDS; ++round) {
            auto t0 = std::chrono::steady_clock::now();
            long total = 0;
            if (round % 2 == 0) {
                for (int i = 0; i < NR; ++i) {
                    syncmers_of(reads[i].data(), LEN, 20, 16, 3, tmp);
                    total += (long)tmp.size();
                }
            } else {
                std::vector<Syncmer> g[8];
                std::vector<Syncmer>* outs[8];
                for (int l = 0; l < 8; ++l) outs[l] = &g[l];
                for (int i = 0; i < NR; i += 8) {
                    const u8* seqs[8];
                    i64 lens[8];
                    for (int l = 0; l < 8; ++l) {
                        seqs[l] = reads[i + l].data();
                        lens[l] = LEN;
                    }
                    syncmers_of_x8_impl<5>(seqs, lens, 20, 16, 3, outs);
                    for (int l = 0; l < 8; ++l) total += (long)g[l].size();
                }
            }
            double dt = std::chrono::duration<double>(
                            std::chrono::steady_clock::now() - t0)
                            .count();
            (round % 2 ? t_x8 : t_scalar) = std::min(
                round % 2 ? t_x8 : t_scalar, dt);
            printf("round %d (%s): %.1f ns/read-base (%ld syncmers)\n", round,
                   round % 2 ? "x8" : "scalar",
                   dt / NR / LEN * 1e9, total);
        }
        printf("syncmers A/B best: scalar %.2f us/read, x8 %.2f us/read "
               "(%.2fx)\n",
               t_scalar / NR * 1e6, t_x8 / NR * 1e6, t_scalar / t_x8);

        // ---- linker A/B on real r150-profile syncmers ----------------
        std::vector<std::vector<Syncmer>> syn(NR);
        for (int i = 0; i < NR; ++i) {
            syncmers_of(reads[i].data(), LEN, 20, 16, 3, syn[i]);
            i64 nsy = (i64)syn[i].size();
            pad_syncmers(syn[i]);
            syn[i].resize(nsy + LINK_PAD);  // keep pad, remember nsy
            syn[i].back().pos = nsy;        // stash logical n in last row
        }
        double l_scalar = 1e9, l_x8 = 1e9;
        std::vector<QueryRandstrobe> q;
        for (int round = 0; round < ROUNDS; ++round) {
            auto t0 = std::chrono::steady_clock::now();
            long total = 0;
            for (int i = 0; i < NR; ++i) {
                i64 nsy = syn[i].back().pos;
                q.clear();
                if (round % 2 == 0)
                    link_strobes(syn[i].data(), nsy, 5, 11, 0xFFULL, 80, 20,
                                 false, q);
                else
                    link_strobes_x8(syn[i].data(), nsy, 5, 11, 0xFFULL, 80,
                                    20, false, q);
                total += (long)q.size();
            }
            double dt = std::chrono::duration<double>(
                            std::chrono::steady_clock::now() - t0)
                            .count();
            (round % 2 ? l_x8 : l_scalar) = std::min(
                round % 2 ? l_x8 : l_scalar, dt);
            printf("link round %d (%s): %.2f us/read (%ld strobes)\n", round,
                   round % 2 ? "x8" : "scalar", dt / NR * 1e6, total);
        }
        printf("link A/B best: scalar %.2f us/read, x8 %.2f us/read "
               "(%.2fx)\n",
               l_scalar / NR * 1e6, l_x8 / NR * 1e6, l_scalar / l_x8);
    }
    return 0;
#endif
}
