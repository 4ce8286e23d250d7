// Test-fixture generator: runs the *reference* seeding implementation
// (mounted read-only at /root/reference) on sequences read from stdin and
// dumps syncmers / randstrobes / query randstrobes as text for comparison
// against rabbitsalign_tpu's implementation. This file contains no code
// from the reference; it only #includes it at build time.
//
// Usage: seed_golden <k> <s> <l> <u> <c> <max_seed_len_or_-1> < seqs.txt
// Input: one DNA sequence per line.
// Output per sequence:
//   S <pos> <hash>          (canonical syncmers)
//   R <hash> <p1> <p2>      (reference-style randstrobes via RandstrobeGenerator)
//   Q <hash> <start> <end> <is_reverse>   (query randstrobes)
//   # end

#include <cstdio>
#include <iostream>
#include <string>

#include "/root/reference/src/randstrobes.hpp"

int main(int argc, char** argv) {
    if (argc < 7) {
        fprintf(stderr, "need k s l u c max_seed_len\n");
        return 1;
    }
    int k = atoi(argv[1]);
    int s = atoi(argv[2]);
    int l = atoi(argv[3]);
    int u = atoi(argv[4]);
    int c = atoi(argv[5]);
    int msl = atoi(argv[6]);
    int q = (1 << c) - 1;
    int max_dist = msl < 0 ? 255 : msl - k;
    IndexParameters params(150, k, s, l, u, q, max_dist);

    std::string seq;
    while (std::getline(std::cin, seq)) {
        if (seq.empty()) continue;
        auto sm = canonical_syncmers(seq, params.syncmer);
        for (auto& m : sm) {
            printf("S %zu %llu\n", m.position, (unsigned long long)m.hash);
        }
        if (seq.size() >= params.randstrobe.w_max) {
            RandstrobeGenerator gen(seq, params.syncmer, params.randstrobe);
            Randstrobe r;
            while ((r = gen.next()) != gen.end()) {
                printf("R %llu %u %u\n", (unsigned long long)r.hash, r.strobe1_pos, r.strobe2_pos);
            }
        }
        auto qr = randstrobes_query(seq, params);
        for (auto& x : qr) {
            printf("Q %llu %u %u %d\n", (unsigned long long)x.hash, x.start, x.end, (int)x.is_reverse);
        }
        printf("#\n");
    }
    return 0;
}
