// Test-fixture generator: runs the *reference* find_nams / find_nams_rescue
// over an index built from a FASTA, for comparison with rabbitsalign_tpu.
//
// Usage: nam_golden <ref.fa> <f> <read_length> <rescue_cutoff> < reads.txt
// Input: one read sequence per line.
// Output per read:
//   F <nonrepetitive_fraction(6dp)>
//   N <query_start> <query_end> <ref_start> <ref_end> <n_hits> <ref_id> <score> <is_rc>
//   (then the same via rescue:)
//   RN <...same fields...>
//   # end

#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>

#include "/root/reference/src/refs.hpp"
#include "/root/reference/src/index.hpp"
#include "/root/reference/src/nam.hpp"

int main(int argc, char** argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: nam_golden ref.fa f read_length rescue_cutoff\n");
        return 1;
    }
    auto refs = References::from_fasta(argv[1]);
    float f = atof(argv[2]);
    int r = atoi(argv[3]);
    unsigned rescue_cutoff = atoi(argv[4]);
    IndexParameters params = IndexParameters::from_read_length(r);
    StrobemerIndex index(refs, params);
    index.populate(f, 1);

    std::string seq;
    while (std::getline(std::cin, seq)) {
        if (seq.empty()) continue;
        auto qr = randstrobes_query(seq, params);
        auto [frac, nams] = find_nams(qr, index);
        printf("F %.6f\n", frac);
        for (auto& n : nams) {
            printf("N %d %d %d %d %d %d %.2f %d\n", n.query_start, n.query_end,
                   n.ref_start, n.ref_end, n.n_hits, n.ref_id, n.score, (int)n.is_rc);
        }
        auto rnams = find_nams_rescue(qr, index, rescue_cutoff);
        for (auto& n : rnams) {
            printf("RN %d %d %d %d %d %d %.2f %d\n", n.query_start, n.query_end,
                   n.ref_start, n.ref_end, n.n_hits, n.ref_id, n.score, (int)n.is_rc);
        }
        printf("#\n");
    }
    return 0;
}
