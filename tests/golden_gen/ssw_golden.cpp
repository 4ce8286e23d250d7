// Test-fixture generator: raw SSW (Farrar striped Smith-Waterman from the
// reference's ext/ssw/ssw.c) outputs for comparison with rabbitsalign_tpu's
// reimplementation. Prints score, begin/end coordinates and the M/I/D cigar
// exactly as ssw_align returns them.
//
// Usage: ssw_golden <A> <B> <O> <E> then lines of "query<TAB>ref" on stdin.
// Output per pair: "score ref_begin ref_end read_begin read_end flag cigar"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

extern "C" {
#include "/root/reference/ext/ssw/ssw.h"
}

static int8_t nt_table[256];

static void init_table() {
    memset(nt_table, 4, sizeof nt_table);
    const char* bases = "ACGT";
    for (int i = 0; i < 4; i++) {
        nt_table[(int)bases[i]] = i;
        nt_table[(int)tolower(bases[i])] = i;
    }
}

int main(int argc, char** argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: ssw_golden A B O E\n");
        return 1;
    }
    int A = atoi(argv[1]), B = atoi(argv[2]), O = atoi(argv[3]), E = atoi(argv[4]);
    init_table();
    // 5x5 matrix: match A, everything else (incl N) -B
    int8_t mat[25];
    for (int i = 0; i < 5; i++)
        for (int j = 0; j < 5; j++)
            mat[i * 5 + j] = (i == j && i < 4) ? A : -B;

    std::string line;
    while (std::getline(std::cin, line)) {
        auto tab = line.find('\t');
        if (tab == std::string::npos) continue;
        std::string q = line.substr(0, tab), r = line.substr(tab + 1);
        std::vector<int8_t> qn(q.size()), rn(r.size());
        for (size_t i = 0; i < q.size(); i++) qn[i] = nt_table[(int)q[i]];
        for (size_t i = 0; i < r.size(); i++) rn[i] = nt_table[(int)r[i]];
        int maskLen = q.size() / 2 < 15 ? 15 : q.size() / 2;
        s_profile* prof = ssw_init(qn.data(), qn.size(), mat, 5, 2);
        s_align* al = ssw_align(prof, rn.data(), rn.size(), O, E, 0x0f, 0, 32767, maskLen);
        printf("%d %d %d %d %d %d ", al->score1, al->ref_begin1, al->ref_end1,
               al->read_begin1, al->read_end1, al->flag);
        for (int i = 0; i < al->cigarLen; i++) {
            printf("%u%c", al->cigar[i] >> 4, "MIDNSHP=X"[al->cigar[i] & 0xf]);
        }
        printf("\n");
        align_destroy(al);
        init_destroy(prof);
    }
    return 0;
}
