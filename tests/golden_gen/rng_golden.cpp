// Test-fixture generator: libstdc++ std::minstd_rand /
// uniform_int_distribution / std::shuffle sequences, to validate
// rabbitsalign_tpu's bit-exact RNG reimplementation (the reference uses
// these for NAM tie shuffling and reservoir sampling).

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <numeric>
#include <random>
#include <vector>

int main() {
    // raw engine output
    for (unsigned seed : {0u, 1u, 7u, 12345u, 2147483646u}) {
        std::minstd_rand g;
        g.seed(seed);
        printf("RAW %u:", seed);
        for (int i = 0; i < 10; i++) printf(" %lu", (unsigned long)g());
        printf("\n");
    }
    // uniform_int_distribution<int>(1, k) sequences
    for (int k : {1, 2, 3, 5, 10, 100}) {
        std::minstd_rand g;
        g.seed(42);
        std::uniform_int_distribution<> d(1, k);
        printf("D1 %d:", k);
        for (int i = 0; i < 12; i++) printf(" %d", d(g));
        printf("\n");
    }
    // uniform_int_distribution<int>(0, k)
    for (int k : {0, 1, 4, 19}) {
        std::minstd_rand g;
        g.seed(3);
        std::uniform_int_distribution<> d(0, k);
        printf("D0 %d:", k);
        for (int i = 0; i < 12; i++) printf(" %d", d(g));
        printf("\n");
    }
    // shuffle of iota(n)
    for (int n : {1, 2, 3, 4, 5, 6, 7, 8, 13, 20}) {
        for (unsigned seed : {0u, 5u, 99u}) {
            std::minstd_rand g;
            g.seed(seed);
            std::vector<int> v(n);
            std::iota(v.begin(), v.end(), 0);
            std::shuffle(v.begin(), v.end(), g);
            printf("SH %d %u:", n, seed);
            for (int x : v) printf(" %d", x);
            printf("\n");
            // engine state afterwards (how many draws were consumed)
            printf("POST %d %u: %lu\n", n, seed, (unsigned long)g());
        }
    }
    return 0;
}
