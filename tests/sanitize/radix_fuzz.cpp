// Fuzz gate: the index builder's hybrid MSD/LSD radix sort must produce
// EXACTLY the stable_sort order of (hash, pos) — the .sti byte-interop
// contract rides on it. Covers degenerate hash distributions (uniform,
// top-bit-clustered into one giant partition, few distinct hashes,
// all-equal hash) and thread counts. (hash, pos) keys REPEAT across
// contigs when a genome contains duplicated sequence (pos is ref-local;
// ref_id rides in the payload), so trials include duplicate-key records
// whose relative input order must survive — the stability contract.
#define RABBIT_ENGINE_FUZZ
#include "../../rabbitsalign_tpu/native/engine.cpp"

#include <cstdio>
#include <random>

int main() {
    std::mt19937_64 rng(7);
    for (int iter = 0; iter < 60; ++iter) {
        size_t n;
        switch (iter % 4) {
            case 0: n = rng() % 3000; break;            // below radix cutoff
            case 1: n = 40000 + rng() % 30000; break;   // just above
            case 2: n = 300000 + rng() % 200000; break; // multi-partition
            default: n = 1500000; break;                // big
        }
        int dist = iter % 5;
        int nt = 1 + (int)(rng() % 8);
        std::vector<engine::RefRec> recs(n);
        for (size_t i = 0; i < n; ++i) {
            u64 h;
            switch (dist) {
                case 0: h = rng(); break;                      // uniform
                case 1: h = rng() & 0x0000FFFFFFFFFFFFULL; break;  // one MSD partition
                case 2: h = (rng() % 97) * 0x9E3779B97F4A7C15ULL; break;  // few distinct
                case 3: h = 0xDEADBEEFCAFEF00DULL; break;      // all equal
                default: h = rng() >> (rng() % 48); break;     // skewed magnitudes
            }
            recs[i] = {h, (u32)i, (u32)rng()};
        }
        // shuffle pos so input order is not already sorted by pos
        for (size_t i = n; i > 1; --i)
            std::swap(recs[i - 1].pos, recs[rng() % i].pos);
        // duplicated-contig simulation: clone ~1/8 of the records with a
        // different payload (same (hash, pos) key, later input order)
        size_t base = n;
        for (size_t i = 0; i + 7 < base; i += 8)
            recs.push_back({recs[i].hash, recs[i].pos, ~recs[i].packed});
        n = recs.size();
        std::vector<engine::RefRec> want(recs);
        std::stable_sort(want.begin(), want.end(),
                         [](const engine::RefRec& a, const engine::RefRec& b) {
                             if (a.hash != b.hash) return a.hash < b.hash;
                             return a.pos < b.pos;
                         });
        engine::sort_recs_radix(recs, nt);
        for (size_t i = 0; i < n; ++i) {
            if (recs[i].hash != want[i].hash || recs[i].pos != want[i].pos ||
                recs[i].packed != want[i].packed) {
                printf("MISMATCH iter=%d n=%zu dist=%d nt=%d at %zu\n", iter,
                       n, dist, nt, i);
                return 1;
            }
        }
    }
    printf("radix fuzz OK\n");
    return 0;
}
