// Standalone phase-A profiler: random genome -> native index -> chunks of
// synthetic reads -> engine_chunk_a. Compile with -pg for gprof.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>
#include <chrono>

extern "C" {
void engine_timers(void*, double*);
void* index_build(const unsigned char*, const long*, long, int, int, int, int,
                  int, unsigned long, int, int);
long index_build_count(void*);
void index_build_copy(void*, unsigned long*, unsigned int*, unsigned int*);
void index_build_free(void*);
void* engine_create(const unsigned long*, const unsigned int*,
                    const unsigned int*, const unsigned long*, unsigned long,
                    int, unsigned int, int, int, int, int, int, unsigned long,
                    int, unsigned int, int, const unsigned char*, const long*,
                    const unsigned char*, const long*, long, int, int, int,
                    int, int, double, long, long, int, int, int, int,
                    const char*, int);
void* engine_chunk_a(void*, const unsigned char*, const long*,
                     const unsigned char*, const long*, const unsigned char*,
                     const long*, long, long, unsigned long);
long chunk_n_jobs(void*);
void engine_chunk_b(void*, void*);
void chunk_free(void*);
}

int main(int argc, char** argv) {
    int n_reads = argc > 1 ? atoi(argv[1]) : 48000;
    std::mt19937 rng(1234);
    const char* bases = "ACGT";
    std::string genome(1000000, 'A');
    for (auto& c : genome) c = bases[rng() % 4];

    // index: k=20 s=16 t=3 wmin=5 wmax=11 (r150 profile), q mask 255, maxdist 80
    long offs[2] = {0, (long)genome.size()};
    void* ib = index_build((const unsigned char*)genome.data(), offs, 1, 20, 16,
                           3, 5, 11, 0xFFULL, 80, 1);
    long n = index_build_count(ib);
    std::vector<unsigned long> hashes(n);
    std::vector<unsigned int> pos(n), packed(n);
    index_build_copy(ib, hashes.data(), pos.data(), packed.data());
    index_build_free(ib);
    // bucket table (bits ~ log2(n)-1)
    int bits = 16;
    std::vector<unsigned long> buckets((1UL << bits) + 1, n);
    {
        // replicate the quirky reference loop: entries up to first change
        // point at that change
        std::vector<long> change;
        for (long i = 1; i < n; i++)
            if (hashes[i] != hashes[i - 1]) change.push_back(i);
        long w = 0;
        for (long b = 0; b <= (1L << bits); b++) {
            while (w < (long)change.size() &&
                   (long)(hashes[change[w]] >> (64 - bits)) < b)
                w++;
            buckets[b] = w < (long)change.size() ? change[w] : n;
        }
    }
    long name_offs[2] = {0, 4};
    void* eng = engine_create(hashes.data(), pos.data(), packed.data(),
                              buckets.data(), n, bits, 30, 20, 16, 3, 5, 11,
                              0xFFULL, 80, 60, 2,
                              (const unsigned char*)genome.data(), offs,
                              (const unsigned char*)"chr1", name_offs, 1,
                              2, 8, 12, 1, 10, 0.5, 20, 0, 1, 0, 1, 0, "\n", 0);
    // reads
    std::vector<std::string> reads(n_reads);
    for (int i = 0; i < n_reads; i++) {
        int st = rng() % (genome.size() - 160);
        std::string rd = genome.substr(st, 150);
        for (int m = 0; m < 3; m++) rd[rng() % 150] = bases[rng() % 4];
        if (i % 5 == 1) {
            int cut = 40 + rng() % 60, g = 1 + rng() % 5;
            rd = genome.substr(st, cut) + genome.substr(st + cut + g, 150 - cut);
        }
        reads[i] = rd;
    }
    auto t0 = std::chrono::steady_clock::now();
    long total_jobs = 0;
    for (int start = 0; start < n_reads; start += 4000) {
        int cnt = std::min(4000, n_reads - start);
        std::string seqs, names, quals;
        std::vector<long> so{0}, no{0}, qo{0};
        for (int i = 0; i < cnt; i++) {
            seqs += reads[start + i];
            names += "r";
            quals += "";
            so.push_back(seqs.size());
            no.push_back(names.size());
            qo.push_back(quals.size());
        }
        void* ch = engine_chunk_a(eng, (const unsigned char*)seqs.data(),
                                  so.data(), (const unsigned char*)names.data(),
                                  no.data(), (const unsigned char*)quals.data(),
                                  qo.data(), 0, cnt, start / 4000);
        total_jobs += chunk_n_jobs(ch);
        if (getenv("SE_PROF_B")) engine_chunk_b(eng, ch);
        chunk_free(ch);
    }
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    double tm[4];
    engine_timers(eng, tm);
    printf("%d reads in %.3fs = %.0f reads/s (jobs %ld) "
           "seed_nam=%.3f phaseA=%.3f hostalign=%.3f phaseB=%.3f\n",
           n_reads, dt, n_reads / dt, total_jobs, tm[1], tm[0], tm[2], tm[3]);
    return 0;
}
