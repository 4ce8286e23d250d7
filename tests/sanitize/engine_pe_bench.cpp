// Standalone PE phase-A/B profiler: random genome -> native index ->
// simulated proper pairs (insert ~N(400,50) like bench.py) -> fastx
// reader -> engine_chunk_a_fx / engine_chunk_b. Compile with -pg for
// gprof. Mirrors tests/sanitize/engine_se_bench.cpp for the PE path
// (the reference's headline metric is PE: /root/reference/README.md).
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {
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
void engine_free(void*);
void engine_timers(void*, double*);
void* fastx_open(const char*, const char*, int, long);
void* fastx_next(void*);
int fastx_error(void*);
void fastx_counts(void*, long*, long*);
void fastx_chunk_free(void*);
void fastx_close(void*);
void* engine_chunk_a_fx(void*, void*, unsigned long);
long chunk_n_jobs(void*);
void engine_chunk_b(void*, void*);
long chunk_out_len(void*);
void chunk_out_copy(void*, char*);
void chunk_free(void*);
}

static std::string rc(const std::string& s) {
    std::string o(s.rbegin(), s.rend());
    for (auto& c : o)
        c = c == 'A' ? 'T' : c == 'T' ? 'A' : c == 'C' ? 'G' : 'C';
    return o;
}

int main(int argc, char** argv) {
    long n_pairs = argc > 1 ? atol(argv[1]) : 24000;
    std::mt19937 rng(4321);
    const char* bases = "ACGT";
    std::string genome(1000000, 'A');
    for (auto& c : genome) c = bases[rng() % 4];
    long offs[2] = {0, (long)genome.size()};
    void* ib = index_build((const unsigned char*)genome.data(), offs, 1, 20,
                           16, 3, 5, 11, 0xFFULL, 80, 1);
    long n = index_build_count(ib);
    std::vector<unsigned long> hashes(n);
    std::vector<unsigned int> pos(n), packed(n);
    index_build_copy(ib, hashes.data(), pos.data(), packed.data());
    index_build_free(ib);
    int bits = 16;
    std::vector<unsigned long> buckets((1UL << bits) + 1, n);
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
    long name_offs[2] = {0, 4};
    void* eng = engine_create(hashes.data(), pos.data(), packed.data(),
                              buckets.data(), n, bits, 30, 20, 16, 3, 5, 11,
                              0xFFULL, 80, 150, 2,
                              (const unsigned char*)genome.data(), offs,
                              (const unsigned char*)"chr1", name_offs, 1, 2, 8,
                              12, 1, 10, 0.5, 20, 2, 1, 0, 1, 0, "\n", 0);
    FILE* f1 = fopen("/tmp/pe_bench_r1.fq", "w");
    FILE* f2 = fopen("/tmp/pe_bench_r2.fq", "w");
    // mirror bench.py simulate_pe: ~N(300,60) inserts, 0-3 SNPs/mate,
    // 1-in-50 unmappable mate (rescue), 1-in-50 indel (gapped job)
    std::normal_distribution<double> insd(300.0, 60.0);
    for (long i = 0; i < n_pairs; i++) {
        int ins = (int)insd(rng);
        if (ins < 180) ins = 180;
        if (ins > 800) ins = 800;
        long st = rng() % (genome.size() - 900);
        std::string a = genome.substr(st, 150);
        std::string b = rc(genome.substr(st + ins - 150, 150));
        for (unsigned m = rng() % 4; m > 0; --m) a[rng() % 150] = bases[rng() % 4];
        for (unsigned m = rng() % 4; m > 0; --m) b[rng() % 150] = bases[rng() % 4];
        if (i % 50 == 1)
            for (auto& c : b) c = bases[rng() % 4];
        if (i % 50 == 3) {
            int cut = 40 + (int)(rng() % 60);
            int glen = 1 + (int)(rng() % 5);
            a = genome.substr(st, cut) + genome.substr(st + cut + glen, 150 - cut);
        }
        fprintf(f1, "@p%ld/1\n%s\n+\n%s\n", i, a.c_str(),
                std::string(a.size(), 'I').c_str());
        fprintf(f2, "@p%ld/2\n%s\n+\n%s\n", i, b.c_str(),
                std::string(b.size(), 'I').c_str());
    }
    fclose(f1);
    fclose(f2);

    auto t0 = std::chrono::steady_clock::now();
    void* rd = fastx_open("/tmp/pe_bench_r1.fq", "/tmp/pe_bench_r2.fq", 0, 8000);
    long total = 0, jobs = 0;
    unsigned long ci = 0;
    std::string out;
    while (void* fx = fastx_next(rd)) {
        long np, ns;
        fastx_counts(fx, &np, &ns);
        total += 2 * np + ns;
        void* ch = engine_chunk_a_fx(eng, fx, ci++);
        fastx_chunk_free(fx);
        jobs += chunk_n_jobs(ch);
        engine_chunk_b(eng, ch);
        long len = chunk_out_len(ch);
        out.resize(len);
        chunk_out_copy(ch, out.data());
        chunk_free(ch);
    }
    if (fastx_error(rd)) { printf("reader error\n"); return 1; }
    fastx_close(rd);
    auto el = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    double tm[4];
    engine_timers(eng, tm);
    printf("%ld reads in %.3fs = %.0f reads/s (jobs %ld) "
           "seed_nam=%.3f phaseA=%.3f hostalign=%.3f phaseB=%.3f\n",
           total, el, total / el, jobs, tm[1], tm[0], tm[2], tm[3]);
    engine_free(eng);
    return 0;
}
