// ASan coverage driver: native reader + PE phase A/B end to end.
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

int main() {
    std::mt19937 rng(77);
    const char* bases = "ACGT";
    std::string genome(400000, 'A');
    for (auto& c : genome) c = bases[rng() % 4];
    long offs[2] = {0, (long)genome.size()};
    void* ib = index_build((const unsigned char*)genome.data(), offs, 1, 20,
                           16, 3, 5, 11, 0xFFULL, 80, 2);
    long n = index_build_count(ib);
    std::vector<unsigned long> hashes(n);
    std::vector<unsigned int> pos(n), packed(n);
    index_build_copy(ib, hashes.data(), pos.data(), packed.data());
    index_build_free(ib);
    int bits = 15;
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
                              0xFFULL, 80, 60, 2,
                              (const unsigned char*)genome.data(), offs,
                              (const unsigned char*)"chr1", name_offs, 1, 2, 8,
                              12, 1, 10, 0.5, 20, 2, 1, 0, 1, 1, "\tRG:Z:x\n", 1);
    // PE FASTQ with mutations, orphaned rescue cases, interleaved singles
    FILE* f1 = fopen("/tmp/asan_r1.fq", "w");
    FILE* f2 = fopen("/tmp/asan_r2.fq", "w");
    for (int i = 0; i < 3000; i++) {
        int st = rng() % (genome.size() - 900);
        int ins = 200 + rng() % 300;
        std::string a = genome.substr(st, 150);
        std::string b = rc(genome.substr(st + ins - 150, 150));
        for (int m = 0; m < 3; m++) a[rng() % 150] = bases[rng() % 4];
        if (i % 17 == 3)
            for (auto& c : b) c = bases[rng() % 4];
        if (i % 23 == 5) a = genome.substr(st, 60) + genome.substr(st + 64, 90);
        if (i % 31 == 7) { a[40] = 'N'; a[41] = 'N'; }
        fprintf(f1, "@p%d/1 c\n%s\n+\n%s\n", i, a.c_str(),
                std::string(a.size(), 'I').c_str());
        fprintf(f2, "@p%d/2 c\n%s\n+\n%s\n", i, b.c_str(),
                std::string(b.size(), 'I').c_str());
    }
    fclose(f1);
    fclose(f2);
    void* rd = fastx_open("/tmp/asan_r1.fq", "/tmp/asan_r2.fq", 0, 500);
    long total = 0;
    unsigned long ci = 0;
    std::string out;
    while (void* fx = fastx_next(rd)) {
        long np, ns;
        fastx_counts(fx, &np, &ns);
        total += 2 * np + ns;
        void* ch = engine_chunk_a_fx(eng, fx, ci++);
        fastx_chunk_free(fx);
        engine_chunk_b(eng, ch);
        long len = chunk_out_len(ch);
        out.resize(len);
        chunk_out_copy(ch, out.data());
        chunk_free(ch);
    }
    if (fastx_error(rd)) { printf("reader error\n"); return 1; }
    fastx_close(rd);
    engine_free(eng);
    printf("PE ASan driver: %ld reads OK\n", total);
    return 0;
}
