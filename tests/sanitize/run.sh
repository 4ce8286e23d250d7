#!/bin/sh
# Memory-safety gate for the native engine: build the standalone SE bench
# and the PE+reader driver under AddressSanitizer+UBSan and run them.
# (pytest under ASan is not viable: jaxlib crashes under the preload.)
set -e
cd "$(dirname "$0")"
NATIVE=../../rabbitsalign_tpu/native
g++ -O1 -g -fsanitize=address,undefined -std=c++17 \
    engine_se_bench.cpp $NATIVE/engine.cpp -o /tmp/engine_se_asan -lz
g++ -O1 -g -fsanitize=address,undefined -std=c++17 \
    engine_pe_asan.cpp $NATIVE/engine.cpp -o /tmp/engine_pe_asan -lz
ASAN_OPTIONS=detect_leaks=0 /tmp/engine_se_asan 4000   # driver leaks its engine
/tmp/engine_pe_asan
echo "sanitize: OK"

# ssw fuzz links the REAL reference ssw.c (read-only) as the oracle
gcc -O2 -march=native -c /root/reference/ext/ssw/ssw.c -o /tmp/ssw_ref.o
g++ -O2 -march=native -std=c++17 ssw_simd_fuzz.cpp /tmp/ssw_ref.o \
    -o /tmp/ssw_fuzz -lz
/tmp/ssw_fuzz

# Index-build radix sort: exact stable_sort order across degenerate hash
# distributions and thread counts (the .sti interop contract)
g++ -O2 -march=native -std=c++17 radix_fuzz.cpp -o /tmp/radix_fuzz -lz -lpthread
/tmp/radix_fuzz
# ... and a TSan pass over the same trials (the sort's parallel scatter
# and work-stealing partition loop write to shared arrays by design)
g++ -O1 -g -fsanitize=thread -march=native -std=c++17 radix_fuzz.cpp \
    -o /tmp/radix_tsan -lz -lpthread
/tmp/radix_tsan

# Sparse-mismatch Hamming fast path: bit-exact vs the dense scan across
# densities and degenerate scoring (incl. an ASan pass for the masked
# loads + position extraction)
g++ -O2 -march=native -std=c++17 hamming_fuzz.cpp -o /tmp/hamming_fuzz -lz
/tmp/hamming_fuzz
g++ -O1 -g -fsanitize=address,undefined -march=native -std=c++17 \
    hamming_fuzz.cpp -o /tmp/hamming_fuzz_asan -lz
ASAN_OPTIONS=detect_leaks=0 /tmp/hamming_fuzz_asan

# AVX-512 x8 syncmer automaton: bit-exactness fuzz (plus an ASan pass —
# lane-transposed buffers and compress-stores are pointer-heavy)
g++ -O2 -march=native -std=c++17 syncmer_x8_fuzz.cpp -o /tmp/syncmer_x8
/tmp/syncmer_x8 time
g++ -O1 -g -fsanitize=address,undefined -march=native -std=c++17 \
    syncmer_x8_fuzz.cpp -o /tmp/syncmer_x8_asan
ASAN_OPTIONS=detect_leaks=0 /tmp/syncmer_x8_asan
