#!/bin/sh
# Build the golden-fixture generators against the read-only reference tree.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -I/root/reference/src -I/root/reference/ext \
    seed_golden.cpp /root/reference/src/randstrobes.cpp \
    -o seed_golden
echo built seed_golden

if [ ! -d zstr ]; then
    # header-only gzip istream wrapper used by reference refs.cpp; fetch from
    # the local pip cache is unavailable (zero egress), so stub it: our test
    # FASTAs are uncompressed and the reference only needs zstr for .gz.
    mkdir -p zstr
    cat > zstr/zstr.hpp <<'HPP'
// minimal stand-in for the zstr::ifstream used by the reference refs.cpp;
// supports only uncompressed files (sufficient for golden generation).
#pragma once
#include <fstream>
namespace zstr { using ifstream = std::ifstream; }
HPP
fi

g++ -O2 -std=c++17 -I/root/reference/src -I/root/reference/ext -Izstr \
    sti_golden.cpp \
    /root/reference/src/randstrobes.cpp \
    /root/reference/src/indexparameters.cpp \
    /root/reference/src/index.cpp \
    /root/reference/src/refs.cpp \
    /root/reference/src/io.cpp \
    -o sti_golden -lpthread
echo built sti_golden

g++ -O2 -std=c++17 -I/root/reference/src -I/root/reference/ext -Izstr \
    nam_golden.cpp \
    /root/reference/src/randstrobes.cpp \
    /root/reference/src/indexparameters.cpp \
    /root/reference/src/index.cpp \
    /root/reference/src/nam.cpp \
    /root/reference/src/refs.cpp \
    /root/reference/src/io.cpp \
    -o nam_golden -lpthread
echo built nam_golden

gcc -O2 -c /root/reference/ext/ssw/ssw.c -o ssw.o
g++ -O2 -std=c++17 ssw_golden.cpp ssw.o -o ssw_golden
echo built ssw_golden

# End-to-end golden mapper: the reference's monolithic CPU mapping path
# plus its split-phase (async) SE and PE production paths. The async-PE
# gather/store helpers live as inline functions inside the reference's
# pc.cpp (which cannot be compiled whole: RabbitFX + CUDA deps), so the
# exact function bodies are extracted at build time — fixture generation
# against the read-only reference, like every other golden here.
sed -n '177,368p' /root/reference/src/pc.cpp > pc_part2.inc
# the reference's interleaved pairing rules (same_name +
# distribute_interleaved), compiled verbatim for map_golden's ilv mode
sed -n '23,72p' /root/reference/src/pc.cpp > pc_interleave.inc
# gasal2_ssw.h is neutralized by pre-defining its header guard and
# forward-declaring the one type used as an opaque pointer.
cat > gasal_stub.h <<'HDR'
#pragma once
#define __GASAL_HEADER_H__
struct gasal_gpu_storage_t;
HDR
g++ -O2 -std=c++17 -include gasal_stub.h \
    -I/root/reference/src -I/root/reference/ext -Izstr \
    map_golden.cpp \
    /root/reference/src/randstrobes.cpp \
    /root/reference/src/indexparameters.cpp \
    /root/reference/src/index.cpp \
    /root/reference/src/refs.cpp \
    /root/reference/src/io.cpp \
    /root/reference/src/nam.cpp \
    /root/reference/src/aln.cpp \
    /root/reference/src/aligner.cpp \
    /root/reference/src/sam.cpp \
    /root/reference/src/paf.cpp \
    /root/reference/src/cigar.cpp \
    /root/reference/ext/ssw/ssw_cpp.cpp \
    ssw.o \
    -o map_golden -lpthread
echo built map_golden
