#!/bin/sh
# Build the golden-fixture generators against the read-only reference tree.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -I/root/reference/src -I/root/reference/ext \
    seed_golden.cpp /root/reference/src/randstrobes.cpp \
    -o seed_golden
echo built seed_golden
