#!/bin/sh
# Full test gate (the role of the reference CI's tests/run.sh,
# /root/reference/.github/workflows/ci.yml): unit + parity + concordance
# suites, native sanitizers, reference-golden rebuild.
set -e
cd "$(dirname "$0")/.."
sh tests/golden_gen/build.sh
python -m pytest tests/ -q
sh tests/sanitize/run.sh
echo "ALL GATES PASSED"
