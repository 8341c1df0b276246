#!/bin/sh
# Build the native offline-data library (native/fastdata.cpp -> ctypes .so).
# Usage: scripts/build_native.sh [outdir]
set -e
cd "$(dirname "$0")/.."
OUT="${1:-native}"
mkdir -p "$OUT"
g++ -O3 -std=c++17 -shared -fPIC -Wall -Wextra \
    native/fastdata.cpp -o "$OUT/libfastdata.so"
echo "built $OUT/libfastdata.so"
