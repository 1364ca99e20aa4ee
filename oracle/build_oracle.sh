#!/bin/bash
# Build the reference arriba binary against the minimal htslib shim so it can
# serve as a golden-output oracle for byte-equality tests (the real htslib
# cannot be downloaded in this zero-egress environment).
#
# Usage: oracle/build_oracle.sh [output_binary]
set -euo pipefail

REFERENCE=${REFERENCE:-/root/reference}
SHIM_DIR="$(cd "$(dirname "$0")/htslib_shim" && pwd)"
OUT=${1:-/tmp/arriba_oracle/arriba}
BUILD_DIR=$(dirname "$OUT")
mkdir -p "$BUILD_DIR"

SOURCES=$(ls "$REFERENCE"/source/*.cpp)

g++ -O2 -std=c++11 -Wno-parentheses -pthread \
    -I"$SHIM_DIR" -I"$REFERENCE/source" \
    -o "$OUT" \
    $SOURCES "$SHIM_DIR/shim.cpp" \
    -lz

echo "oracle built: $OUT"
