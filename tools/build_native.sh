#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/lib
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/frameloader.cpp -o native/lib/libframeloader.so -lpng -lz -lpthread
echo "built native/lib/libframeloader.so"
