#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/lib
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/frameloader.cpp -o native/lib/libframeloader.so -lpng -lz -lpthread
echo "built native/lib/libframeloader.so"
gcc -O2 -shared -fPIC -std=gnu11 \
    native/ekf_client.c -o native/lib/libekfclient.so
echo "built native/lib/libekfclient.so"
gcc -O2 -std=gnu11 native/examples/ekf_client_demo.c \
    -Lnative/lib -lekfclient -Wl,-rpath,'$ORIGIN/../lib' \
    -o native/lib/ekf_client_demo
echo "built native/lib/ekf_client_demo"
