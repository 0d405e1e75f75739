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
gcc -O2 -shared -fPIC -std=gnu11 native/ekf_embed.c \
    $(python3-config --includes) \
    -o native/lib/libekfembed.so $(python3-config --ldflags --embed)
echo "built native/lib/libekfembed.so"
gcc -O2 -std=gnu11 native/examples/ekf_embed_demo.c \
    -Lnative/lib -lekfembed -Wl,-rpath,'$ORIGIN/../lib' \
    $(python3-config --ldflags --embed) \
    -o native/lib/ekf_embed_demo
echo "built native/lib/ekf_embed_demo"
