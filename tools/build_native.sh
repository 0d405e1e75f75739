#!/bin/sh
# Build the native runtime components into native/lib/.
#
#   tools/build_native.sh          optimized build
#   tools/build_native.sh --asan   AddressSanitizer build into native/lib-asan/
#                                  (the SURVEY section-5 sanitizer bar for the
#                                  hand-written C: sockets, threads, libpng,
#                                  embedded CPython); tools/run_asan.sh runs
#                                  the demo binaries under it.
set -e
cd "$(dirname "$0")/.."

LIBDIR=native/lib
CFLAGS_EXTRA=""
LDFLAGS_EXTRA=""
if [ "$1" = "--asan" ]; then
    LIBDIR=native/lib-asan
    CFLAGS_EXTRA="-fsanitize=address -fno-omit-frame-pointer -g -O1"
    LDFLAGS_EXTRA="-fsanitize=address"
fi
mkdir -p "$LIBDIR"

g++ -O3 -march=native -shared -fPIC -std=c++17 $CFLAGS_EXTRA \
    native/frameloader.cpp -o "$LIBDIR"/libframeloader.so \
    $LDFLAGS_EXTRA -lpng -lz -lpthread
echo "built $LIBDIR/libframeloader.so"
g++ -O2 -std=c++17 $CFLAGS_EXTRA native/examples/frameloader_demo.c \
    native/frameloader.cpp $LDFLAGS_EXTRA -lpng -lz -lpthread \
    -o "$LIBDIR"/frameloader_demo
echo "built $LIBDIR/frameloader_demo"
gcc -O2 -shared -fPIC -std=gnu11 $CFLAGS_EXTRA \
    native/ekf_client.c -o "$LIBDIR"/libekfclient.so $LDFLAGS_EXTRA
echo "built $LIBDIR/libekfclient.so"
gcc -O2 -std=gnu11 $CFLAGS_EXTRA native/examples/ekf_client_demo.c \
    -L"$LIBDIR" -lekfclient -Wl,-rpath,'$ORIGIN' $LDFLAGS_EXTRA \
    -o "$LIBDIR"/ekf_client_demo
echo "built $LIBDIR/ekf_client_demo"
gcc -O2 -shared -fPIC -std=gnu11 $CFLAGS_EXTRA native/ekf_embed.c \
    $(python3-config --includes) \
    -o "$LIBDIR"/libekfembed.so $LDFLAGS_EXTRA \
    $(python3-config --ldflags --embed)
echo "built $LIBDIR/libekfembed.so"
# -lstdc++ up front: the embedded CPython dlopens C++ extension modules
# (numpy/scipy) later; under ASAN the runtime must have intercepted
# __cxa_throw at startup or it aborts with a CHECK failure.
gcc -O2 -std=gnu11 $CFLAGS_EXTRA native/examples/ekf_embed_demo.c \
    -L"$LIBDIR" -lekfembed -Wl,-rpath,'$ORIGIN' \
    $(python3-config --ldflags --embed) $LDFLAGS_EXTRA -lstdc++ \
    -o "$LIBDIR"/ekf_embed_demo
echo "built $LIBDIR/ekf_embed_demo"
