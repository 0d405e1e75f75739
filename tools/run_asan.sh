#!/bin/sh
# AddressSanitizer run of the hand-written native components (SURVEY
# section-5 bar: "CI ASAN for any C++ host tooling we write").
#
#   tools/run_asan.sh          build with -fsanitize=address and drive:
#     * frameloader_demo  -- worker threads + libpng decode + failure paths
#       on real bundled frames
#     * ekf_client_demo   -- the socket client against a live Python
#       serving daemon (sockets, length-prefixed protocol)
#     * ekf_embed_demo    -- embedded CPython host (leak detection off:
#       the CPython runtime intentionally leaks interned objects)
#
# Writes runs/asan/log.txt; exits nonzero on any sanitizer report.
set -e
cd "$(dirname "$0")/.."
OUT=runs/asan
mkdir -p "$OUT"
LOG="$OUT/log.txt"
: > "$LOG"

sh tools/build_native.sh --asan >> "$LOG" 2>&1
LIB=native/lib-asan
FRAMES=/root/reference/experiments/s3/costado_recto1
CONFIG=/root/reference/experiments/s3/config.yml

echo "== frameloader_demo (threads + libpng) ==" | tee -a "$LOG"
"$LIB"/frameloader_demo \
    "$FRAMES"/00001.png "$FRAMES"/00002.png "$FRAMES"/00003.png \
    "$FRAMES"/00004.png "$FRAMES"/00005.png "$FRAMES"/00006.png \
    "$FRAMES"/00007.png "$FRAMES"/00008.png 2>&1 | tee -a "$LOG"

echo "== ekf_client_demo (socket client vs live daemon) ==" | tee -a "$LOG"
python tools/asan_client_harness.py "$LIB"/ekf_client_demo 2>&1 | tee -a "$LOG"

echo "== ekf_embed_demo (embedded CPython) ==" | tee -a "$LOG"
# CPython leaks interned/static objects by design; ASAN memory-error
# detection stays fully on.
TMPD=$(mktemp -d)
python - "$TMPD" <<'EOF'
import sys, os
from PIL import Image
d = sys.argv[1]
src = "/root/reference/experiments/s3/costado_recto1"
for i in range(1, 5):
    Image.open(os.path.join(src, f"{i:05d}.png")).convert("L").save(
        os.path.join(d, f"{i:05d}.pgm"))
EOF
ASAN_OPTIONS=detect_leaks=0 "$LIB"/ekf_embed_demo \
    "$CONFIG" "$TMPD" 4 "$(pwd)" 2>&1 | tee -a "$LOG"
rm -rf "$TMPD"

if grep -Eq "ERROR: AddressSanitizer|AddressSanitizer: CHECK failed|runtime error:" "$LOG"; then
    echo "ASAN ERRORS FOUND" | tee -a "$LOG"
    exit 1
fi
echo "asan run clean" | tee -a "$LOG"
