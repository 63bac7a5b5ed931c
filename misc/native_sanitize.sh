#!/bin/sh -e
# ASan + UBSan gate for the first-party native modules (the reference
# force-enables AddressSanitizer on its library builds, RavenLib.cmake:13-23).
# Compiles every production .cc together with the sanitizer test driver
# and runs it; any heap error or UB aborts with a nonzero exit.
cd "$(dirname "$0")/.."
out="${TMPDIR:-/tmp}/raven_native_san"
mkdir -p "$out"
g++ -std=c++17 -g -O1 -fsanitize=address,undefined -fno-sanitize-recover=all \
    -fno-omit-frame-pointer -pthread \
    raven_tpu/native/*.cc raven_tpu/native/sanitize/santest.cc \
    -o "$out/santest" -lz
"$out/santest"
echo "native sanitizer gate PASSED"
